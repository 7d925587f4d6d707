"""Flash attention (1D, non-causal) as a Pallas TPU kernel.

Used by the U-Net's bottleneck self-attention (a TPU extension of the
reference, which has no attention anywhere — ``models.py:62-231``).  At the
bottleneck of the 16 kHz long-segment config the sequence is L/2^depth =
2048-8192; naive attention materialises an (L, L) score matrix per head,
while this kernel keeps only (BLK_Q, BLK_K) tiles in VMEM with the standard
online-softmax recurrence:

    m_new = max(m, rowmax(S));  alpha = exp(m - m_new)
    l     = l * alpha + rowsum(exp(S - m_new))
    acc   = acc * alpha + exp(S - m_new) @ V

Q-blocks ride the grid; K/V stream through a fori_loop inside the kernel.
The QK^T and PV products are MXU matmuls with f32 accumulation.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def flash_attention_reference(q, k, v):
    """Plain XLA attention: (B, H, L, D) -> (B, H, L, D)."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, blk_k: int, scale: float):
    from jax.experimental import pallas as pl

    BQ, D = q_ref.shape
    L = k_ref.shape[0]
    n_k = L // blk_k

    q = q_ref[:].astype(jnp.float32) * scale

    m0 = jnp.full((BQ, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc0 = jnp.zeros((BQ, D), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        kb = k_ref[pl.ds(j * blk_k, blk_k), :].astype(jnp.float32)
        vb = v_ref[pl.ds(j * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (BQ, BK)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, n_k, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,                  # (B, H, L, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    blk_q: int = 512,
    blk_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blocked flash attention.  Requires L % blk == 0 (pad upstream);
    callers should fall back to ``flash_attention_reference`` otherwise."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, L, D = q.shape
    blk_q = min(blk_q, L)
    blk_k = min(blk_k, L)
    if L % blk_q or L % blk_k:
        raise ValueError(f"L={L} must be divisible by blk_q={blk_q}, blk_k={blk_k}")
    scale = 1.0 / math.sqrt(D)

    qf = q.reshape(B * H, L, D)
    kf = k.reshape(B * H, L, D)
    vf = v.reshape(B * H, L, D)

    kernel = functools.partial(_flash_kernel, blk_k=blk_k, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B * H, L // blk_q),
        in_specs=[
            pl.BlockSpec((None, blk_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, L, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, blk_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, L, D)
