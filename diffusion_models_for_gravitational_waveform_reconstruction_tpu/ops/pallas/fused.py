"""Fused ConvBlock (conv1d k=3 + GroupNorm + SiLU) as a Pallas TPU kernel.

Channels-last (B, L, C) to match the model; the XLA-equivalent reference
implementation is used for testing (interpret mode on CPU) and as the
automatic fallback when shapes don't fit VMEM or the platform isn't TPU.

A standalone fused GroupNorm+SiLU+FiLM scaffold lived here through round 1;
it was removed in round 2: it was wired into nothing, and fetch-forced bf16
measurements (RESULTS.md, "Timing methodology correction") show the model
is HBM-bound at ~10% MXU utilisation with XLA already fusing the
normalise/activate chain — a standalone epilogue kernel cannot win there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Fully fused ConvBlock: conv1d(k=3, SAME) + GroupNorm + SiLU
# ---------------------------------------------------------------------------

def fused_conv_gn_silu_reference(x, W, b, gn_scale, gn_bias, groups: int,
                                 eps: float = 1e-5):
    """XLA reference: x (B, L, Cin); W (3, Cin, Cout); b (Cout,)."""
    y = jax.lax.conv_general_dilated(
        x, W, window_strides=(1,), padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32) + b[None, None, :]
    y = y.astype(jnp.float32)
    B, L, C = y.shape
    yg = y.reshape(B, L, groups, C // groups)
    mean = yg.mean(axis=(1, 3), keepdims=True)
    var = ((yg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    h = ((yg - mean) / jnp.sqrt(var + eps)).reshape(B, L, C)
    h = h * gn_scale[None, None, :] + gn_bias[None, None, :]
    return (h * jax.nn.sigmoid(h)).astype(x.dtype)


def _conv_gn_silu_kernel(x_ref, w_ref, b_ref, gs_ref, gb_ref, m_ref, o_ref,
                         *, groups: int, eps: float):
    L, Cin = x_ref.shape
    Cout = o_ref.shape[-1]
    cg = Cout // groups
    n = float(L * cg)

    # keep the MXU inputs in the model's compute dtype (bf16 models must not
    # pay an f32 conv — that's how XLA's own conv runs); accumulate f32
    x = x_ref[:]                                          # (L, Cin)
    zero_row = jnp.zeros((1, Cin), x.dtype)
    x_prev = jnp.concatenate([zero_row, x[:-1]], axis=0)  # left tap
    x_next = jnp.concatenate([x[1:], zero_row], axis=0)   # right tap
    xcat = jnp.concatenate([x_prev, x, x_next], axis=1)   # (L, 3*Cin) im2col

    # ONE MXU matmul does the whole k=3 conv for this sample
    y = jax.lax.dot_general(xcat, w_ref[:].astype(x.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b_ref[:].astype(jnp.float32)                  # (L, Cout) f32

    # GroupNorm stats via group-one-hot matmuls (lane-friendly)
    M = m_ref[:]                                          # (Cout, G)
    ch_sum = jnp.sum(y, axis=0, keepdims=True)
    ch_sq = jnp.sum(y * y, axis=0, keepdims=True)
    g_sum = jax.lax.dot_general(ch_sum, M, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    g_sq = jax.lax.dot_general(ch_sq, M, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    mean_g = g_sum / n
    var_g = g_sq / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(jnp.maximum(var_g + eps, 1e-30))
    mean_c = jax.lax.dot_general(mean_g, M, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    inv_c = jax.lax.dot_general(inv_g, M, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

    h = (y - mean_c) * inv_c
    h = h * gs_ref[:].astype(jnp.float32) + gb_ref[:].astype(jnp.float32)
    h = h * jax.nn.sigmoid(h)
    o_ref[:] = h.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def fused_conv_gn_silu(
    x: jnp.ndarray,          # (B, L, Cin)
    W: jnp.ndarray,          # (3, Cin, Cout) — flax Conv kernel layout
    b: jnp.ndarray,          # (Cout,)
    gn_scale: jnp.ndarray,   # (Cout,)
    gn_bias: jnp.ndarray,    # (Cout,)
    groups: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """The whole ConvBlock (conv k=3 SAME + GN + SiLU) in one VMEM pass per
    sample: im2col single-matmul conv on the MXU, group statistics and the
    activation fused in-register — the conv output never round-trips HBM
    between the conv, the GN reduction and the apply passes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, Cin = x.shape
    k, _, Cout = W.shape
    if k != 3:
        raise ValueError("fused_conv_gn_silu supports kernel size 3")
    if Cout % groups:
        raise ValueError(f"Cout={Cout} not divisible by groups={groups}")
    W2 = W.reshape(3 * Cin, Cout)
    onehot = np.zeros((Cout, groups), np.float32)
    for c in range(Cout):
        onehot[c, c // (Cout // groups)] = 1.0

    kernel = functools.partial(_conv_gn_silu_kernel, groups=groups, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, L, Cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * Cin, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, L, Cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, Cout), x.dtype),
        interpret=interpret,
    )(x, W2, b.reshape(1, Cout), gn_scale.reshape(1, Cout),
      gn_bias.reshape(1, Cout), jnp.asarray(onehot))


def conv_fused_vmem_ok(L: int, Cin: int, Cout: int,
                       budget_bytes: int = 10 * 1024 * 1024) -> bool:
    """x + im2col + y in f32 must fit VMEM."""
    need = (L * Cin + L * 3 * Cin + 2 * L * Cout + 3 * Cin * Cout) * 4
    return need <= budget_bytes
