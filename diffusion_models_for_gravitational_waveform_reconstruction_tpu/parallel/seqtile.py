"""Tiled sequence-parallel U-Net evaluation for very long segments.

The reference processes full sequences through the U-Net whole — sequence
"scaling" is only its pooling pyramid (SURVEY.md §5.7).  At 16 kHz a
minutes-long segment no longer fits one chip's HBM, and a single forward
cannot use more than one chip.  This module tiles the sequence into
fixed-size chunks with HALO OVERLAP, stacks the chunks on a new leading
axis, and shards THAT axis over the device mesh — every chip runs the same
static-shape U-Net forward on its chunks, with no collectives inside the
model:

      x (B, C, L)  ->  chunks (n, B, C, halo+chunk+halo)   [axis n sharded]
                   ->  vmapped forward                     [SPMD over mesh]
                   ->  crop halos, concatenate             -> (B, 1, L)

Exactness: every op in the U-Net is local (conv k=3, pool-2, nearest
upsample, per-stage cond resize with integer factors) with a finite
receptive field, so with ``halo >= receptive_field_radius`` the interior of
each chunk is EXACT — with two documented approximations:

- GroupNorm statistics are computed per chunk instead of over the full
  sequence; for whitened, sigma-normalised strain (stationary by
  construction) the deviation is O(1/sqrt(chunk)) and empirically small
  (tests/test_seqtile.py);
- bottleneck self-attention (``use_attention`` checkpoints) becomes
  HALO-WINDOWED attention: each position attends over its tile plus both
  halos — sliding-window local attention with a window of
  (chunk + 2*halo)/2^depth bottleneck tokens.  The default halo is
  auto-widened 4x for attention models; accuracy vs the monolithic global
  forward is MEASURED (not assumed) in
  tests/test_seqtile.py::test_tiled_attention_accuracy.

``receptive_field_radius``: conservative analytic bound — each ConvBlock at
scale s contributes (k//2) * 2^s input samples on each side; cond resizes
contribute one window; doubled for safety.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def receptive_field_radius(depth: int, kernel: int = 3) -> int:
    """Conservative one-sided receptive field of UNet1D in input samples."""
    r = 0
    for s in range(depth + 1):            # encoder convs + mid
        r += (kernel // 2) * (2 ** s)
    for s in reversed(range(depth)):      # decoder convs
        r += (kernel // 2) * (2 ** s)
    r += kernel // 2 + 2 ** depth         # final head + resize windows
    return 2 * r                          # safety factor


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def tiled_apply(
    model,
    params,
    x: jnp.ndarray,          # (B, C, L)
    t: jnp.ndarray,          # (B,)
    chunk: int = 16384,
    halo: Optional[int] = None,
    mesh=None,
) -> jnp.ndarray:
    """Evaluate ``model`` over arbitrarily long L in fixed-size tiles.

    ``chunk`` and ``halo`` are rounded to multiples of 2**depth so pooling
    boundaries align.  With ``mesh`` the tile axis is sharded over the
    mesh's ``data`` axis (population of tiles across chips); without it the
    tiles run as one batched forward on the current device.
    """
    B, C, L = x.shape
    depth = int(getattr(model, "depth", 3))
    align = 2 ** depth
    chunk = _round_up(min(chunk, _round_up(L, align)), align)
    attn = bool(getattr(model, "use_attention", False))
    if halo is None:
        halo = receptive_field_radius(depth, int(getattr(model, "kernel", 3)))
        if attn:
            # HALO-WINDOWED ATTENTION (the seqtile answer for attention
            # checkpoints): per-tile evaluation turns the bottleneck's
            # global self-attention into sliding-window local attention —
            # each output position attends over its tile plus both halos,
            # i.e. a window of >= (chunk + 2*halo) / 2^depth bottleneck
            # tokens.  For whitened chirps the attention mass is
            # empirically near-diagonal, so a 4x-widened default halo
            # keeps tiled-vs-monolithic deviation small (measured in
            # tests/test_seqtile.py::test_tiled_attention_accuracy); it is
            # an approximation with a MEASURED bound, not bit parity.
            halo *= 4
    halo = _round_up(halo, align)

    n = -(-L // chunk)
    L_pad = n * chunk
    # left-pad to the tile grid (left padding preserves the merger-at-end
    # convention), plus halo margins on both sides
    x_p = jnp.pad(x, ((0, 0), (0, 0), (L_pad - L + halo, halo)))

    starts = np.arange(n) * chunk
    tiles = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(x_p, int(s), chunk + 2 * halo, axis=2)
         for s in starts], axis=0)                     # (n, B, C, W)

    n_tiles_padded = n
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape.get("data", 1)
        if n % n_data != 0:
            # pad the tile axis up to the mesh multiple with dummy tiles
            # (cropped after the vmap) — silently skipping the device_put
            # here would run EVERY tile's forward on one device, the exact
            # activation-OOM this module exists to prevent
            pad_t = (-n) % n_data
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((pad_t,) + tiles.shape[1:], tiles.dtype)],
                axis=0)
            n_tiles_padded = n + pad_t
        tiles = jax.device_put(tiles, NamedSharding(mesh, P("data")))

    def fwd(tile):
        return model.apply(params, tile, t)            # (B, 1, W)

    out_tiles = jax.vmap(fwd)(tiles)                   # (n_padded, B, 1, W)
    out_tiles = out_tiles[:n]                          # drop dummy tiles
    out_tiles = out_tiles[:, :, :, halo:halo + chunk]  # crop halos
    # (n, B, 1, chunk) -> (B, 1, n*chunk), then drop the left tile padding
    out = jnp.moveaxis(out_tiles, 0, 2).reshape(B, 1, n * chunk)
    return out[:, :, L_pad - L:]
