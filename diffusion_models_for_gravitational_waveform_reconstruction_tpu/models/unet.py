"""1D U-Net denoiser with FiLM time conditioning and per-stage measurement
conditioning — the TPU-native counterpart of the reference's ``UNet1D``
(``/root/reference/src/snr_denoising/models.py:62-231``).

Behavioral parity (same math, not a translation):

- input channel convention ``[x_t | cond_0..K-1 | (optional) selfcond]``
  with the legacy ``in_ch=3`` inference rule (ref ``models.py:68-98``)
- conv block = Conv1d(k, same) -> GroupNorm(gcd(8, C)) -> SiLU
  (ref ``models.py:154-167``)
- FiLM ``h*(1+gamma)+beta`` from ``SiLU o Dense(base_ch -> 2C)`` at every
  stage (ref ``models.py:136-142, 169-173``)
- conditioning bias: cond channels linearly resized to the stage length then
  a 1x1 conv, added to h (ref ``models.py:144-152, 188-193``)
- downsample avg-pool 2, upsample nearest x2 with static pad/crop length
  fixups, skip concat (ref ``models.py:208, 216-221``)
- final head sees only ``[decoder_out | x_t]`` and is zero-initialised
  (ref ``models.py:131-134, 226-230``)

TPU-first design choices (deliberately NOT the torch layout):

- arrays flow as (B, L, C): channels-last is the native TPU/XLA conv layout,
  so every conv lands on the MXU without transposes. The public ``__call__``
  accepts the reference's (B, C, L) and transposes once at entry/exit.
- length fixups use *static* Python shape logic — shapes are trace-time
  constants under jit, so this compiles to fixed pads/slices (no dynamic
  shapes).
- optional self-attention at the bottleneck (BASELINE config 3 extension;
  the reference has no attention anywhere).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


class TimeEmbedding(nn.Module):
    """Sinusoidal timestep embedding (ref ``models.py:9-31``).

    t is normalised by ``max_time``; frequencies are log-spaced base 10000;
    output is [sin || cos], zero-padded if ``dim`` is odd.
    """

    dim: int
    max_time: float = 999.0

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        t_scaled = t.astype(jnp.float32) / max(self.max_time, 1.0)
        half = self.dim // 2
        freqs = jnp.exp(
            jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / max(half - 1, 1))
        )
        x = t_scaled[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=1)
        if self.dim % 2 == 1:
            emb = jnp.concatenate([emb, jnp.zeros((t.shape[0], 1), jnp.float32)], axis=1)
        return emb


def _num_groups(out_ch: int) -> int:
    return max(1, math.gcd(8, out_ch))


class _GNParams(nn.Module):
    """Bare GroupNorm scale/bias params with nn.GroupNorm's exact pytree
    layout (``<name>/scale``, ``<name>/bias``) so the Pallas-fused and plain
    paths share checkpoints."""

    ch: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.ch,))
        b = self.param("bias", nn.initializers.zeros, (self.ch,))
        return s, b


class _ConvParams(nn.Module):
    """Bare Conv1d kernel/bias params with nn.Conv's exact pytree layout
    (``<name>/kernel`` (k, Cin, Cout), ``<name>/bias``) and init."""

    cin: int
    cout: int
    k: int

    @nn.compact
    def __call__(self):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.k, self.cin, self.cout))
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        return w, b


class ConvBlock(nn.Module):
    """Conv1d(k, same) -> GroupNorm(gcd(8, C)) -> SiLU on (B, L, C).

    With ``use_pallas`` the ENTIRE block (conv + GN + SiLU) runs as one
    Pallas kernel per sample: im2col single-MXU-matmul conv with group
    statistics and the activation in-register (``fused_conv_gn_silu``).
    Measured on v5e (tools/bench_kernels.py): 1.07-1.42x over XLA on f32
    stage shapes (best on wide concat inputs), but the bf16 end-to-end
    model is still faster on plain XLA (whose bf16 conv + fusion pipeline
    wins) — hence default OFF; enable for f32 workloads.
    """

    out_ch: int
    kernel: int = 3
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        groups = _num_groups(self.out_ch)
        if self.use_pallas and self.kernel == 3:
            from ..ops.pallas.fused import (
                conv_fused_vmem_ok,
                fused_conv_gn_silu,
            )

            B, L, Cin = x.shape
            if conv_fused_vmem_ok(L, Cin, self.out_ch):
                w, cb = _ConvParams(Cin, self.out_ch, self.kernel,
                                    name="conv")()
                s, b = _GNParams(self.out_ch, name="norm")()
                return fused_conv_gn_silu(x, w, cb, s, b, groups)
        h = nn.Conv(self.out_ch, (self.kernel,), padding="SAME", dtype=self.dtype,
                    name="conv")(x)
        h = nn.GroupNorm(num_groups=groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm")(h)
        return nn.silu(h)


class DecoderConvBlock(nn.Module):
    """Decoder stage ``conv3(concat(nearest_up2(h), skip)) -> GN -> SiLU``
    WITHOUT materialising the upsample or the concat (ref semantics
    ``models.py:216-221`` + ``models.py:154-167``).

    Algebraic decomposition (exactly the same math, fewer bytes + FLOPs):

    - ``conv(concat(a, b); W) == conv(a; W[:, :Ca]) + conv(b; W[:, Ca:])``
      — the (L, C_h + C_s) concat buffer never hits HBM;
    - nearest x2 upsample folds INTO the conv: with u = repeat(h, 2),
      ``out[2j]   = W0 u[2j-1] + W1 u[2j] + W2 u[2j+1] = W0 h[j-1] + (W1+W2) h[j]``
      ``out[2j+1] = W0 u[2j]  + W1 u[2j+1] + W2 u[2j+2] = (W0+W1) h[j] + W2 h[j+1]``
      so the h-branch is two k=2 convs at HALF length (2/3 of the FLOPs of
      convolving the upsampled signal) interleaved — and the upsampled
      (L, C_h) buffer never exists.

    Parameter tree is IDENTICAL to ``ConvBlock`` (``conv/kernel`` of shape
    (3, C_h + C_s, out), ``conv/bias``, ``norm/scale|bias``), so checkpoints
    are interchangeable between the two paths.
    """

    out_ch: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, h_low: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        C_h, C_s = h_low.shape[-1], skip.shape[-1]
        W, cb = _ConvParams(C_h + C_s, self.out_ch, 3, name="conv")()
        dt = self.dtype or W.dtype
        W = W.astype(dt)
        hb = h_low.astype(dt)
        sk = skip.astype(dt)
        dn = ("NHC", "HIO", "NHC")

        y_s = jax.lax.conv_general_dilated(
            sk, W[:, C_h:], (1,), "SAME", dimension_numbers=dn)
        W_h = W[:, :C_h]
        W_even = jnp.stack([W_h[0], W_h[1] + W_h[2]])          # (2, C_h, out)
        W_odd = jnp.stack([W_h[0] + W_h[1], W_h[2]])
        y_e = jax.lax.conv_general_dilated(
            hb, W_even, (1,), [(1, 0)], dimension_numbers=dn)
        y_o = jax.lax.conv_general_dilated(
            hb, W_odd, (1,), [(0, 1)], dimension_numbers=dn)
        B, Lh, Co = y_e.shape
        y_h = jnp.stack([y_e, y_o], axis=2).reshape(B, 2 * Lh, Co)

        h = y_h + y_s + cb.astype(dt)
        h = nn.GroupNorm(num_groups=_num_groups(self.out_ch), epsilon=1e-5,
                         dtype=self.dtype, name="norm")(h)
        return nn.silu(h)


class BottleneckAttention(nn.Module):
    """Pre-norm multi-head self-attention over the sequence axis (extension).

    Zero-initialised output projection so an attention-enabled model starts
    as the identity perturbation of the attention-free one.
    """

    num_heads: int = 4
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:  # (B, L, C)
        C = h.shape[-1]
        heads = max(1, min(self.num_heads, C // 32 if C >= 32 else 1))
        while C % heads != 0:      # heads must divide C for the head split
            heads -= 1
        x = nn.GroupNorm(num_groups=_num_groups(C), epsilon=1e-5, dtype=self.dtype,
                         name="norm")(h)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(a):
            B, L, _ = a.shape
            return a.reshape(B, L, heads, C // heads).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        L = q.shape[2]
        d_head = C // heads
        blk = 512 if L % 512 == 0 else (256 if L % 256 == 0 else 0)
        # measured on v5e (tools/bench_kernels.py): the Pallas flash kernel
        # beats XLA 1.35-2.4x at L >= 4096 (16 kHz long-segment bottlenecks;
        # fetch-forced timing, RESULTS.md) but
        # loses below — XLA's materialised attention is fine for small L.
        if self.use_pallas and blk and d_head % 8 == 0 and L >= 4096:
            from ..ops.pallas.attention import flash_attention

            out = flash_attention(q, k, v, blk_q=blk, blk_k=blk)
        else:
            # same code path as the Pallas kernel's parity oracle, so the
            # test oracle always tests what the model actually runs
            from ..ops.pallas.attention import flash_attention_reference

            out = flash_attention_reference(q, k, v)
        B = out.shape[0]
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        out = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                       name="proj")(out)
        return h + out


def _resize_linear(x: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """Linear resize along axis 1 of (B, L, C), half-pixel centers.

    Exact parity with torch ``F.interpolate(mode='linear',
    align_corners=False, antialias=False)`` used by the reference for
    per-stage conditioning (``models.py:192``).  NOTE: ``jax.image.resize``
    is NOT equivalent — it low-pass filters when downsampling (antialias),
    which torch does not; this is a plain two-tap gather-lerp.
    """
    L = x.shape[1]
    if L == new_len:
        return x
    if L % new_len == 0 and (L // new_len) % 2 == 0:
        # EVEN integer downsample factor f: the half-pixel source coordinate
        # is (i+0.5)f - 0.5 = f*i + (f/2 - 0.5), i.e. exactly halfway between
        # elements f*i + f//2 - 1 and f*i + f//2 within each window — a
        # reshape + two static middle-axis slices (XLA/TPU-friendly; avoids
        # both gathers and strided slices on the sublane axis).  Odd factors
        # land ON an element, not between two, so they take the general path.
        f = L // new_len
        off = f // 2 - 1
        B, _, C = x.shape
        xr = x.reshape(B, new_len, f, C)
        return 0.5 * (xr[:, :, off, :] + xr[:, :, off + 1, :])
    # general case: two-tap gather-lerp at half-pixel centers
    src = (jnp.arange(new_len, dtype=jnp.float32) + 0.5) * (L / new_len) - 0.5
    src = jnp.clip(src, 0.0, L - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, L - 1)
    w = (src - lo.astype(jnp.float32))[None, :, None].astype(x.dtype)
    return x[:, lo, :] * (1.0 - w) + x[:, hi, :] * w


def _fix_len(h: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Static right pad/crop along axis 1 (ref ``models.py:218-220, 227-229``)."""
    L = h.shape[1]
    if L == target_len:
        return h
    if L < target_len:
        return jnp.pad(h, ((0, 0), (0, target_len - L), (0, 0)))
    return h[:, :target_len, :]


class UNet1D(nn.Module):
    """The flagship denoiser.  See module docstring for parity notes.

    Parameters mirror the reference constructor (``models.py:78-98``):
    ``in_ch`` is the total input channel count; ``cond_in_ch``/``use_selfcond``
    are inferred from ``in_ch`` with the legacy rule when left None.
    """

    in_ch: int = 1
    base_ch: int = 64
    time_dim: int = 128
    depth: int = 3
    kernel: int = 3
    t_embed_max_time: float = 999.0
    cond_in_ch: Optional[int] = None
    use_selfcond: Optional[bool] = None
    use_attention: bool = False          # extension: bottleneck self-attention
    attn_heads: int = 4
    dtype: Optional[jnp.dtype] = None    # compute dtype (bf16 on TPU); params f32
    use_pallas: bool = False             # Pallas-fused GN+SiLU / flash attention
    fast_decoder: bool = True            # algebraic upsample+concat+conv
                                         # decomposition (DecoderConvBlock);
                                         # identical math, fewer HBM bytes

    def _layout(self):
        use_sc = self.use_selfcond
        if use_sc is None:
            use_sc = self.in_ch >= 3  # legacy: 3 channels meant [x_t, y, x0_sc]
        cond_ch = self.cond_in_ch
        if cond_ch is None:
            cond_ch = max(self.in_ch - 1 - (1 if use_sc else 0), 0)
        return bool(use_sc), int(cond_ch)

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 channels_last: bool = False) -> jnp.ndarray:
        """x: (B, C, L) by default (reference convention) or (B, L, C) when
        ``channels_last=True``; t: (B,) integer timesteps.  Returns the
        eps/x0 prediction with the same layout as the input, single channel.
        """
        use_sc, cond_ch = self._layout()
        if not channels_last:
            x = jnp.transpose(x, (0, 2, 1))  # -> (B, L, C)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        B, L0, C = x.shape

        chs = [self.base_ch * (2 ** i) for i in range(self.depth)]

        # time context: sinusoidal -> Dense(base_ch) -> SiLU (ref models.py:105-109)
        t_emb = TimeEmbedding(self.time_dim, max_time=self.t_embed_max_time)(t)
        if self.dtype is not None:
            t_emb = t_emb.astype(self.dtype)
        t_ctx = nn.silu(nn.Dense(self.base_ch, dtype=self.dtype, name="time_dense")(t_emb))

        # split input channels (ref models.py:175-186)
        x_t = x[:, :, :1]
        cond = x[:, :, 1:1 + cond_ch] if cond_ch > 0 else None

        def film(h, name):
            # (B, 2C) -> gamma, beta; h*(1+gamma)+beta  (ref models.py:169-173)
            tv = nn.Dense(2 * h.shape[-1], dtype=self.dtype, name=name)(nn.silu(t_ctx))
            gamma, beta = jnp.split(tv, 2, axis=-1)
            return h * (1.0 + gamma[:, None, :]) + beta[:, None, :]

        def cond_bias(h, name):
            # resize cond to stage length, 1x1 conv to stage channels
            # (ref models.py:144-152, 188-193)
            if cond is None:
                return h
            cL = _resize_linear(cond, h.shape[1])
            return h + nn.Dense(h.shape[-1], dtype=self.dtype, name=name)(cL)

        # ---------------- encoder ----------------
        skips = []
        h = x
        for i, out_c in enumerate(chs):
            h = ConvBlock(out_c, self.kernel, dtype=self.dtype,
                          use_pallas=self.use_pallas, name=f"enc{i}")(h)
            h = cond_bias(h, f"cond_enc{i}")
            h = film(h, f"tproj_enc{i}")
            skips.append(h)
            h = nn.avg_pool(h, (2,), strides=(2,))

        # ---------------- bottleneck ----------------
        h = ConvBlock(chs[-1], self.kernel, dtype=self.dtype,
                      use_pallas=self.use_pallas, name="mid")(h)
        h = cond_bias(h, "cond_mid")
        h = film(h, "tproj_mid")
        if self.use_attention:
            h = BottleneckAttention(num_heads=self.attn_heads, dtype=self.dtype,
                                    use_pallas=self.use_pallas,
                                    name="mid_attn")(h)

        # ---------------- decoder ----------------
        for i, skip_ch in enumerate(reversed(chs)):
            skip = skips[-(i + 1)]
            if (self.fast_decoder and not self.use_pallas and self.kernel == 3
                    and h.shape[1] * 2 == skip.shape[1]):
                # fused-by-algebra path: upsample + concat folded into the
                # conv (DecoderConvBlock); same params, same math
                h = DecoderConvBlock(skip_ch, dtype=self.dtype,
                                     name=f"dec{i}")(h, skip)
            else:
                h = jnp.repeat(h, 2, axis=1)       # nearest x2 (ref models.py:127)
                h = _fix_len(h, skip.shape[1])
                h = jnp.concatenate([h, skip], axis=-1)
                h = ConvBlock(skip_ch, self.kernel, dtype=self.dtype,
                              use_pallas=self.use_pallas, name=f"dec{i}")(h)
            h = cond_bias(h, f"cond_dec{i}")
            h = film(h, f"tproj_dec{i}")

        # final head: only x_t is skipped in; zero-init (ref models.py:131-134)
        h = _fix_len(h, L0)
        out = nn.Conv(1, (self.kernel,), padding="SAME", dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="final")(jnp.concatenate([h, x_t], axis=-1))
        out = out.astype(jnp.float32)
        if not channels_last:
            out = jnp.transpose(out, (0, 2, 1))  # -> (B, 1, L)
        return out


def build_net_input(x_t: jnp.ndarray, cond_stack: Optional[jnp.ndarray],
                    selfcond: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Assemble the concatenated (B, C, L) network input in the reference's
    channel order ``[x_t | cond | selfcond]`` (ref ``train.py:407``)."""
    parts = [x_t]
    if cond_stack is not None:
        parts.append(cond_stack)
    if selfcond is not None:
        parts.append(selfcond)
    return jnp.concatenate(parts, axis=1)
