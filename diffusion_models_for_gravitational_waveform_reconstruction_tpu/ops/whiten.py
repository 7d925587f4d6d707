"""PSD estimation, whitening and de-whitening as batched JAX ops.

Reference parity (same math, batched and jit-able instead of per-sample
numpy in dataloader workers):

- 'train'-mode whitening (rfft -> |Y|^2 -> 9-tap boxcar smooth -> /sqrt(P)):
  ``dataloader.py:109-123``, ``inference.py:137-158``
- model-PSD whitening with rfft-grid interpolation:
  ``dataloader.py:126-140``, ``inference.py:182-205``
- Welch-PSD whitening: ``dataloader.py:142-151``, ``inference.py:160-180``
- Welch estimator conventions follow ``scipy.signal.welch`` (hann window,
  noverlap = nperseg//2, density scaling) as used at ``gen.py:253-261`` and
  ``inference.py:160-166``.
- sigma estimators (std / mad / fixed with degenerate fallback):
  ``dataloader.py:10-12, 190-200``, ``inference.py:125-135``

The reference whitens in float64 on the host (``dataloader.py:112-123``).
On TPU, f64 is emulated and slow, so these ops run in f32 by default; the
data pipeline (``data/pipeline.py``) retains an exact f64 numpy path for
ahead-of-time whitening where bit-level parity matters.

All functions operate on the LAST axis and broadcast over leading axes, so
they work per-sample and per-batch alike.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rfftfreq(n: int, d: float) -> jnp.ndarray:
    return jnp.fft.rfftfreq(n, d)


def _boxcar_smooth_same(P: jnp.ndarray, width: int = 9) -> jnp.ndarray:
    """np.convolve(P, ones(w)/w, mode='same') on the last axis (zero-padded
    edges, matching the reference's smoothing at ``dataloader.py:115-117``)."""
    F = P.shape[-1]
    if F <= width:
        return P
    lead = P.shape[:-1]
    flat = P.reshape(-1, 1, F)
    kern = jnp.ones((1, 1, width), P.dtype) / width
    # 'same' for odd width: pad (w//2, w//2)
    out = jax.lax.conv_general_dilated(
        flat, kern, window_strides=(1,), padding=[(width // 2, width // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out.reshape(*lead, F)


# ---------------------------------------------------------------------------
# train-like whitening (self-estimated PSD from the measurement itself)
# ---------------------------------------------------------------------------

def psd_floor(P: jnp.ndarray, rel: float = 1e-12) -> jnp.ndarray:
    """Floor a PSD RELATIVE to its per-sample maximum (last axis).

    An absolute epsilon (the reference's max(P, 1e-20) / P + 1e-12) swamps
    physical-unit PSDs entirely (~1e-46 strain^2/Hz) and silently turns
    whitening into a constant rescale; a relative floor is scale-free.
    """
    mx = jnp.max(P, axis=-1, keepdims=True)
    mx = jnp.where(mx > 0, mx, 1.0)
    return jnp.maximum(P, rel * mx)


def whiten_weight(P: jnp.ndarray, rel: float = 1e-12) -> jnp.ndarray:
    """1/sqrt(P) with band-limit semantics: P == 0 bins (below the schema's
    f_lower cutoff, ref ``gen.py:92``) mean INFINITE noise -> weight 0, not a
    tiny floored divisor that would amplify sub-cutoff leakage ~1e26x."""
    return jnp.where(P > 0, 1.0 / jnp.sqrt(psd_floor(P, rel)), 0.0)


def dewhiten_weight(P: jnp.ndarray, rel: float = 1e-12) -> jnp.ndarray:
    """Exact in-band inverse of ``whiten_weight``."""
    return jnp.where(P > 0, jnp.sqrt(psd_floor(P, rel)), 0.0)


def train_psd(y: jnp.ndarray) -> jnp.ndarray:
    """Smoothed periodogram |rfft(y - mean)|^2 used as the whitening PSD."""
    y0 = y - y.mean(axis=-1, keepdims=True)
    Y = jnp.fft.rfft(y0)
    P = jnp.abs(Y) ** 2
    P = _boxcar_smooth_same(P, 9)
    return psd_floor(P)


def whiten_train_like(
    y: jnp.ndarray, x: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Whiten y (and optionally x) by y's own smoothed periodogram.

    Returns (y_w, x_w, P).  Ref ``dataloader.py:110-123``.
    """
    L = y.shape[-1]
    y0 = y - y.mean(axis=-1, keepdims=True)
    Y = jnp.fft.rfft(y0)
    P = psd_floor(_boxcar_smooth_same(jnp.abs(Y) ** 2, 9))
    y_w = jnp.fft.irfft(Y / jnp.sqrt(P), n=L)
    x_w = None
    if x is not None:
        X = jnp.fft.rfft(x - x.mean(axis=-1, keepdims=True))
        x_w = jnp.fft.irfft(X / jnp.sqrt(P), n=L)
    return y_w, x_w, P


def dewhiten_train_like(sig: jnp.ndarray, P: jnp.ndarray) -> jnp.ndarray:
    """Inverse of train-like whitening (ref ``inference.py:154-158``).

    ``P`` is the already-floored PSD returned by ``whiten_train_like`` —
    multiplying by sqrt(P) with no extra epsilon is the exact inverse."""
    L = sig.shape[-1]
    return jnp.fft.irfft(jnp.fft.rfft(sig) * jnp.sqrt(P), n=L)


# ---------------------------------------------------------------------------
# model-PSD whitening
# ---------------------------------------------------------------------------

def interp_psd_to_length(P: jnp.ndarray, L_src: int, L_tgt: int, fs: float) -> jnp.ndarray:
    """Interpolate a one-sided PSD from its own rfft grid onto length-L_tgt's
    rfft grid (ref ``dataloader.py:126-131``)."""
    if L_src == (L_tgt // 2 + 1):
        return P
    f_src = np.fft.rfftfreq(L_src * 2 - 2, 1.0 / fs)
    f_tgt = np.fft.rfftfreq(L_tgt, 1.0 / fs)
    return jnp.interp(jnp.asarray(f_tgt), jnp.asarray(f_src), P,
                      left=P[0], right=P[-1])


def whiten_with_psd(
    y: jnp.ndarray, x: Optional[jnp.ndarray], P: jnp.ndarray, eps: float = 1e-12
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Whiten by a given one-sided PSD on the rfft grid of y's length.

    ``eps`` is a RELATIVE floor (vs max P) — see ``psd_floor``; the
    reference's absolute epsilons (``dataloader.py:133-140`` eps=1e-20,
    ``inference.py:190-200`` eps=1e-12) degenerate on physical-unit PSDs.
    """
    L = y.shape[-1]
    w = whiten_weight(P, eps)
    Y = jnp.fft.rfft(y)
    y_w = jnp.fft.irfft(Y * w, n=L)
    x_w = None
    if x is not None:
        X = jnp.fft.rfft(x)
        x_w = jnp.fft.irfft(X * w, n=L)
    return y_w, x_w


def dewhiten_with_psd(sig: jnp.ndarray, P: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Exact in-band inverse of ``whiten_with_psd``."""
    L = sig.shape[-1]
    return jnp.fft.irfft(jnp.fft.rfft(sig) * dewhiten_weight(P, eps), n=L)


# ---------------------------------------------------------------------------
# Welch PSD (scipy.signal.welch parity, jit-able)
# ---------------------------------------------------------------------------

def hann_window(n: int) -> jnp.ndarray:
    """Periodic=false ("symmetric") Hann, matching scipy get_window default
    ... scipy.signal.welch actually uses a *periodic* DFT-even window."""
    # scipy.signal.get_window('hann', n, fftbins=True) -> periodic window
    k = jnp.arange(n)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * k / n)


def welch_psd(
    y: jnp.ndarray,
    fs: float,
    nperseg: int = 4096,
    noverlap: Optional[int] = None,
    detrend: str = "constant",   # 'constant' (scipy default) | 'none' (gen.py uses False)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-sided Welch PSD with density scaling; returns (freqs, Pxx).

    Matches ``scipy.signal.welch(y, fs, nperseg=..., window='hann',
    noverlap=nperseg//2, scaling='density')`` including the mean-detrend per
    segment and the one-sided factor-2 on interior bins.
    """
    L = y.shape[-1]
    nperseg = int(min(nperseg, L))
    if noverlap is None:
        noverlap = nperseg // 2
    step = nperseg - noverlap
    nseg = max(1, (L - noverlap) // step)

    win = hann_window(nperseg).astype(y.dtype)
    scale = 1.0 / (fs * jnp.sum(win * win))

    starts = np.arange(nseg) * step
    lead = y.shape[:-1]
    yf = y.reshape(-1, L)

    def seg_psd(start):
        seg = jax.lax.dynamic_slice_in_dim(yf, start, nperseg, axis=-1)
        if detrend == "constant":
            seg = seg - seg.mean(axis=-1, keepdims=True)
        Z = jnp.fft.rfft(seg * win)
        return (jnp.abs(Z) ** 2) * scale

    P = jnp.stack([seg_psd(int(s)) for s in starts], axis=0).mean(axis=0)
    # one-sided doubling (not DC; not Nyquist when nperseg is even)
    nf = P.shape[-1]
    mult = np.full(nf, 2.0)
    mult[0] = 1.0
    if nperseg % 2 == 0:
        mult[-1] = 1.0
    P = P * jnp.asarray(mult, P.dtype)
    freqs = jnp.fft.rfftfreq(nperseg, 1.0 / fs)
    return freqs, P.reshape(*lead, nf)


def whiten_with_welch(
    y: jnp.ndarray, x: Optional[jnp.ndarray], f_w: jnp.ndarray, P_w: jnp.ndarray,
    fs: float, eps: float = 1e-12,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Interpolate a saved Welch PSD onto y's rfft grid and whiten.

    Ref ``dataloader.py:142-151`` / ``inference.py:664-676``.
    Returns (y_w, x_w, P_interp).
    """
    L = y.shape[-1]
    f_tgt = jnp.fft.rfftfreq(L, 1.0 / fs)
    P = jnp.interp(f_tgt, f_w, P_w, left=P_w[0], right=P_w[-1])
    y_w, x_w = whiten_with_psd(y, x, P, eps)
    return y_w, x_w, P


# ---------------------------------------------------------------------------
# sigma estimators (ref dataloader.py:10-12, 190-200; inference.py:125-135)
# ---------------------------------------------------------------------------

def mad_std(x: jnp.ndarray) -> jnp.ndarray:
    """1.4826 * median(|x - median(x)|) + 1e-24, over the last axis."""
    med = jnp.median(x, axis=-1, keepdims=True)
    return 1.4826 * jnp.median(jnp.abs(x - med), axis=-1) + 1e-24


def pick_sigma(
    y: jnp.ndarray, mode: str = "std", fixed: float = 1.0
) -> jnp.ndarray:
    """Per-sample sigma in the conditioning domain; degenerate -> 1.0."""
    if mode == "std":
        s = jnp.std(y, axis=-1)
    elif mode == "mad":
        s = mad_std(y)
    elif mode == "fixed":
        s = jnp.full(y.shape[:-1], fixed, y.dtype)
    else:
        raise ValueError(f"unknown sigma mode: {mode!r}")
    return jnp.where(jnp.isfinite(s) & (s > 0), s, 1.0)
