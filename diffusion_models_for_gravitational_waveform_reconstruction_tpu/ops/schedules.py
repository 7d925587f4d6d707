"""Diffusion noise schedules and timestep utilities.

Reference parity: cosine schedule mirrors
``/root/reference/src/snr_denoising/models.py:34-40`` (Nichol & Dhariwal,
s=0.008, betas clipped to [0, 0.999]); SNR(t) and the SNR->t inversion mirror
``inference.py:209-215``; the DDIM timestep schedule builder mirrors
``inference.py:217-228``; scheduled-CFG weights mirror ``inference.py:230-244``.

The linear schedule is an extension the reference lacks (required by
BASELINE config 1: "1000-step linear beta").

All schedule constructors return plain ``jnp.ndarray`` values so they can be
closed over by jitted functions; schedule *construction* itself is cheap,
host-side, trace-time work.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    """Immutable container for the forward-process constants.

    TPU-first counterpart of the reference's ``CustomDiffusion`` class
    (``models.py:43-59``): instead of a stateful object holding torch tensors
    on a device, this is a pytree of arrays that jitted functions close over
    or take as arguments.
    """

    betas: jnp.ndarray        # [T]
    alphas: jnp.ndarray       # [T] = 1 - betas
    alpha_bar: jnp.ndarray    # [T] = cumprod(alphas)

    @property
    def T(self) -> int:
        return int(self.betas.shape[0])


def cosine_beta_schedule(T: int, s: float = 0.008, dtype=jnp.float32) -> jnp.ndarray:
    """Nichol-Dhariwal cosine schedule (ref ``models.py:34-40``)."""
    steps = T + 1
    t = np.linspace(0.0, T, steps, dtype=np.float64)
    alphas_cum = np.cos(((t / T) + s) / (1 + s) * (math.pi / 2)) ** 2
    alphas_cum = alphas_cum / alphas_cum[0]
    betas = 1.0 - (alphas_cum[1:] / alphas_cum[:-1])
    betas = np.clip(betas, 0.0, 0.999)
    return jnp.asarray(betas, dtype=dtype)


def linear_beta_schedule(
    T: int, beta_start: float = 1e-4, beta_end: float = 0.02, dtype=jnp.float32
) -> jnp.ndarray:
    """Classic DDPM linear schedule (extension; not in the reference)."""
    betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    return jnp.asarray(betas, dtype=dtype)


def make_schedule(T: int, kind: str = "cosine", **kwargs) -> DiffusionSchedule:
    """Build a :class:`DiffusionSchedule` of the given kind ('cosine'|'linear')."""
    if kind == "cosine":
        betas = cosine_beta_schedule(T, **kwargs)
    elif kind == "linear":
        betas = linear_beta_schedule(T, **kwargs)
    else:
        raise ValueError(f"unknown schedule kind: {kind!r}")
    alphas = 1.0 - betas
    # cumprod in f64 for accuracy at large T, then cast back.
    alpha_bar = jnp.asarray(
        np.cumprod(np.asarray(alphas, dtype=np.float64)), dtype=betas.dtype
    )
    return DiffusionSchedule(betas=betas, alphas=alphas, alpha_bar=alpha_bar)


# ---------------------------------------------------------------------------
# SNR <-> timestep  (ref inference.py:209-215)
# ---------------------------------------------------------------------------

def snr_from_alpha_bar(alpha_bar) -> np.ndarray:
    """Per-timestep signal-to-noise ratio sqrt(abar/(1-abar)) (ref inference.py:209-211)."""
    ab = np.clip(np.asarray(alpha_bar, dtype=np.float64), 1e-12, 1 - 1e-12)
    return np.sqrt(ab / (1.0 - ab))


def t_for_target_snr(schedule: DiffusionSchedule, target_snr: float) -> int:
    """Index of the timestep whose SNR is closest to target (ref inference.py:213-215)."""
    snr = snr_from_alpha_bar(schedule.alpha_bar)
    return int(np.argmin(np.abs(snr - float(target_snr))))


# ---------------------------------------------------------------------------
# DDIM timestep schedule  (ref inference.py:217-228)
# ---------------------------------------------------------------------------

def build_lambda_t_schedule(
    schedule: DiffusionSchedule, steps: int,
    start_t: Optional[int] = None,
) -> np.ndarray:
    """Descending timestep ladder UNIFORM IN lambda = log(alpha/sigma).

    Extension (no reference counterpart): the reference's linspace-in-t
    ladder (``build_t_schedule``) concentrates almost no resolution where
    the half-log-SNR actually changes fastest (both ends of a cosine
    schedule), which is exactly where multistep solvers' interval-ratio
    coefficients explode.  Spacing the nodes evenly in lambda keeps every
    solver step the same "distance" in the ODE's natural variable — the
    same idea as Karras sigma spacing.  Endpoints (start_t and 0) are
    always included; duplicates from the discrete t-grid are collapsed.
    """
    T = schedule.T
    if start_t is None:
        start_t = T - 1
    start_t = int(max(0, min(int(start_t), T - 1)))
    steps = int(max(1, min(int(steps), start_t + 1)))
    ab = np.asarray(schedule.alpha_bar, np.float64).clip(1e-12, 1 - 1e-12)
    lam = 0.5 * (np.log(ab) - np.log1p(-ab))          # descending in t
    targets = np.linspace(lam[start_t], lam[0], steps)
    # invert the monotone map lambda(t) on the integer grid (reverse it so
    # np.interp sees ascending x)
    rev_lam = lam[start_t::-1]
    rev_t = np.arange(start_t, -1, -1, dtype=np.float64)
    ts = np.round(np.interp(targets, rev_lam, rev_t)).astype(np.int64)
    ts = np.unique(np.clip(ts, 0, start_t))[::-1]
    if ts[0] != start_t:
        ts = np.concatenate([[start_t], ts])
    if ts[-1] != 0:
        ts = np.concatenate([ts, [0]])
    return ts


def build_t_schedule(T: int, steps: int, start_t: Optional[int] = None) -> np.ndarray:
    """Descending, deduplicated timestep ladder from start_t to 0.

    Host-side numpy: the result's *length* determines the scan trip count so
    it must be static.  Mirrors ``inference.py:217-228`` exactly: linspace,
    round, collapse consecutive duplicates, force both endpoints.
    """
    if start_t is None:
        start_t = T - 1
    start_t = int(max(0, min(int(start_t), T - 1)))
    steps = int(max(1, min(int(steps), start_t + 1)))
    ts = np.linspace(start_t, 0, steps)
    ts = np.round(ts).astype(np.int64)
    # unique_consecutive
    keep = np.ones(len(ts), dtype=bool)
    keep[1:] = ts[1:] != ts[:-1]
    ts = ts[keep]
    if ts[0] != start_t:
        ts = np.concatenate([[start_t], ts])
    if ts[-1] != 0:
        ts = np.concatenate([ts, [0]])
    return ts


# ---------------------------------------------------------------------------
# Scheduled classifier-free-guidance weights  (ref inference.py:230-244)
# ---------------------------------------------------------------------------

def cfg_weight(i: int, N: int, mode: str, wmax: float, center: float, width: float) -> float:
    """CFG weight at schedule position i of N (host-side, trace-time)."""
    s = 1.0 if N <= 1 else i / (N - 1)
    mode = mode.lower()
    if mode == "const":
        return float(wmax)
    if mode == "tophat":
        lo, hi = center - width * 0.5, center + width * 0.5
        return float(wmax) if (lo <= s <= hi) else 1.0
    if mode == "gauss":
        sig = max(width, 1e-9)
        return float(wmax) * math.exp(-0.5 * ((s - center) / sig) ** 2)
    raise ValueError(f"unknown cfg-mode: {mode!r}")


def cfg_weight_schedule(
    N: int, mode: str, wmax: float, center: float, width: float
) -> np.ndarray:
    """Vector of CFG weights for an N-step sampler run (host-side)."""
    return np.array(
        [cfg_weight(i, N, mode, wmax, center, width) for i in range(N)],
        dtype=np.float64,
    )


def cfg_combination_coeffs(
    w_schedule: np.ndarray, u_only_thresh: float = 0.05
) -> tuple[np.ndarray, np.ndarray]:
    """Per-step (c_uncond, c_cond) linear-combination coefficients.

    The reference branches at runtime between 1 and 2 model forwards
    (``inference.py:444-460``).  Under ``lax.scan`` we instead express all
    three cases as a fixed linear combination ``out = cu*out_u + cc*out_c``:

      w <= u_only_thresh  ->  (1, 0)      (unconditional only)
      |w - 1| <= 1e-6     ->  (0, 1)      (conditional only)
      otherwise           ->  (1-w, w)    (guided)

    The coefficients are trace-time constants per step, so XLA still skips
    nothing it can't; the sampler batches cond+uncond into one forward.
    """
    w = np.asarray(w_schedule, dtype=np.float64)
    cu = np.where(w <= u_only_thresh, 1.0, np.where(np.abs(w - 1.0) <= 1e-6, 0.0, 1.0 - w))
    cc = np.where(w <= u_only_thresh, 0.0, np.where(np.abs(w - 1.0) <= 1e-6, 1.0, w))
    return cu, cc
