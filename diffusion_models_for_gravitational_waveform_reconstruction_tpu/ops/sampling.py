"""Reverse-process samplers as jit-compiled ``lax.scan`` loops.

Reference parity: the DDIM sampler mirrors
``/root/reference/src/snr_denoising/inference.py:374-514`` — schedule builder,
start-SNR selection, init modes (noise / scaled-noise / y-blend / oracle),
scheduled CFG with the unconditional-only and skip-uncond shortcuts, y-only
CFG dropout, eps/x0 prediction types, data-consistency blending,
self-conditioning channel updates, and the eta-noise DDIM update.  The
one-step proxy mirrors ``inference.py:317-371``.

TPU-first design (deliberately different from the reference's Python loop):

- the whole reverse trajectory is ONE ``lax.scan`` — one compilation, no
  host round-trips per step; batch-of-samples and batch-of-knob evaluation
  is a ``vmap`` away (the reference loops in Python: ``sweep_infer.py:205-243``).
- the reference's runtime branch between 1 and 2 model forwards per step
  (``inference.py:444-460``) becomes a *trace-time* linear combination
  ``out = cu*out_u + cc*out_c`` (see ``schedules.cfg_combination_coeffs``);
  when guidance is entirely off we compile a single-forward scan instead.
- cond+uncond run as one model call on a doubled batch, keeping the MXU fed.
- the ``t==0`` special case (``inference.py:479``) vanishes: the final step
  uses ``alpha_bar_prev = 1`` which reduces the DDIM update to ``x0_hat``.

An ancestral DDPM sampler (``ddpm_sample``) is provided as an extension —
the reference only has DDIM (eta>0 makes it ancestral-like but there is no
separate DDPM loop).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import (
    DiffusionSchedule,
    build_lambda_t_schedule,
    build_t_schedule,
    cfg_combination_coeffs,
    cfg_weight_schedule,
)

# model_fn(params, net_in (B,C,L), t (B,)) -> (B,1,L)
ModelFn = Callable[[dict, jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampler knobs (hashable -> usable as jit static arg).

    Field names track the reference CLI (``inference.py:529-577``).
    """

    steps: int = 200
    eta: float = 0.0
    start_t: Optional[int] = None
    init_mode: str = "noise"            # noise | scaled-noise | y-blend
    x0_std_est: float = 0.14
    dc_weight: float = 0.0
    cond_scale: float = 1.0
    eps_scale: float = 1.0
    pred_type: str = "eps"              # eps | x0
    use_selfcond: bool = True
    cfg_scale: float = 1.5
    cfg_mode: str = "const"             # const | tophat | gauss
    cfg_center: float = 0.70
    cfg_width: float = 0.12
    cfg_u_only_thresh: float = 0.05
    drop_y_only: bool = True
    oracle_init: bool = False
    # Stabilisation the reference LACKS (its sampler can diverge even with a
    # well-trained model): the trainer clamps every network input to
    # +-clamp_inputs (ref train.py:350-352, 381-382), so the network never
    # learned the out-of-range regime — the sampler must clamp x_t and the
    # self-conditioning channel to the same bound, or early-step x0
    # overshoot feeds back through selfcond/DDIM and explodes (verified on a
    # converged model: 20-step DDIM final std 5999 unclamped vs ~0.3
    # clamped).  x0_clip additionally bounds the x0 estimate itself (static
    # thresholding, standard diffusion practice); 0 disables.
    clamp_inputs: float = 10.0
    x0_clip: float = 10.0
    # diagnostics: max |lag| (samples) for the per-step lag-corrected xcorr
    # vs y (ref inference.py:491-512 uses 0.25 s; 1024 samples at 4096 Hz).
    # 0 -> min(L-1, 1024).  Only used when collect_diagnostics=True.
    diag_max_shift: int = 0
    # timestep ladder spacing: "t" (reference-parity linspace in t) or
    # "lambda" (uniform in log-SNR; see schedules.build_lambda_t_schedule —
    # keeps multistep interval ratios bounded, essential for dpmpp at low
    # step counts on a cosine schedule)
    ladder: str = "t"
    # self-conditioning channel policy when use_selfcond=True:
    # "update" (reference behavior: feed the previous step's x0 estimate,
    # ref inference.py:466-476) or "zero" (keep the channel but always feed
    # zeros — the distillation-time convention, see training/distill.py;
    # distilled students never saw a non-zero channel).
    selfcond_mode: str = "update"
    # iterative refinement (extension; no reference counterpart): after the
    # base reverse pass, re-noise the reconstruction to t=refine_t with the
    # forward process (q_sample — reuses the oracle_init machinery with the
    # previous x0 as the "oracle") and re-run the sampler over the short
    # ladder [refine_t..0], refine_passes times.  SDEdit-style resampling:
    # the conditioned content survives the partial re-noising while sampler
    # artefacts are re-drawn.  refine_steps=0 -> steps//2.
    refine_passes: int = 0
    refine_t: int = 300
    refine_steps: int = 0


def lagged_xcorr(a: jnp.ndarray, b: jnp.ndarray, max_shift: int):
    """Normalised lag-corrected cross-correlation, batched, on device.

    ``a``, ``b``: (B, L) mean-removed rows.  Returns (xcorr (B,), lag (B,))
    where xcorr = max_{|k|<=max_shift} sum_i a[i] b[i+k] / (||a|| ||b||).
    One FFT cross-correlation replaces the reference's O(L*max_shift) host
    loop per logged step (``inference.py:247-262``, ``491-512``).
    """
    L = a.shape[1]
    nfft = 1 << int(2 * L - 1).bit_length()
    cc = jnp.fft.irfft(jnp.fft.rfft(a, nfft) * jnp.conj(jnp.fft.rfft(b, nfft)),
                       nfft)
    lags = jnp.arange(-max_shift, max_shift + 1)
    vals = cc[:, (-lags) % nfft]                  # v(k) = sum a[i] b[i+k]
    denom = jnp.sqrt((a * a).sum(axis=1) * (b * b).sum(axis=1)) + 1e-30
    return vals.max(axis=1) / denom, lags[jnp.argmax(vals, axis=1)]


def _make_uncond(cond_used: jnp.ndarray, drop_y_only: bool) -> jnp.ndarray:
    """Unconditional stack: zero y only (keep metadata) or zero everything.

    Ref ``inference.py:446, 457``.
    """
    if drop_y_only and cond_used.shape[1] > 1:
        return jnp.concatenate(
            [jnp.zeros_like(cond_used[:, :1]), cond_used[:, 1:]], axis=1
        )
    return jnp.zeros_like(cond_used)


def _prepare_cond(cond_stack: jnp.ndarray, cfg: "SamplerConfig"):
    """Shared conditioning preamble for every sampler entry point:
    (y_chan, cond_used, cond_u) with ``cond_scale`` applied to the y channel
    only (metadata channels pass through) and the CFG-unconditional stack
    built per ``drop_y_only``.  Single-sourced so the conditioning
    convention cannot drift between samplers."""
    y_chan = cond_stack[:, :1, :]
    y_used = cfg.cond_scale * y_chan
    cond_used = (
        jnp.concatenate([y_used, cond_stack[:, 1:, :]], axis=1)
        if cond_stack.shape[1] > 1 else y_used
    )
    return y_chan, cond_used, _make_uncond(cond_used, cfg.drop_y_only)


def _t_ladder(schedule: DiffusionSchedule, cfg: "SamplerConfig") -> np.ndarray:
    if cfg.ladder == "lambda":
        return build_lambda_t_schedule(schedule, cfg.steps, cfg.start_t)
    return build_t_schedule(schedule.T, cfg.steps, cfg.start_t)


def _net_in(x_t, cond, sc, use_selfcond):
    parts = [x_t, cond] + ([sc] if use_selfcond else [])
    return jnp.concatenate(parts, axis=1)


def _forward_out(model_fn, params, x_t, t_b, cond_used, cond_u, x0_sc, cfg,
                 need_uncond, cu, cc):
    """One (possibly CFG-combined) model forward; cond+uncond run as ONE
    doubled-batch call to keep the MXU fed (shared by all samplers)."""
    B = x_t.shape[0]
    if need_uncond:
        net_c = _net_in(x_t, cond_used, x0_sc, cfg.use_selfcond)
        net_u = _net_in(x_t, cond_u, x0_sc, cfg.use_selfcond)
        out2 = model_fn(params, jnp.concatenate([net_c, net_u], axis=0),
                        jnp.concatenate([t_b, t_b], axis=0))
        return cu * out2[B:] + cc * out2[:B]
    return model_fn(params, _net_in(x_t, cond_used, x0_sc, cfg.use_selfcond),
                    t_b)


def _x0_eps_from_out(out, x_t, ab_t, cfg):
    """(x0_hat, eps_hat) from the network output under cfg.pred_type."""
    if cfg.pred_type == "eps":
        eps_hat = cfg.eps_scale * out
        x0_hat = (x_t - jnp.sqrt(1.0 - ab_t) * eps_hat) / jnp.sqrt(ab_t)
    elif cfg.pred_type == "v":
        # v-parametrisation (extension): x0 = sa x_t - sb v; eps = sb x_t + sa v
        sa = jnp.sqrt(ab_t)
        sb = jnp.sqrt(jnp.clip(1.0 - ab_t, 0.0))
        x0_hat = sa * x_t - sb * out
        eps_hat = sb * x_t + sa * out
    else:
        x0_hat = out
        eps_hat = (x_t - jnp.sqrt(ab_t) * x0_hat) / jnp.sqrt(
            jnp.clip(1.0 - ab_t, 1e-12))
    return x0_hat, eps_hat


def _init_x(cfg: SamplerConfig, key, batch, length, ab_start, y_chan, x0_std_est,
            schedule, clean_norm, start_t, dtype):
    """Initial x_T (ref ``inference.py:403-417``)."""
    if cfg.oracle_init:
        if clean_norm is None:
            raise ValueError("oracle_init requires clean_norm")
        eps = jax.random.normal(key, clean_norm.shape, dtype)
        return jnp.sqrt(ab_start) * clean_norm + jnp.sqrt(1.0 - ab_start) * eps
    if cfg.init_mode == "noise":
        return jax.random.normal(key, (batch, 1, length), dtype)
    if cfg.init_mode == "scaled-noise":
        std_init = jnp.sqrt(ab_start * (x0_std_est ** 2) + (1.0 - ab_start))
        return std_init * jax.random.normal(key, (batch, 1, length), dtype)
    if cfg.init_mode == "y-blend":
        z = jax.random.normal(key, (batch, 1, length), dtype)
        return jnp.sqrt(ab_start) * y_chan + jnp.sqrt(1.0 - ab_start) * z
    raise ValueError(f"unknown init_mode: {cfg.init_mode!r}")


def refine_only(sample_fn, model_fn, params, schedule, cond_stack, key,
                cfg: SamplerConfig, x0_norm, x0_std_est=None):
    """Run ``cfg.refine_passes`` re-noise→re-denoise passes on ``x0_norm``.

    Each pass forward-diffuses the current reconstruction to
    ``t = refine_t`` (exactly ``q_sample`` — implemented by the samplers'
    ``oracle_init`` path with the reconstruction as the "oracle") and runs
    the reverse process over the short ladder [refine_t..0].  Every other
    knob (CFG, clamps, selfcond policy, ladder spacing, pred_type) is
    inherited from ``cfg``; per-pass noise keys are split from ``key``.
    """
    n = int(cfg.refine_passes)
    if n <= 0:
        return x0_norm
    r_t = int(np.clip(int(cfg.refine_t), 1, schedule.T - 1))
    r_steps = int(cfg.refine_steps) if int(cfg.refine_steps) > 0 else max(
        1, int(cfg.steps) // 2)
    cfg_r = dataclasses.replace(cfg, oracle_init=True, start_t=r_t,
                                steps=r_steps, refine_passes=0)
    for _ in range(n):
        key, k = jax.random.split(key)
        x0_norm = sample_fn(model_fn, params, schedule, cond_stack, k, cfg_r,
                            clean_norm=x0_norm, x0_std_est=x0_std_est)
    return x0_norm


def sample_with_refinement(sample_fn, model_fn, params, schedule, cond_stack,
                           key, cfg: SamplerConfig, clean_norm=None,
                           x0_std_est=None):
    """Base reverse pass + ``cfg.refine_passes`` refinement passes.

    SDEdit-style iterative refinement (extension; the reference's sampler
    is single-pass, ``inference.py:374-514``): with ``refine_passes=0``
    this is exactly ``sample_fn``.  A perfectly-trained x0 model is a fixed
    point of the refinement operator (tests/test_sampling.py), so passes
    cannot corrupt an already-exact reconstruction; on imperfect models the
    partial re-noising re-draws sampler artefacts while the conditioned
    signal content survives.
    """
    if int(cfg.refine_passes) <= 0:
        # bit-identical to the plain sampler (no key split) so existing
        # artifacts/seed contracts are unchanged when refinement is off
        return sample_fn(model_fn, params, schedule, cond_stack, key, cfg,
                         clean_norm=clean_norm, x0_std_est=x0_std_est)
    k_base, k_ref = jax.random.split(key)
    x0 = sample_fn(model_fn, params, schedule, cond_stack, k_base, cfg,
                   clean_norm=clean_norm, x0_std_est=x0_std_est)
    return refine_only(sample_fn, model_fn, params, schedule, cond_stack,
                       k_ref, cfg, x0, x0_std_est=x0_std_est)


def aggregate_seeds(per_seed: jnp.ndarray, avg_mode: str = "mean",
                    y_norm: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Aggregate S independent-seed reconstructions into one estimate.

    ``per_seed`` is (S, B, C, L) in the normalized whitened domain;
    returns (B, C, L).  Extension over the reference's single-draw sampler
    (``inference.py:374-514``); modes:

    - ``mean``: plain average — residual sampler noise drops ~1/sqrt(S).
    - ``median``: elementwise median — outlier-robust (per-seed draws are
      phase-coherent, measured lag spread <=1 sample, RESULTS.md).
    - ``mf``: data-consistency weighted mean.  Each seed is scored by its
      matched-filter overlap with the measurement,
      ``rho_s = <y, x_s> / ||x_s||`` (a plain dot product — the whitened
      domain makes the noise-weighted inner product Euclidean).  In unit
      Gaussian noise, ``rho`` is monotone in the per-seed least-squares
      data-consistency evidence (residual energy after optimal amplitude
      is ``||y||^2 - rho^2``), so seeds whose trajectories wandered off
      the measurement get down-weighted.  Weights are a softmax of rho
      standardised by the CROSS-SEED std per measurement — scale-free
      (no absolute epsilons, repo numerical rule): at exactly std == 0
      it degrades to the plain mean, and it never hard-selects a single
      draw (which would reward noise-fitting at low SNR).  Note the
      standardisation makes the weights depend only on the rho
      *z-scores*: at S=2 any nonzero spread yields the fixed weights
      softmax([0, -2]) ~ (0.88, 0.12) regardless of how small
      the spread is in absolute matched-filter units.  Numerically
      harmless (near-identical seeds give a near-identical weighted
      mean), but the transition to the uniform mean is a step at
      std == 0, not a smooth blend.  Requires ``y_norm`` (B, L):
      measurement channel of the cond stack.
    """
    if avg_mode not in ("mean", "median", "mf"):
        raise ValueError(
            f"unknown avg_mode {avg_mode!r}: expected 'mean', 'median' or 'mf'")
    if avg_mode == "median":
        return jnp.median(per_seed, axis=0)
    if avg_mode == "mf":
        if y_norm is None:
            raise ValueError("avg_mode='mf' needs y_norm (B, L)")
        xs = per_seed[:, :, 0, :]                             # (S, B, L)
        num = jnp.sum(xs * y_norm[None, :, :], axis=-1)
        den = jnp.sqrt(jnp.sum(xs * xs, axis=-1))
        rho = num / jnp.where(den > 0, den, 1.0)              # (S, B)
        tau = jnp.std(rho, axis=0, keepdims=True)             # (1, B)
        z = (rho - jnp.max(rho, axis=0, keepdims=True)) / jnp.where(
            tau > 0, tau, 1.0)
        w = jax.nn.softmax(z, axis=0)[:, :, None, None]       # (S, B, 1, 1)
        return jnp.sum(per_seed * w, axis=0)
    return per_seed.mean(axis=0)


def ddim_sample(
    model_fn: ModelFn,
    params,
    schedule: DiffusionSchedule,
    cond_stack: jnp.ndarray,          # (B, cond_in_ch, L)
    key: jax.Array,
    cfg: SamplerConfig,
    clean_norm: Optional[jnp.ndarray] = None,   # (B,1,L), for oracle init
    x0_std_est: Optional[float] = None,
    collect_diagnostics: bool = False,
):
    """Run the DDIM reverse process; returns x0_hat_norm (B, 1, L).

    With ``collect_diagnostics=True`` also returns a dict of per-step arrays
    (t, alpha_bar, cfg weight, zero-lag corr of x_t vs y) — the on-device
    analogue of the reference's per-step JSONL (``inference.py:491-512``).
    """
    B, _, L = cond_stack.shape
    dtype = cond_stack.dtype

    # ---- host-side (trace-time) schedule construction ----
    t_sched = _t_ladder(schedule, cfg)
    N = len(t_sched)
    ab_np = np.asarray(schedule.alpha_bar, dtype=np.float64).clip(1e-12, 1.0)
    ab_t_np = ab_np[t_sched]
    ab_prev_np = np.concatenate([ab_np[t_sched[1:]], [1.0]])
    w_np = cfg_weight_schedule(N, cfg.cfg_mode, cfg.cfg_scale, cfg.cfg_center,
                               cfg.cfg_width)
    cu_np, cc_np = cfg_combination_coeffs(w_np, cfg.cfg_u_only_thresh)
    need_uncond = bool(np.any(cu_np != 0.0))

    xs = {
        "i": jnp.arange(N),
        "t": jnp.asarray(t_sched, jnp.int32),
        "ab_t": jnp.asarray(ab_t_np, jnp.float32),
        "ab_prev": jnp.asarray(ab_prev_np, jnp.float32),
        "cu": jnp.asarray(cu_np, jnp.float32),
        "cc": jnp.asarray(cc_np, jnp.float32),
        "w": jnp.asarray(w_np, jnp.float32),
    }

    y_chan, cond_used, cond_u = _prepare_cond(cond_stack, cfg)

    ab_start = jnp.asarray(ab_t_np[0], dtype)
    x0_std = cfg.x0_std_est if x0_std_est is None else x0_std_est
    k_init, k_loop = jax.random.split(key)
    x_init = _init_x(cfg, k_init, B, L, ab_start, y_chan, x0_std, schedule,
                     clean_norm, int(t_sched[0]), dtype)
    sc_init = jnp.zeros_like(x_init)

    def step(carry, s):
        x_t, x0_sc = carry
        if cfg.clamp_inputs > 0:
            x_t = jnp.clip(x_t, -cfg.clamp_inputs, cfg.clamp_inputs)
            x0_sc = jnp.clip(x0_sc, -cfg.clamp_inputs, cfg.clamp_inputs)
        t_b = jnp.full((B,), s["t"], jnp.int32)
        ab_t = s["ab_t"]
        ab_prev = s["ab_prev"]

        out = _forward_out(model_fn, params, x_t, t_b, cond_used, cond_u,
                           x0_sc, cfg, need_uncond, s["cu"], s["cc"])
        x0_hat, eps_hat = _x0_eps_from_out(out, x_t, ab_t, cfg)

        if cfg.x0_clip > 0:
            x0_hat = jnp.clip(x0_hat, -cfg.x0_clip, cfg.x0_clip)

        if cfg.dc_weight > 0:
            x0_hat = (1.0 - cfg.dc_weight) * x0_hat + cfg.dc_weight * y_chan

        x0_sc_next = (x0_hat if (cfg.use_selfcond and
                                 cfg.selfcond_mode != "zero") else x0_sc)

        # DDIM update; at the last step ab_prev==1 -> x_next == x0_hat exactly
        sigma_t = cfg.eta * jnp.sqrt(
            jnp.clip((1.0 - ab_prev) / (1.0 - ab_t), 0.0)
            * jnp.clip(1.0 - ab_t / ab_prev, 0.0)
        )
        dir_xt = jnp.sqrt(jnp.clip(1.0 - ab_prev - sigma_t ** 2, 0.0)) * eps_hat
        if cfg.eta > 0:
            z = jax.random.normal(jax.random.fold_in(k_loop, s["i"]), x_t.shape, dtype)
            noise = sigma_t * z
        else:
            noise = 0.0
        x_next = jnp.sqrt(ab_prev) * x0_hat + dir_xt + noise

        if collect_diagnostics:
            a = x_next.reshape(B, -1) - x_next.reshape(B, -1).mean(axis=1, keepdims=True)
            b = y_chan.reshape(B, -1) - y_chan.reshape(B, -1).mean(axis=1, keepdims=True)
            corr = (a * b).sum(axis=1) / (
                jnp.sqrt((a * a).sum(axis=1) * (b * b).sum(axis=1)) + 1e-30)
            # lag-corrected xcorr vs y (ref inference.py:491-512): the
            # reference brute-forces O(L*maxshift) integer lags on the HOST
            # each logged step; here the full lag window is one on-device
            # FFT cross-correlation inside the scan (static shapes), and the
            # normalisation is global (||a||*||b||) rather than the
            # reference's per-overlap Pearson renormalisation.
            ms = cfg.diag_max_shift if cfg.diag_max_shift > 0 else min(
                a.shape[1] - 1, 1024)
            xl, lag = lagged_xcorr(a, b, ms)
            diag = {"t": s["t"], "alpha_bar": ab_t, "cfg_w": s["w"], "corr": corr,
                    "xcorr_lag": xl, "lag": lag,
                    "x_rms": jnp.sqrt(jnp.mean(x_next ** 2, axis=(1, 2))),
                    "x0_rms": jnp.sqrt(jnp.mean(x0_hat ** 2, axis=(1, 2))),
                    "eps_rms": jnp.sqrt(jnp.mean(eps_hat ** 2, axis=(1, 2)))}
        else:
            diag = None
        return (x_next, x0_sc_next), diag

    (x_final, _), diags = jax.lax.scan(step, (x_init, sc_init), xs)
    if collect_diagnostics:
        return x_final, diags
    return x_final


def ddpm_sample(
    model_fn: ModelFn,
    params,
    schedule: DiffusionSchedule,
    cond_stack: jnp.ndarray,
    key: jax.Array,
    cfg: SamplerConfig,
    clean_norm: Optional[jnp.ndarray] = None,
    x0_std_est: Optional[float] = None,
):
    """Ancestral DDPM sampler (extension; BASELINE config 2).

    Uses the exact posterior q(x_{t-1} | x_t, x0_hat):
      mean = 1/sqrt(alpha_t) (x_t - beta_t/sqrt(1-abar_t) eps_hat)
      var  = beta_t (1-abar_{t-1}) / (1-abar_t)
    over the (possibly strided) ladder from ``build_t_schedule``.  Shares the
    CFG/conditioning machinery with :func:`ddim_sample`.
    """
    B, _, L = cond_stack.shape
    dtype = cond_stack.dtype

    t_sched = _t_ladder(schedule, cfg)
    N = len(t_sched)
    ab_np = np.asarray(schedule.alpha_bar, np.float64).clip(1e-12, 1.0)
    ab_t_np = ab_np[t_sched]
    ab_prev_np = np.concatenate([ab_np[t_sched[1:]], [1.0]])
    w_np = cfg_weight_schedule(N, cfg.cfg_mode, cfg.cfg_scale, cfg.cfg_center,
                               cfg.cfg_width)
    cu_np, cc_np = cfg_combination_coeffs(w_np, cfg.cfg_u_only_thresh)
    need_uncond = bool(np.any(cu_np != 0.0))
    is_last_np = np.arange(N) == (N - 1)

    xs = {
        "i": jnp.arange(N),
        "t": jnp.asarray(t_sched, jnp.int32),
        "ab_t": jnp.asarray(ab_t_np, jnp.float32),
        "ab_prev": jnp.asarray(ab_prev_np, jnp.float32),
        "cu": jnp.asarray(cu_np, jnp.float32),
        "cc": jnp.asarray(cc_np, jnp.float32),
        "last": jnp.asarray(is_last_np),
    }

    y_chan, cond_used, cond_u = _prepare_cond(cond_stack, cfg)

    ab_start = jnp.asarray(ab_t_np[0], dtype)
    k_init, k_loop = jax.random.split(key)
    x_init = _init_x(cfg, k_init, B, L, ab_start, y_chan,
                     cfg.x0_std_est if x0_std_est is None else x0_std_est,
                     schedule,
                     clean_norm, int(t_sched[0]), dtype)
    sc_init = jnp.zeros_like(x_init)

    def step(carry, s):
        x_t, x0_sc = carry
        if cfg.clamp_inputs > 0:
            x_t = jnp.clip(x_t, -cfg.clamp_inputs, cfg.clamp_inputs)
            x0_sc = jnp.clip(x0_sc, -cfg.clamp_inputs, cfg.clamp_inputs)
        t_b = jnp.full((B,), s["t"], jnp.int32)
        ab_t, ab_prev = s["ab_t"], s["ab_prev"]

        out = _forward_out(model_fn, params, x_t, t_b, cond_used, cond_u,
                           x0_sc, cfg, need_uncond, s["cu"], s["cc"])
        x0_hat, eps_hat = _x0_eps_from_out(out, x_t, ab_t, cfg)

        if cfg.x0_clip > 0:
            x0_hat = jnp.clip(x0_hat, -cfg.x0_clip, cfg.x0_clip)

        if cfg.dc_weight > 0:
            x0_hat = (1.0 - cfg.dc_weight) * x0_hat + cfg.dc_weight * y_chan
        x0_sc_next = (x0_hat if (cfg.use_selfcond and
                                 cfg.selfcond_mode != "zero") else x0_sc)

        # posterior mean/variance parameterised via x0_hat (valid for strided
        # ladders too: q(x_s | x_t, x0) with s<t; betas/alphas never enter)
        denom = jnp.clip(1.0 - ab_t, 1e-12)
        coef0 = jnp.sqrt(ab_prev) * (1.0 - ab_t / ab_prev) / denom
        coeft = jnp.sqrt(ab_t / ab_prev) * (1.0 - ab_prev) / denom
        mean = coef0 * x0_hat + coeft * x_t
        var = jnp.clip((1.0 - ab_prev) / denom * (1.0 - ab_t / ab_prev), 0.0)
        z = jax.random.normal(jax.random.fold_in(k_loop, s["i"]), x_t.shape, dtype)
        x_next = jnp.where(s["last"], x0_hat, mean + jnp.sqrt(var) * z)
        return (x_next, x0_sc_next), None

    (x_final, _), _ = jax.lax.scan(step, (x_init, sc_init), xs)
    return x_final


def dpmpp_sample(
    model_fn: ModelFn,
    params,
    schedule: DiffusionSchedule,
    cond_stack: jnp.ndarray,
    key: jax.Array,
    cfg: SamplerConfig,
    clean_norm: Optional[jnp.ndarray] = None,
    x0_std_est: Optional[float] = None,
):
    """DPM-Solver++(2M) — deterministic 2nd-order multistep sampler (extension).

    Same cost as DDIM (ONE model forward per step; the previous step's x0
    estimate rides the scan carry) but integrates the probability-flow ODE in
    the half-log-SNR variable lambda = log(alpha/sigma) to 2nd order in the
    data-prediction parametrisation [Lu et al. 2022, DPM-Solver++]:

        x_{i+1} = (sigma_{i+1}/sigma_i) x_i + alpha_{i+1} (1 - e^{-h_i}) D_i
        D_i     = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1},  r_i = h_{i-1}/h_i

    All coefficients are precomputed on the host in float64 at trace time
    (the last step has sigma=0 / h=inf; it collapses to c_x=0, c_D=1 and is
    taken 1st-order, landing exactly on x0 — same convention as k-diffusion).
    No reference counterpart (the reference only has DDIM,
    ``inference.py:374-514``); shares the CFG/conditioning/clamp machinery
    with :func:`ddim_sample`.  Deterministic: ``eta`` is ignored.
    """
    B, _, L = cond_stack.shape
    dtype = cond_stack.dtype

    t_sched = _t_ladder(schedule, cfg)
    N = len(t_sched)
    ab_np = np.asarray(schedule.alpha_bar, np.float64).clip(1e-12, 1.0 - 1e-12)
    ab_t_np = ab_np[t_sched]
    alpha = np.sqrt(ab_t_np)
    sig = np.sqrt(1.0 - ab_t_np)
    # target nodes: next ladder entry; final target is the clean manifold
    alpha_n = np.concatenate([alpha[1:], [1.0]])
    sig_n = np.concatenate([sig[1:], [0.0]])
    with np.errstate(divide="ignore"):
        lam = np.log(alpha / sig)
        lam_n = np.log(np.where(sig_n > 0, alpha_n, 1.0)
                       / np.where(sig_n > 0, sig_n, 1.0))
        lam_n = np.where(sig_n > 0, lam_n, np.inf)
    h = lam_n - lam                                   # > 0; last = inf
    c_x = np.where(sig > 0, sig_n / sig, 0.0)         # last = 0
    c_d = alpha_n * -np.expm1(-h)                     # last = 1
    # 2M combination coefficients; 1st order at step 0 (no history) and at
    # the final step (h = inf would extrapolate x0 through an empty interval)
    b_old = np.zeros(N)
    if N > 2:
        r = h[:-2] / h[1:-1]                          # r_i = h_{i-1}/h_i
        b_old[1:-1] = -1.0 / (2.0 * r)
    b_cur = 1.0 - b_old

    w_np = cfg_weight_schedule(N, cfg.cfg_mode, cfg.cfg_scale, cfg.cfg_center,
                               cfg.cfg_width)
    cu_np, cc_np = cfg_combination_coeffs(w_np, cfg.cfg_u_only_thresh)
    need_uncond = bool(np.any(cu_np != 0.0))

    xs = {
        "t": jnp.asarray(t_sched, jnp.int32),
        "ab_t": jnp.asarray(ab_t_np, jnp.float32),
        "c_x": jnp.asarray(c_x, jnp.float32),
        "c_d": jnp.asarray(c_d, jnp.float32),
        "b_cur": jnp.asarray(b_cur, jnp.float32),
        "b_old": jnp.asarray(b_old, jnp.float32),
        "cu": jnp.asarray(cu_np, jnp.float32),
        "cc": jnp.asarray(cc_np, jnp.float32),
    }

    y_chan, cond_used, cond_u = _prepare_cond(cond_stack, cfg)

    ab_start = jnp.asarray(ab_t_np[0], dtype)
    x0_std = cfg.x0_std_est if x0_std_est is None else x0_std_est
    k_init, _ = jax.random.split(key)
    x_init = _init_x(cfg, k_init, B, L, ab_start, y_chan, x0_std, schedule,
                     clean_norm, int(t_sched[0]), dtype)
    sc_init = jnp.zeros_like(x_init)

    def step(carry, s):
        x_t, x0_sc, x0_old = carry
        if cfg.clamp_inputs > 0:
            x_t = jnp.clip(x_t, -cfg.clamp_inputs, cfg.clamp_inputs)
            x0_sc = jnp.clip(x0_sc, -cfg.clamp_inputs, cfg.clamp_inputs)
        t_b = jnp.full((B,), s["t"], jnp.int32)

        out = _forward_out(model_fn, params, x_t, t_b, cond_used, cond_u,
                           x0_sc, cfg, need_uncond, s["cu"], s["cc"])
        x0_hat, _ = _x0_eps_from_out(out, x_t, s["ab_t"], cfg)

        if cfg.x0_clip > 0:
            x0_hat = jnp.clip(x0_hat, -cfg.x0_clip, cfg.x0_clip)
        if cfg.dc_weight > 0:
            x0_hat = (1.0 - cfg.dc_weight) * x0_hat + cfg.dc_weight * y_chan
        x0_sc_next = (x0_hat if (cfg.use_selfcond and
                                 cfg.selfcond_mode != "zero") else x0_sc)

        d = s["b_cur"] * x0_hat + s["b_old"] * x0_old
        x_next = s["c_x"] * x_t + s["c_d"] * d
        return (x_next, x0_sc_next, x0_hat), None

    (x_final, _, _), _ = jax.lax.scan(step, (x_init, sc_init, sc_init), xs)
    return x_final


def one_step_proxy(
    model_fn: ModelFn,
    params,
    schedule: DiffusionSchedule,
    clean_norm: jnp.ndarray,          # (B,1,L)
    cond_stack: jnp.ndarray,          # (B,cond_in_ch,L)
    key: jax.Array,
    target_snr: float,
    cfg: SamplerConfig,
) -> jnp.ndarray:
    """Diagnostic single-step reconstruction (ref ``inference.py:317-371``).

    Picks t whose SNR matches ``target_snr``, forward-noises clean, runs one
    (optionally CFG-combined) denoise, and returns x0_hat_norm.
    """
    from .schedules import t_for_target_snr

    B = clean_norm.shape[0]
    t_pick = t_for_target_snr(schedule, target_snr)
    t_b = jnp.full((B,), t_pick, jnp.int32)
    ab_t = schedule.alpha_bar[t_pick]

    eps = jax.random.normal(key, clean_norm.shape, clean_norm.dtype)
    x_t = jnp.sqrt(ab_t) * clean_norm + jnp.sqrt(1.0 - ab_t) * eps
    sc = jnp.zeros_like(x_t)

    _y_chan, cond_used, cond_u = _prepare_cond(cond_stack, cfg)

    if cfg.cfg_scale != 1.0:
        # cond + uncond as ONE batched forward (2B) — same idiom as the
        # samplers, instead of two sequential B-sized calls
        net2 = jnp.concatenate(
            [_net_in(x_t, cond_used, sc, cfg.use_selfcond),
             _net_in(x_t, cond_u, sc, cfg.use_selfcond)], axis=0)
        out2 = model_fn(params, net2, jnp.concatenate([t_b, t_b]))
        out_c, out_u = out2[:B], out2[B:]
        out = out_u + cfg.cfg_scale * (out_c - out_u)
    else:
        out = model_fn(params, _net_in(x_t, cond_used, sc, cfg.use_selfcond),
                       t_b)

    # pred_type-aware x0 recovery (a v checkpoint's raw output is NOT x0)
    x0_hat, _ = _x0_eps_from_out(out, x_t, ab_t, cfg)
    return x0_hat
