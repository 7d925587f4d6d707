"""Reconstruction engine: checkpoint -> conditioned DDIM/DDPM sampling ->
de-whitened strain + metrics.

Reference parity (``/root/reference/src/snr_denoising/inference.py:517-903``):
measurement loading from HDF5/npy, architecture rebuild from checkpoint args
(no CLI arch flags), EMA-preferred weights, whitening resolution with the
'auto' cascade model -> welch -> train (``inference.py:656-700``), sigma in
the conditioning domain with hardcoded per-domain fallbacks overridable via
``fallback_sigma.json`` (``inference.py:703-717``), metadata channel stacks
in the fixed order [m1, m2, s1, s2, q, Mc] with dataset-adaptive scales
(``inference.py:96-122``), start-t from a target SNR, auto run-tags from the
knob values (``inference.py:753-763``), de-whitening back to strain
(``inference.py:819-826``) and tail-window metrics JSON.

TPU-first: the sampler is a jitted ``lax.scan`` (see ``ops/sampling.py``);
``reconstruct_batch`` evaluates MANY measurements in one program — the
building block the sweep/grid harnesses use instead of the reference's
serial Python loops.
"""
from __future__ import annotations

import json
import os
import sys
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data import hdf5io
from .data.pipeline import (
    pick_sigma_np,
    whiten_model_np,
    whiten_train_like_np,
    whiten_welch_np,
)
from .models.unet import UNet1D
from .ops.sampling import (SamplerConfig, aggregate_seeds, ddim_sample,
                           ddpm_sample, dpmpp_sample, one_step_proxy,
                           refine_only, sample_with_refinement)
from .ops.schedules import (
    make_schedule,
    snr_from_alpha_bar,
    t_for_target_snr,
)
from .utils.checkpoint import load_checkpoint, restore_params, select_weights

SIGMA_FALLBACK = {"train": 2.914e-12, "welch": 2.914e-16, "model": 2.914e-16,
                  "raw": 2.914e-12}


# ---------------------------------------------------------------------------
# Model loading
# ---------------------------------------------------------------------------

def load_model(ckpt_path: str, use_ema: bool = True):
    """Rebuild the UNet + schedule from checkpoint args (ref
    ``inference.py:614-653``).  Returns (model, params, schedule, ck_args).

    Accepts both this framework's ``.msgpack`` checkpoints and reference
    torch ``.pth`` checkpoints (weights converted via ``utils.torch_compat``).
    """
    if ckpt_path.endswith((".pth", ".pt")):
        return _load_torch_model(ckpt_path, use_ema)
    ckpt = load_checkpoint(ckpt_path)
    ck = ckpt["args"]
    in_ch = int(ck.get("in_ch", 3))
    cond_in_ch = int(ck.get("cond_in_ch", 1))
    T = int(ck.get("T", 1000))
    use_selfcond = in_ch == (1 + cond_in_ch + 1)
    model = UNet1D(
        in_ch=in_ch,
        base_ch=int(ck.get("base_ch", 64)),
        time_dim=int(ck.get("time_dim", 128)),
        depth=int(ck.get("depth", 3)),
        t_embed_max_time=max(0, T - 1),
        cond_in_ch=cond_in_ch,
        use_selfcond=use_selfcond,
        use_attention=bool(ck.get("use_attention", False)),
        dtype=jnp.bfloat16 if ck.get("bf16", False) else None,
    )
    # init a skeleton to get the tree structure, then restore
    x0 = jnp.zeros((1, in_ch, 64))
    params_t = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))
    weights, used_ema = select_weights(ckpt, use_ema=use_ema)
    params = restore_params(params_t, weights)
    print(f"[infer] loaded {'EMA' if used_ema else 'raw'} weights from {ckpt_path}")
    schedule = make_schedule(T, ck.get("schedule", "cosine"))
    return model, params, schedule, ck


def _load_torch_model(pth_path: str, use_ema: bool = True):
    """Load a REFERENCE torch checkpoint (``train.py:607-629`` payload) by
    converting its state_dict into our flax pytree."""
    import torch

    from .utils.torch_compat import torch_state_dict_to_flax

    payload = torch.load(pth_path, map_location="cpu", weights_only=False)
    ck = dict(payload.get("args", {}))
    in_ch = int(ck.get("in_ch", 3))
    cond_in_ch = int(ck.get("cond_in_ch", 1))
    depth = int(ck.get("depth", 3))
    T = int(ck.get("T", 1000))
    use_selfcond = in_ch == (1 + cond_in_ch + 1)
    model = UNet1D(
        in_ch=in_ch, base_ch=int(ck.get("base_ch", 64)),
        time_dim=int(ck.get("time_dim", 128)), depth=depth,
        t_embed_max_time=max(0, T - 1), cond_in_ch=cond_in_ch,
        use_selfcond=use_selfcond)
    key = ("model_ema_state" if use_ema and "model_ema_state" in payload
           else "model_state")
    sd = {k: v.detach().cpu().numpy() for k, v in payload[key].items()}
    params = torch_state_dict_to_flax(sd, depth)
    print(f"[infer] converted torch checkpoint {pth_path} "
          f"({'EMA' if key == 'model_ema_state' else 'raw'})")
    schedule = make_schedule(T, ck.get("schedule", "cosine"))
    return model, params, schedule, ck


# ---------------------------------------------------------------------------
# Metadata stack (ref inference.py:96-122)
# ---------------------------------------------------------------------------

def meta_to_stack(meta: dict, L: int, cond_in_ch: int, M_SCALE: float,
                  Q_SCALE: float) -> Optional[np.ndarray]:
    """(C_meta, L) channels in the fixed order [m1, m2, s1, s2, q, Mc];
    masses and chirp mass / M_SCALE, q clipped to [0, Q_SCALE] / Q_SCALE."""
    C = max(0, cond_in_ch - 1)
    if C <= 0:
        return None

    def tile(v):
        return np.full((L,), float(v), np.float32)

    qv = meta.get("q", 0.0)
    if not np.isfinite(qv):
        qv = 0.0
    rows = [
        tile(meta.get("mass1", 0.0) / max(M_SCALE, 1e-9)),
        tile(meta.get("mass2", 0.0) / max(M_SCALE, 1e-9)),
        tile(meta.get("spin1z", 0.0)),
        tile(meta.get("spin2z", 0.0)),
        tile(min(max(qv, 0.0), Q_SCALE) / max(Q_SCALE, 1e-9)),
        tile(meta.get("chirp_mass", 0.0) / max(M_SCALE, 1e-9)),
    ]
    arr = np.stack(rows[:C], axis=0)
    if arr.shape[0] < C:
        arr = np.concatenate(
            [arr, np.zeros((C - arr.shape[0], L), np.float32)], axis=0)
    return arr


# ---------------------------------------------------------------------------
# Measurement prep: whitening resolution + sigma + cond stack
# ---------------------------------------------------------------------------

def apply_distilled_defaults(args, ck: dict) -> None:
    """Resolve auto ('None') sampler knobs against a checkpoint's deployment
    contract.

    Distilled checkpoints (``training/distill.py``) are trained for a FIXED
    (steps, ladder, folded-CFG, start_t) configuration recorded in their
    args; running them at other knobs silently degrades quality.  Plain
    checkpoints get the reference defaults (steps=200, cfg_scale=1.5,
    ref ``inference.py:529-577``).  Mutates ``args`` in place; explicit CLI
    values (non-None) always win.
    """
    dist = "distilled_steps" in ck
    if getattr(args, "steps", None) is None:
        args.steps = int(ck["distilled_steps"]) if dist else 200
        if dist:
            print(f"[infer] distilled checkpoint: steps={args.steps} "
                  f"(ladder={ck.get('distilled_ladder')}, CFG folded)")
    if getattr(args, "cfg_scale", None) is None:
        # guidance is folded INTO a distilled student — re-applying CFG at
        # sampling time would double-guide (and double model calls)
        args.cfg_scale = 1.0 if dist else 1.5
    if dist and getattr(args, "ladder", None) is None:
        args.ladder = str(ck.get("distilled_ladder", "lambda"))
    if (dist and getattr(args, "start_t", None) is None
            and ck.get("distilled_start_t") is not None):
        args.start_t = int(ck["distilled_start_t"])


def inherit_whiten_domain(args, ck: dict, where: str = "infer") -> None:
    """Resolve ``--whiten``/``--whiten-mode`` against the checkpoint's actual
    TRAINING domain (mutates ``args``; used by gw-infer/gw-grid/gw-sweep).

    Checkpoints record both the requested ``whiten_mode`` and (since r4) the
    pipeline's resolved domain ``whiten_mode_resolved``.  The resolved value
    wins: the r3 flagship trained train-like while its args claimed 'model'
    (silent PSD fallback), and every eval inherited the lie.  An explicit
    CLI mode that contradicts the training domain is an error unless
    ``--allow-domain-mismatch`` is passed (raw-algebra parity tests do this
    deliberately).  Ref ``inference.py:529-577`` (knob inheritance) has no
    such guard — domain mismatch is a failure class we add detection for.
    """
    resolved = str(ck.get("whiten_mode_resolved", "") or "")
    if getattr(args, "whiten", None) is None:
        args.whiten = int(bool(ck.get("whiten", False)))
    if getattr(args, "whiten_mode", None) is None:
        if resolved in ("model", "welch", "train"):
            args.whiten_mode = resolved
            requested = str(ck.get("whiten_mode", resolved))
            if requested not in ("", "auto", resolved):
                print(f"[{where}] NOTE: checkpoint requested whiten_mode="
                      f"'{requested}' but actually TRAINED in '{resolved}' "
                      f"— evaluating in the trained domain",
                      file=sys.stderr, flush=True)
        else:
            args.whiten_mode = str(ck.get("whiten_mode", "auto"))
    elif (bool(args.whiten) and resolved in ("model", "welch", "train")
          and args.whiten_mode not in ("auto", resolved)):
        msg = (f"[{where}] eval whiten_mode='{args.whiten_mode}' does not "
               f"match the checkpoint's training domain '{resolved}' — "
               f"reconstructions would be evaluated in the wrong domain")
        if getattr(args, "allow_domain_mismatch", False):
            print(msg + " (allowed by --allow-domain-mismatch)",
                  file=sys.stderr, flush=True)
        else:
            raise ValueError(msg + "; pass --allow-domain-mismatch to force")


def sigma_fallbacks(ckpt_path: Optional[str]) -> Dict[str, float]:
    """Hardcoded per-domain fallbacks, overridable by a ``fallback_sigma.json``
    next to the checkpoint (ref ``inference.py:706-717``)."""
    fallback = dict(SIGMA_FALLBACK)
    if ckpt_path:
        try:
            with open(os.path.join(os.path.dirname(ckpt_path),
                                   "fallback_sigma.json")) as fh:
                fb = json.load(fh)
            for k in list(fallback.keys()):
                if k in fb and "median" in fb[k]:
                    fallback[k] = float(fb[k]["median"])
        except Exception:
            pass
    return fallback


def prepare_measurement(
    y_raw: np.ndarray,
    clean_raw: Optional[np.ndarray],
    fs: float,
    P_model: Optional[np.ndarray],
    welch_in: Tuple[Optional[np.ndarray], Optional[np.ndarray]],
    meta: dict,
    *,
    cond_in_ch: int,
    M_SCALE: float = 80.0,
    Q_SCALE: float = 10.0,
    whiten: bool = False,
    whiten_mode: str = "auto",
    sigma_mode: str = "std",
    sigma_fixed: float = 1.0,
    ckpt_path: Optional[str] = None,
) -> dict:
    """Whiten, normalise and stack one measurement for sampling.

    'auto' prefers model -> welch -> train (ref ``inference.py:660-679``;
    the sweep/grid harnesses in the reference used welch-first — a noted
    inconsistency (SURVEY.md §2, sweep-prep row) that this rebuild
    normalises to the inference order everywhere).
    """
    from numpy.fft import irfft, rfft, rfftfreq
    from scipy.signal import welch as scipy_welch

    L = len(y_raw)
    fw_in, Pw_in = welch_in
    kind = "raw"
    P_train = freqs_P = P_model_used = None
    y_c, clean_c = y_raw, clean_raw

    if whiten:
        mode = whiten_mode
        if mode == "auto":
            if P_model is not None:
                mode = "model"
            elif fw_in is not None and Pw_in is not None:
                mode = "saved-welch"
            else:
                mode = "train"
        if mode == "model" and P_model is None:
            print("[inference] WARNING: whiten_mode='model' requested but no "
                  "model PSD is available (saved or derivable) — degrading "
                  "to TRAIN-LIKE whitening; the eval domain is 'train'.",
                  file=sys.stderr, flush=True)
            mode = "train"
        if mode == "welch" and fw_in is not None and Pw_in is not None:
            # a checkpoint trained with whiten_mode='welch' was whitened with
            # the dataset's SAVED per-sample Welch PSD (pipeline._prep_sample)
            # — use the same PSD here; estimating a fresh one from the
            # signal-containing measurement would evaluate the model in a
            # differently-whitened (self-contaminated) domain.  The fresh
            # estimate below remains the fallback when none was saved
            # (reference behaviour, ``inference.py:160-180``).
            mode = "saved-welch"
        if mode == "model":
            x = clean_raw if clean_raw is not None else np.zeros_like(y_raw)
            y_c, clean_c, P_model_used = whiten_model_np(y_raw, x, P_model, fs,
                                                         eps=1e-12)
            clean_c = clean_c if clean_raw is not None else None
            kind = "model"
        elif mode == "saved-welch":
            # saved per-sample Welch PSD interpolated onto the rfft grid
            from .data.pipeline import whiten_weight_np
            f_tgt = rfftfreq(L, 1.0 / fs)
            P = np.interp(f_tgt, fw_in, Pw_in, left=Pw_in[0], right=Pw_in[-1])
            w = whiten_weight_np(P)
            Y = rfft(y_raw.astype(np.float64))
            y_c = irfft(Y * w, n=L).astype(np.float32)
            if clean_raw is not None:
                X = rfft(clean_raw.astype(np.float64))
                clean_c = irfft(X * w, n=L).astype(np.float32)
            else:
                clean_c = None
            freqs_P = (f_tgt, P)
            kind = "welch"
        elif mode == "welch":
            # estimate a fresh Welch PSD from the measurement itself
            f_w, P_w = scipy_welch(y_raw, fs=fs, nperseg=min(4096, L))
            x = clean_raw if clean_raw is not None else np.zeros_like(y_raw)
            y_c, clean_c, P = whiten_welch_np(y_raw, x, f_w, P_w, fs, eps=1e-12)
            clean_c = clean_c if clean_raw is not None else None
            freqs_P = (rfftfreq(L, 1.0 / fs), P)
            kind = "welch"
        else:  # 'train'
            x = clean_raw if clean_raw is not None else np.zeros_like(y_raw)
            y_c, clean_c, P_train = whiten_train_like_np(y_raw, x)
            clean_c = clean_c if clean_raw is not None else None
            kind = "train"

    sigma = pick_sigma_np(np.asarray(y_c), sigma_mode, sigma_fixed)
    fb = sigma_fallbacks(ckpt_path)
    if (not np.isfinite(sigma)) or sigma < 1e-20:
        sigma = fb.get(kind, fb["train"])
        print(f"[warn] sigma degenerate; fallback={sigma:.3e} (mode={kind})")

    y_norm = (np.asarray(y_c) / sigma).astype(np.float32)[None, None, :]
    clean_norm = None
    if clean_c is not None:
        clean_norm = (np.asarray(clean_c) / sigma).astype(np.float32)[None, None, :]

    if cond_in_ch <= 1:
        cond_stack = y_norm
    else:
        arr = meta_to_stack(meta, L, cond_in_ch, M_SCALE, Q_SCALE)
        if arr is None:
            arr = np.zeros((cond_in_ch - 1, L), np.float32)
        cond_stack = np.concatenate([y_norm, arr[None]], axis=1)

    return {
        "y_raw": y_raw, "clean_raw": clean_raw, "y_for_cond": np.asarray(y_c),
        "clean_for_cond": (np.asarray(clean_c) if clean_c is not None else None),
        "y_norm": y_norm, "clean_norm": clean_norm, "cond_stack": cond_stack,
        "sigma": float(sigma), "fs": float(fs), "L": L,
        "whiten_kind_used": kind, "P_train": P_train, "freqs_P": freqs_P,
        "P_model_used": P_model_used,
    }


def mf_amp_calibrate(x0_white: np.ndarray, y_white: np.ndarray,
                     clip: tuple = (0.25, 4.0)):
    """Post-hoc matched-filter amplitude calibration (extension; addresses
    the round-2 corr/MF trade-off: v-pred models recover waveform SHAPE
    (held-out corr 0.81) much better than AMPLITUDE (MF ratio ~0.65)).

    In the whitened domain the noise is white, so the maximum-likelihood
    amplitude for a fixed template shape r against measurement y is the
    least-squares scalar s = <y, r> / <r, r>.  When the reconstructed shape
    is right, E[s] equals the true amplitude ratio with ~1/SNR relative
    scatter — far tighter than the ~35% systematic deficit it corrects.
    The recon is rescaled by s (clipped for degenerate recons).

    Returns (calibrated x0_white, s).
    """
    x = np.asarray(x0_white, np.float64).ravel()
    y = np.asarray(y_white, np.float64).ravel()
    den = float(np.dot(x, x))
    if den <= 0.0 or not np.isfinite(den):
        return x0_white, 1.0
    s = float(np.dot(y, x) / den)
    if not np.isfinite(s):
        return x0_white, 1.0
    s = float(np.clip(s, *clip))
    return (np.asarray(x0_white) * s).astype(np.asarray(x0_white).dtype), s


def dewhiten_back(x: np.ndarray, prep: dict) -> np.ndarray:
    """Invert whatever whitening ``prepare_measurement`` applied (ref
    ``inference.py:819-826``).

    Uses ``dewhiten_weight_np`` — the exact in-band inverse of the band-
    limited whitening weight (out-of-band bins were zeroed by whitening and
    stay zero).  The reference adds eps on both sides, which for
    physical-unit PSDs breaks the round trip."""
    from numpy.fft import irfft, rfft

    from .data.pipeline import dewhiten_weight_np

    kind = prep["whiten_kind_used"]
    L = len(x)
    if kind == "train":
        # train-like P is a (floored, never-zero) periodogram
        return irfft(rfft(x) * np.sqrt(prep["P_train"]), n=L)
    if kind == "welch":
        _, P = prep["freqs_P"]
        return irfft(rfft(x) * dewhiten_weight_np(P), n=L)
    if kind == "model":
        return irfft(rfft(x) * dewhiten_weight_np(prep["P_model_used"]), n=L)
    return x


# ---------------------------------------------------------------------------
# Reconstruction
# ---------------------------------------------------------------------------

def resolve_start_t(schedule, start_t: Optional[int], start_snr: Optional[float]):
    """--start-snr wins over --start-t (ref ``inference.py:749-751``)."""
    if start_snr is not None:
        return t_for_target_snr(schedule, start_snr)
    return start_t


def make_run_tag(mode: str, cfg: SamplerConfig, schedule, whiten: bool,
                 whiten_mode: str, sigma_mode: str) -> str:
    """Auto run-tag from knob values (ref ``inference.py:753-763``)."""
    start_t_eff = (schedule.T - 1) if cfg.start_t is None else int(cfg.start_t)
    snr_eff = snr_from_alpha_bar(schedule.alpha_bar)[start_t_eff]
    tag = (f"{mode}_t{start_t_eff}_snr{snr_eff:.1f}_steps{cfg.steps}"
           f"_eta{cfg.eta}_cfg{cfg.cfg_scale}_cfgmode-{cfg.cfg_mode}"
           f"_ctr{cfg.cfg_center}_w{cfg.cfg_width}_init-{cfg.init_mode}"
           f"_pred-{cfg.pred_type}_dc{cfg.dc_weight}_cond{cfg.cond_scale}"
           f"_eps{cfg.eps_scale}_{'white' if whiten else 'raw'}"
           f"_{whiten_mode}_{sigma_mode}")
    if cfg.refine_passes > 0:
        tag += f"_ref{cfg.refine_passes}x{cfg.refine_t}"
    return tag.replace(".", "p")


def reconstruct(
    model: UNet1D,
    params,
    schedule,
    prep: dict,
    cfg: SamplerConfig,
    key: jax.Array,
    sampler: str = "ddim",
    collect_diagnostics: bool = False,
    tiled_chunk: int = 0,
    mesh=None,
    avg_seeds: int = 1,
    return_all_seeds: bool = False,
    amp_calib: str = "none",
    avg_mode: str = "mean",
):
    """Sample x0 for one prepared measurement; returns (x0_hat_raw strain,
    x0_hat_white, diagnostics|None).

    ``amp_calib="mf"`` rescales the whitened recon by the least-squares
    matched-filter amplitude against the measurement
    (:func:`mf_amp_calibrate`).

    ``tiled_chunk`` > 0 evaluates the U-Net in halo tiles of that length
    (``parallel/seqtile.py``) — the multi-chip long-segment path; with
    ``mesh`` the tile axis shards over the mesh's data axis.

    ``avg_seeds`` > 1 averages that many independent-noise reconstructions
    (one batched scan; see :func:`reconstruct_batch`).  Diagnostics then
    cover all seed rows.  With ``return_all_seeds`` the per-seed whitened
    reconstructions (S, L) are returned as a 4th element — the seed scatter
    is a reconstruction-uncertainty estimate (no reference counterpart).
    """

    if tiled_chunk > 0:
        from .parallel.seqtile import tiled_apply

        def model_fn(p, x, t):
            return tiled_apply(model, p, x, t, chunk=tiled_chunk, mesh=mesh)
    else:
        def model_fn(p, x, t):
            return model.apply(p, x, t)

    cond = jnp.asarray(prep["cond_stack"])
    clean_norm = (jnp.asarray(prep["clean_norm"])
                  if prep["clean_norm"] is not None else None)
    # always cfg.x0_std_est (CLI --x0-std-est): the batch path
    # (reconstruct_batch, used by sweep/grid) has no oracle access, so the
    # single-sample path must not silently substitute the held-out clean's
    # std — a sweep-selected scaled-noise combo would otherwise replay with
    # a different x_T init distribution than it was scored with
    x0_std = cfg.x0_std_est

    S = max(1, int(avg_seeds))
    if S > 1:
        cond = jnp.tile(cond, (S, 1, 1))
        if clean_norm is not None:
            clean_norm = jnp.tile(clean_norm, (S, 1, 1))

    if sampler == "ddim" and collect_diagnostics:
        # diagnostics cover the BASE pass; refinement passes (if any) run
        # after, with the same key-split convention as
        # sample_with_refinement so recon is identical with/without diag
        k_base, k_ref = (jax.random.split(key) if cfg.refine_passes > 0
                         else (key, key))
        x0_norm, diag = ddim_sample(model_fn, params, schedule, cond, k_base,
                                    cfg, clean_norm=clean_norm,
                                    x0_std_est=x0_std,
                                    collect_diagnostics=True)
        x0_norm = refine_only(ddim_sample, model_fn, params, schedule, cond,
                              k_ref, cfg, x0_norm, x0_std_est=x0_std)
    else:
        sample_fn = {"ddim": ddim_sample, "ddpm": ddpm_sample,
                     "dpmpp": dpmpp_sample}[sampler]
        x0_norm = sample_with_refinement(sample_fn, model_fn, params,
                                         schedule, cond, key, cfg,
                                         clean_norm=clean_norm,
                                         x0_std_est=x0_std)
        diag = None

    seeds_white = None
    if S > 1:
        if return_all_seeds:
            seeds_white = (np.asarray(x0_norm)[:, 0, :] * prep["sigma"])
        # aggregation modes (mean / median / mf-weighted) documented on
        # ops.sampling.aggregate_seeds; x0_norm here is (S, 1, L) with the
        # seed axis as batch, so lift to (S, B=1, 1, L) and drop back
        y0 = jnp.asarray(prep["cond_stack"]).reshape(
            -1, x0_norm.shape[-1])[0][None, :]               # (1, L)
        x0_norm = aggregate_seeds(x0_norm[:, None], avg_mode, y_norm=y0)

    x0_white = np.asarray(x0_norm).ravel() * prep["sigma"]
    if amp_calib == "mf":
        x0_white, s_cal = mf_amp_calibrate(x0_white, prep["y_for_cond"])
        if seeds_white is not None:
            seeds_white = seeds_white * s_cal
    x0_raw = dewhiten_back(x0_white, prep)
    if return_all_seeds:
        return x0_raw, x0_white, diag, seeds_white
    return x0_raw, x0_white, diag


def reconstruct_batch(
    model: UNet1D,
    params,
    schedule,
    cond_stacks: np.ndarray,       # (B, cond_in_ch, L) — same length samples
    sigmas: np.ndarray,            # (B,)
    cfg: SamplerConfig,
    key: jax.Array,
    clean_norms: Optional[np.ndarray] = None,
    sampler: str = "ddim",
    mesh=None,
    avg_seeds: int = 1,
    amp_calib: str = "none",
    extra_models: Optional[list] = None,
    avg_mode: str = "mean",
    return_seed_std: bool = False,
) -> np.ndarray:
    """Batched sampling: one jitted scan over B measurements at once (the
    reference loops samples serially, ``sweep_infer.py:205-243``).

    With ``mesh`` the batch is sharded over the mesh's ``data`` axis and
    params are replicated — population-scale reconstruction on a slice
    (BASELINE config 5) is this call with B = population size.  B must be
    divisible by the data-axis size (pad upstream).

    ``avg_seeds`` > 1 (extension; no reference counterpart) reconstructs
    each measurement from S independent start/trajectory noise draws IN THE
    SAME batched scan (batch S·B) and averages: the conditioned signal is
    coherent across draws while residual sampler noise averages down ~1/√S.

    ``extra_models`` (extension): list of ``(model, params)`` checkpoint
    pairs ensembled with the primary — every member samples with the SAME
    key (identical init/per-step noise) so the average isolates model
    disagreement; seed diversity stays ``avg_seeds``' job.  Members must
    share schedule/pred_type/conditioning domain (callers validate).

    Returns whitened-domain reconstructions (B, L).  With
    ``return_seed_std`` (requires ``avg_seeds`` > 1) returns
    ``(x0_white, std_white)`` where ``std_white`` (B, L) is the elementwise
    std of the per-seed whitened reconstructions — the seed-ensemble
    scatter, an epistemic-uncertainty estimate with no reference
    counterpart.  With ``amp_calib="mf"`` the std is rescaled by the same
    per-row calibration factor as the aggregate, so the two stay in one
    amplitude domain.
    """

    sample_fn = {"ddim": ddim_sample, "ddpm": ddpm_sample,
                 "dpmpp": dpmpp_sample}[sampler]
    cond = jnp.asarray(cond_stacks)
    cn = jnp.asarray(clean_norms) if clean_norms is not None else None
    S = max(1, int(avg_seeds))
    if S > 1:
        B = cond.shape[0]
        cond = jnp.tile(cond, (S, 1, 1))       # row-wise independent noise
        if cn is not None:
            cn = jnp.tile(cn, (S, 1, 1))
    if mesh is not None:
        from .parallel import mesh as pmesh

        cond = jax.device_put(cond, pmesh.batch_sharding(mesh))
        if cn is not None:
            cn = jax.device_put(cn, pmesh.batch_sharding(mesh))
    pairs = [(model, params)] + list(extra_models or [])
    x0_norm = None
    for m_i, p_i in pairs:
        if mesh is not None:
            from .parallel import mesh as pmesh

            p_i = pmesh.replicate_tree(p_i, mesh)
        out = sample_with_refinement(
            sample_fn, lambda p, x, t, _m=m_i: _m.apply(p, x, t),
            p_i, schedule, cond, key, cfg, clean_norm=cn)
        x0_norm = out if x0_norm is None else x0_norm + out
    x0_norm = x0_norm / len(pairs)
    std_white = None
    if S > 1:
        per_seed = x0_norm.reshape(S, B, *x0_norm.shape[1:])
        if return_seed_std:
            std_white = (np.asarray(per_seed.std(axis=0))[:, 0, :]
                         * np.asarray(sigmas)[:, None])
        x0_norm = aggregate_seeds(
            per_seed, avg_mode,
            y_norm=jnp.asarray(cond_stacks)[:, 0, :])
    x0_white = np.asarray(x0_norm)[:, 0, :] * np.asarray(sigmas)[:, None]
    if amp_calib == "mf":
        y_white = (np.asarray(cond_stacks)[:, 0, :]
                   * np.asarray(sigmas)[:, None])
        for i in range(x0_white.shape[0]):
            x0_white[i], s_cal = mf_amp_calibrate(x0_white[i], y_white[i])
            if std_white is not None:
                std_white[i] = std_white[i] * s_cal
    if return_seed_std:
        return x0_white, std_white
    return x0_white


def proxy_reconstruct(model, params, schedule, prep: dict, cfg: SamplerConfig,
                      key: jax.Array, target_snr: float = 20.0) -> np.ndarray:
    """One-step proxy diagnostic, de-whitened (ref ``inference.py:868-898``)."""

    def model_fn(p, x, t):
        return model.apply(p, x, t)

    x0_norm = one_step_proxy(
        model_fn, params, schedule, jnp.asarray(prep["clean_norm"]),
        jnp.asarray(prep["cond_stack"]), key, target_snr, cfg)
    x0_white = np.asarray(x0_norm).ravel() * prep["sigma"]
    return dewhiten_back(x0_white, prep)
