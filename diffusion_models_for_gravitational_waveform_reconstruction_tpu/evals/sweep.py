"""Sampler-hyperparameter sweep engine.

Reference parity (``/root/reference/src/snr_denoising/sweep_infer.py``):
- model + samples are prepared ONCE (``sweep_infer.py:163-199``);
- objective J = corr_strain + 0.5 corr_white - 0.1 nmae_sigma
  (``sweep_infer.py:8-13``);
- grid mode over {start_snr x cfg x init x dc x eta}
  (``sweep_infer.py:246-287``);
- random mode: coarse draws -> top-k -> refine with several seeds
  (``sweep_infer.py:289-326``), log-uniform start_snr;
- artifacts ``grid_results.json`` / ``coarse_top.json`` /
  ``final_results.json`` and a replayable ``best_cmd.txt``
  (``sweep_infer.py:261-286``, ``328-351``).

TPU-first: each combo evaluates ALL prepared samples in a single jitted
``lax.scan`` (batched DDIM via ``inference.reconstruct_batch``) instead of
the reference's serial per-sample Python loop (``sweep_infer.py:205-243``) —
the prime vmap target flagged in SURVEY.md §3.4.  Whitening preparation uses
the inference-order 'auto' cascade (model -> welch -> train); the reference's
sweep used welch-first, an inconsistency this rebuild normalises
(SURVEY.md §2, sweep-prep row).

To bound XLA recompiles, random-mode start_snr draws are snapped to a
start_t grid (multiples of ``START_T_QUANT``): each distinct
(steps, start_t) pair is one compilation.
"""
from __future__ import annotations

import dataclasses
import itertools
import json
import os
from typing import Dict, List, Sequence

import jax
import numpy as np

from ..data import hdf5io
from ..inference import prepare_measurement, reconstruct_batch
from ..ops.sampling import SamplerConfig
from ..ops.schedules import t_for_target_snr
from . import metrics as M

START_T_QUANT = 25


@dataclasses.dataclass
class Combo:
    """One sampler-knob combination under sweep."""

    start_snr: float
    cfg_scale: float
    init_mode: str
    dc_weight: float
    eta: float
    cfg_mode: str = "const"
    cfg_center: float = 0.70
    cfg_width: float = 0.12

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def prep_samples(
    h5_path: str,
    indices: Sequence[int],
    ck: dict,
    ckpt_path: str,
    whiten: bool,
    whiten_mode: str,
    sigma_mode: str,
    sigma_fixed: float = 1.0,
) -> List[dict]:
    """Prepare each requested sample once (whiten/sigma/cond stack)."""
    meta_scale = ck.get("meta_scale", {}) or {}
    preps = []
    for idx in indices:
        y, clean, fs, P_model, welch, meta = hdf5io.load_measurement(
            h5_path, int(idx))
        p = prepare_measurement(
            y, clean, fs, P_model, welch, meta,
            cond_in_ch=int(ck.get("cond_in_ch", 1)),
            M_SCALE=float(meta_scale.get("M", 80.0)),
            Q_SCALE=float(meta_scale.get("q", 10.0)),
            whiten=whiten, whiten_mode=whiten_mode,
            sigma_mode=sigma_mode, sigma_fixed=sigma_fixed,
            ckpt_path=ckpt_path)
        p["index"] = int(idx)
        preps.append(p)
    return preps


def _sampler_config(combo: Combo, steps: int, schedule, ck: dict,
                    use_selfcond: bool,
                    start_t_override: int | None = None,
                    ladder: str = "t",
                    refine: tuple = (0, 300, 0)) -> SamplerConfig:
    """Sampler config for one combo, inheriting checkpoint-domain knobs.

    ``pred_type`` MUST come from the checkpoint (same contract as gw-infer):
    decoding a v-prediction model with eps algebra silently corrupts every
    sweep/grid metric.  ``start_t_override`` (e.g. gw-grid ``--start-t``)
    wins over the SNR-derived start.
    """
    if start_t_override is not None:
        start_t = int(np.clip(start_t_override, 1, schedule.T - 1))
    else:
        start_t = t_for_target_snr(schedule, combo.start_snr)
        start_t = int(np.clip(round(start_t / START_T_QUANT) * START_T_QUANT,
                              START_T_QUANT, schedule.T - 1))
    return SamplerConfig(
        steps=steps, eta=combo.eta, start_t=start_t,
        init_mode=combo.init_mode, dc_weight=combo.dc_weight,
        cfg_scale=combo.cfg_scale, cfg_mode=combo.cfg_mode,
        cfg_center=combo.cfg_center, cfg_width=combo.cfg_width,
        use_selfcond=use_selfcond,
        pred_type=str(ck.get("pred_type", "eps")),
        drop_y_only=bool(ck.get("dropout_y_only", True)),
        # distilled students never saw a non-zero self-cond channel
        # (training/distill.py records selfcond_mode='zero')
        selfcond_mode=str(ck.get("selfcond_mode", "update")),
        ladder=ladder,
        refine_passes=int(refine[0]), refine_t=int(refine[1]),
        refine_steps=int(refine[2]))



def refine_from_args(args) -> tuple:
    """(refine_passes, refine_t, refine_steps) from CLI args (0,300,0 = off)."""
    return (int(getattr(args, "refine_passes", 0) or 0),
            int(getattr(args, "refine_t", 300) or 300),
            int(getattr(args, "refine_steps", 0) or 0))

def eval_combo(
    model, params, schedule, ck: dict,
    preps: List[dict],
    combo: Combo,
    steps: int,
    key: jax.Array,
    sampler: str = "ddim",
    ladder: str = "t",
    start_t_override: int | None = None,
    refine: tuple = (0, 300, 0),
) -> dict:
    """Evaluate one combo on all prepared samples (batched per length group).

    Returns {J, J_mean/std per-sample metrics list, combo dict}.
    """
    use_selfcond = int(ck.get("in_ch", 3)) == (1 + int(ck.get("cond_in_ch", 1)) + 1)
    cfg = _sampler_config(combo, steps, schedule, ck, use_selfcond,
                          ladder=ladder, start_t_override=start_t_override,
                          refine=refine)

    by_len: Dict[int, List[int]] = {}
    for i, p in enumerate(preps):
        by_len.setdefault(p["L"], []).append(i)

    per_sample = [None] * len(preps)
    for L, idxs in sorted(by_len.items()):
        conds = np.concatenate([preps[i]["cond_stack"] for i in idxs], axis=0)
        sigmas = np.array([preps[i]["sigma"] for i in idxs], np.float32)
        cleans = [preps[i]["clean_norm"] for i in idxs]
        cn = (np.concatenate(cleans, axis=0)
              if all(c is not None for c in cleans) else None)
        key, k = jax.random.split(key)
        x0_white = reconstruct_batch(model, params, schedule, conds, sigmas,
                                     cfg, k, clean_norms=cn, sampler=sampler)
        for j, i in enumerate(idxs):
            p = preps[i]
            from ..inference import dewhiten_back
            x0_raw = dewhiten_back(x0_white[j].astype(np.float64), p)
            m_strain = m_white = None
            if p["clean_raw"] is not None:
                m_strain = M.score_last_window(x0_raw, p["clean_raw"], p["fs"])
                a_al, b_al, t_al = M.align_xcorr(p["clean_raw"], x0_raw,
                                                 1.0 / p["fs"],
                                                 int(0.02 * p["fs"]))
                m_strain.update(M.merger_window_scores(b_al, a_al, t_al,
                                                       p["sigma"]))
            if p["clean_for_cond"] is not None:
                m_white = M.score_last_window(x0_white[j], p["clean_for_cond"],
                                              p["fs"])
            per_sample[i] = {
                "index": p["index"],
                "J": M.sweep_objective(m_strain, m_white),
                "strain": m_strain, "white": m_white,
            }

    Js = [s["J"] for s in per_sample if s is not None]
    return {
        "combo": combo.to_dict(),
        "steps": steps,
        "start_t": cfg.start_t,
        "J": float(np.mean(Js)) if Js else float("nan"),
        "J_std": float(np.std(Js)) if Js else float("nan"),
        "per_sample": per_sample,
    }


def sample_combo(rng: np.random.Generator, args) -> Combo:
    """Random-mode combo draw; start_snr is log-uniform
    (ref ``sweep_infer.py:295``)."""
    lo, hi = np.log(args.start_snr_min), np.log(args.start_snr_max)
    return Combo(
        start_snr=float(np.exp(rng.uniform(lo, hi))),
        cfg_scale=float(rng.uniform(args.cfg_min, args.cfg_max)),
        init_mode=str(rng.choice(args.init_choices)),
        dc_weight=float(rng.choice(args.dc_choices)),
        eta=float(rng.choice(args.eta_choices)),
        cfg_mode=args.cfg_mode,
        cfg_center=float(rng.uniform(args.cfg_center_min, args.cfg_center_max)),
        cfg_width=float(rng.uniform(args.cfg_width_min, args.cfg_width_max)),
    )


def best_cmd(args, combo: dict, steps: int,
             start_t_override: int | None = None) -> str:
    """Replayable gw-infer command line (ref ``sweep_infer.py:265-283``)."""
    start = (f"--start-t {int(start_t_override)}"
             if start_t_override is not None
             else f"--start-snr {combo['start_snr']:.4g}")
    return (
        f"gw-infer --input-h5 {args.input_h5} --index {args.indices[0]} "
        f"--model {args.model} --outdir {args.outdir}/best "
        f"--steps {steps} --eta {combo['eta']} "
        f"{start} "
        f"--init-mode {combo['init_mode']} --cfg-scale {combo['cfg_scale']:.4g} "
        f"--cfg-mode {combo['cfg_mode']} --cfg-center {combo['cfg_center']:.4g} "
        f"--cfg-width {combo['cfg_width']:.4g} --dc-weight {combo['dc_weight']:.4g} "
        f"--whiten {int(args.whiten)} --whiten-mode {args.whiten_mode} "
        f"--sigma-mode {args.sigma_mode}"
        + (f" --sampler {args.sampler}"
           if getattr(args, "sampler", "ddim") != "ddim" else "")
        + (f" --ladder {args.ladder}" if getattr(args, "ladder", None) else "")
        + (f" --refine-passes {refine_from_args(args)[0]}"
           f" --refine-t {refine_from_args(args)[1]}"
           f" --refine-steps {refine_from_args(args)[2]}"
           if refine_from_args(args)[0] > 0 else "")
    )


def resolve_ladder(args) -> str:
    """Single source of truth for the ladder default: dpmpp REQUIRES the
    λ-uniform ladder (``ops/sampling.py`` docs), everything else defaults to
    the t-uniform ladder.  Every sweep/grid stage must resolve through here
    so no stage silently evaluates with a different ladder."""
    return (getattr(args, "ladder", None)
            or ("lambda" if getattr(args, "sampler", "ddim") == "dpmpp"
                else "t"))


def default_combo() -> Combo:
    """Reference-default sampler knobs (ref ``inference.py:529-571``):
    cfg 1.5 const, eta 0, init from pure noise, no data consistency,
    full-range start (start_t = T-1, applied via start_t_override)."""
    return Combo(start_snr=0.0, cfg_scale=1.5, init_mode="noise",
                 dc_weight=0.0, eta=0.0, cfg_mode="const")


def validate_top(args, model, params, schedule, ck, top: dict, steps: int,
                 key: jax.Array) -> dict:
    """Held-out validation gate for the selected knobs (VERDICT r2 item 4).

    Few-sample sweeps overfit: round-2 measured a 4-sample J=0.943 combo
    scoring corr_macro 0.539 on the full held-out grid — WORSE than
    reference-default knobs (0.73).  Before emitting ``best_cmd.txt``, score
    the winning combo AND the reference-default knobs on ``--val-samples``
    held-out samples (disjoint from the sweep indices); ship whichever wins.

    Returns {enabled, emit_top, J_val_top, J_val_default, val_indices}.
    """
    n_val = int(getattr(args, "val_samples", 0) or 0)
    if n_val <= 0:
        return {"enabled": False, "emit_top": True}

    val_indices = getattr(args, "val_indices", None)
    if not val_indices:
        import h5py
        with h5py.File(args.input_h5, "r") as f:
            n_total = int(f["noisy"].shape[0])
        excluded = set(int(i) for i in args.indices)
        val_indices = [i for i in range(n_total) if i not in excluded][:n_val]
    if not val_indices:
        print("[sweep] validation gate skipped: no held-out samples")
        return {"enabled": False, "emit_top": True}

    preps_val = prep_samples(args.input_h5, val_indices, ck, args.model,
                             bool(args.whiten), args.whiten_mode,
                             args.sigma_mode, args.sigma_fixed)
    sampler = getattr(args, "sampler", "ddim")
    ladder = resolve_ladder(args)
    key, k1, k2 = jax.random.split(key, 3)
    r_top = eval_combo(model, params, schedule, ck, preps_val,
                       Combo(**top["combo"]), steps, k1,
                       sampler=sampler, ladder=ladder,
                       refine=refine_from_args(args))
    r_def = eval_combo(model, params, schedule, ck, preps_val,
                       default_combo(), steps, k2,
                       sampler=sampler, ladder=ladder,
                       start_t_override=schedule.T - 1,
                       refine=refine_from_args(args))
    emit = bool(r_top["J"] >= r_def["J"])
    print(f"[sweep] validation ({len(val_indices)} held-out samples): "
          f"J_top={r_top['J']:.4f} vs J_default={r_def['J']:.4f} -> "
          f"{'top knobs' if emit else 'DEFAULT knobs (top failed to beat '
            'defaults out of sample)'}")
    return {"enabled": True, "emit_top": emit,
            "J_val_top": r_top["J"], "J_val_default": r_def["J"],
            # the knobs the gate actually shipped when it rejected top —
            # downstream --from-sweep parsers must honour the decision
            "default_combo": default_combo().to_dict(),
            "default_start_t": int(schedule.T - 1),
            "val_indices": [int(i) for i in val_indices]}


def _emit_best_cmd(args, model, params, schedule, ck, top, steps, key):
    """Validation-gated best_cmd.txt emission shared by grid/random modes."""
    val = validate_top(args, model, params, schedule, ck, top, steps, key)
    if val.get("enabled"):
        _dump(args.outdir, "validation.json", val)
    with open(os.path.join(args.outdir, "best_cmd.txt"), "w") as fh:
        if val.get("emit_top", True):
            fh.write(best_cmd(args, top["combo"], steps) + "\n")
        else:
            fh.write(best_cmd(args, default_combo().to_dict(), steps,
                              start_t_override=schedule.T - 1) + "\n")
    return val


def run_grid(args, model, params, schedule, ck, preps, key) -> dict:
    """Exhaustive product sweep (ref ``sweep_infer.py:246-287``).

    Grid mode evaluates at ``--grid-steps`` (its own step count, ref
    ``sweep_infer.py:132``) — which is also what ``best_cmd.txt`` replays,
    so the selected knobs were validated at the step count they ship with.
    """
    results = []
    combos = [
        Combo(start_snr=s, cfg_scale=c, init_mode=i, dc_weight=d, eta=e,
              cfg_mode=args.cfg_mode)
        for s, c, i, d, e in itertools.product(
            args.grid_snr, args.grid_cfg, args.grid_init, args.grid_dc,
            args.grid_eta)
    ]
    grid_steps = int(getattr(args, "grid_steps", None) or args.steps_coarse)
    print(f"[sweep] grid: {len(combos)} combos x {len(preps)} samples "
          f"@ {grid_steps} steps")
    for n, combo in enumerate(combos):
        key, k = jax.random.split(key)
        r = eval_combo(model, params, schedule, ck, preps, combo,
                       grid_steps, k, sampler=getattr(args, "sampler", "ddim"),
                       ladder=resolve_ladder(args),
                       refine=refine_from_args(args))
        results.append(r)
        print(f"[sweep] {n + 1}/{len(combos)} J={r['J']:.4f}  {combo.to_dict()}")

    results.sort(key=lambda r: -r["J"])
    # record the sampler/ladder the combos were SCORED under, so
    # --from-sweep replays don't silently switch algorithms
    for r in results:
        r["sampler"] = getattr(args, "sampler", "ddim")
        r["ladder"] = resolve_ladder(args)
    _dump(args.outdir, "grid_results.json", results)
    top = results[0]
    key, k_val = jax.random.split(key)
    top["validation"] = _emit_best_cmd(args, model, params, schedule, ck,
                                       top, grid_steps, k_val)
    return top


def run_random(args, model, params, schedule, ck, preps, key) -> dict:
    """Coarse random search -> top-k refinement (ref
    ``sweep_infer.py:289-326``)."""
    rng = np.random.default_rng(args.seed)
    coarse = []
    print(f"[sweep] coarse: {args.n_coarse} draws @ {args.steps_coarse} steps")
    for n in range(args.n_coarse):
        combo = sample_combo(rng, args)
        key, k = jax.random.split(key)
        r = eval_combo(model, params, schedule, ck, preps, combo,
                       args.steps_coarse, k,
                       sampler=getattr(args, "sampler", "ddim"),
                       ladder=resolve_ladder(args),
                       refine=refine_from_args(args))
        coarse.append(r)
        print(f"[sweep] coarse {n + 1}/{args.n_coarse} J={r['J']:.4f}")

    coarse.sort(key=lambda r: -r["J"])
    top_k = coarse[: args.topk]
    _dump(args.outdir, "coarse_top.json", top_k)

    finals = []
    print(f"[sweep] refine: top-{len(top_k)} x {args.seeds_refine} seeds "
          f"@ {args.steps_refine} steps")
    for r in top_k:
        combo = Combo(**r["combo"])
        Js = []
        for s in range(args.seeds_refine):
            key, k = jax.random.split(key)
            rr = eval_combo(model, params, schedule, ck, preps, combo,
                            args.steps_refine, k,
                            sampler=getattr(args, "sampler", "ddim"),
                            ladder=resolve_ladder(args),
                            refine=refine_from_args(args))
            Js.append(rr["J"])
        finals.append({"combo": combo.to_dict(),
                       "J": float(np.mean(Js)),
                       "J_std": float(np.std(Js)),
                       "J_seeds": Js,
                       "steps": args.steps_refine})
        print(f"[sweep] refined J={finals[-1]['J']:.4f} "
              f"(+-{finals[-1]['J_std']:.4f}) {combo.to_dict()}")

    finals.sort(key=lambda r: -r["J"])
    for r in finals:
        r["sampler"] = getattr(args, "sampler", "ddim")
        r["ladder"] = resolve_ladder(args)
    top = finals[0]
    # persist refine results BEFORE the validation gate: the gate runs extra
    # reconstructions, and an error there must not lose the whole sweep
    _dump(args.outdir, "final_results.json", finals)
    key, k_val = jax.random.split(key)
    top["validation"] = _emit_best_cmd(args, model, params, schedule, ck,
                                       top, args.steps_refine, k_val)
    _dump(args.outdir, "final_results.json", finals)
    return top


def _dump(outdir: str, name: str, obj) -> None:
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, name), "w") as fh:
        json.dump(obj, fh, indent=2, default=float)
