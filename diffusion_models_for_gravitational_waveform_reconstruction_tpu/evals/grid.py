"""Mass-grid heatmap evaluator.

Reference parity (``/root/reference/src/snr_denoising/grid_infer.py``):
- discrete (m1, m2) axes from the unique dataset masses with midpoint bin
  edges (``grid_infer.py:174-201``, ``355-365``);
- per-cell random sample selection ``--per-cell`` (``grid_infer.py:434-448``);
- sampler knobs parsed from sweep artifacts (``best_cmd.txt`` /
  ``final_results.json``) with CLI overrides (``grid_infer.py:128-170``);
- scoring windows full/tail/merger and alignment none/peak/xcorr
  (``grid_infer.py:22-49``), MAE normalisations by sigma / clean
  (``grid_infer.py:415-418``);
- pandas aggregation to ``per_index_metrics.csv`` / ``metrics_grid.csv`` /
  ``metrics_grid.json`` (``grid_infer.py:453-477``), annotated heatmap PNGs
  (``grid_infer.py:492-559``) and ``summary.json`` macro stats
  (``grid_infer.py:561-578``).

TPU-first: all selected samples are reconstructed in BATCHES (one jitted
scan per length group) rather than the reference's serial per-index loop
(``grid_infer.py:372-448``).
"""
from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Tuple

import jax
import numpy as np

from ..inference import dewhiten_back, reconstruct_batch
from . import metrics as M
from .sweep import Combo, _sampler_config, refine_from_args, resolve_ladder


# ---------------------------------------------------------------------------
# Sweep artifact parsing (ref grid_infer.py:128-170)
# ---------------------------------------------------------------------------

def parse_sweep_best(sweep_dir: str) -> dict:
    """Read sampler knobs from a sweep output directory.

    Prefers ``final_results.json`` (top entry), falls back to parsing the
    flags inside ``best_cmd.txt``.
    """
    fr = os.path.join(sweep_dir, "final_results.json")
    gr = os.path.join(sweep_dir, "grid_results.json")
    for path in (fr, gr):
        if os.path.exists(path):
            with open(path) as fh:
                data = json.load(fh)
            if data:
                out = dict(data[0]["combo"])
                out["steps"] = int(data[0].get("steps", 200))
                # carry the sampler/ladder the combo was scored under
                for k in ("sampler", "ladder"):
                    if data[0].get(k):
                        out[k] = data[0][k]
                # honour the validation gate: if it rejected the top combo
                # (best_cmd.txt shipped defaults), replay the defaults here
                # too instead of silently undoing the gate's decision
                val = data[0].get("validation") or {}
                if val.get("enabled") and not val.get("emit_top", True):
                    out.update(val.get("default_combo") or {})
                    if val.get("default_start_t") is not None:
                        out["start_t"] = int(val["default_start_t"])
                    print("[grid] sweep validation gate rejected the top "
                          "combo; using reference-default knobs "
                          "(as best_cmd.txt does)")
                return out
    bc = os.path.join(sweep_dir, "best_cmd.txt")
    if os.path.exists(bc):
        with open(bc) as fh:
            cmd = fh.read()
        out = {}
        for flag, key, cast in [
            ("--steps", "steps", int), ("--eta", "eta", float),
            ("--start-snr", "start_snr", float),
            ("--init-mode", "init_mode", str),
            ("--cfg-scale", "cfg_scale", float),
            ("--cfg-mode", "cfg_mode", str),
            ("--cfg-center", "cfg_center", float),
            ("--cfg-width", "cfg_width", float),
            ("--dc-weight", "dc_weight", float),
            ("--sampler", "sampler", str),
            ("--ladder", "ladder", str),
            ("--start-t", "start_t", int),
        ]:
            m = re.search(rf"{flag}\s+(\S+)", cmd)
            if m:
                out[key] = cast(m.group(1))
        return out
    raise FileNotFoundError(f"no sweep artifacts under {sweep_dir}")


# ---------------------------------------------------------------------------
# Axes / binning (ref grid_infer.py:174-201)
# ---------------------------------------------------------------------------

def midpoint_edges_from_values(vals: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Unique sorted values -> (centers, midpoint bin edges)."""
    centers = np.unique(np.round(np.asarray(vals, np.float64), 6))
    if len(centers) == 1:
        c = centers[0]
        return centers, np.array([c - 0.5, c + 0.5])
    mids = 0.5 * (centers[1:] + centers[:-1])
    first = centers[0] - (mids[0] - centers[0])
    last = centers[-1] + (centers[-1] - mids[-1])
    return centers, np.concatenate([[first], mids, [last]])


def select_per_cell(
    m1: np.ndarray, m2: np.ndarray, per_cell: int, min_per_cell: int,
    rng: np.random.Generator, unordered: bool = False,
) -> Dict[Tuple[float, float], np.ndarray]:
    """{(m1_center, m2_center): indices} with per-cell subsampling."""
    key1 = np.round(m1, 6)
    key2 = np.round(m2, 6)
    if unordered:
        hi = np.maximum(key1, key2)
        lo = np.minimum(key1, key2)
        key1, key2 = hi, lo
    cells: Dict[Tuple[float, float], list] = {}
    for i in range(len(key1)):
        cells.setdefault((float(key1[i]), float(key2[i])), []).append(i)
    out = {}
    for cell, idxs in cells.items():
        if len(idxs) < min_per_cell:
            continue
        idxs = np.asarray(idxs)
        if per_cell > 0 and len(idxs) > per_cell:
            idxs = rng.choice(idxs, size=per_cell, replace=False)
        out[cell] = np.sort(idxs)
    return out


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

def eval_indices(
    args, model, params, schedule, ck, preps: List[dict], key: jax.Array,
) -> List[dict]:
    """Reconstruct + score all prepared samples, batched per length group."""
    combo = Combo(
        start_snr=args.start_snr, cfg_scale=args.cfg_scale,
        init_mode=args.init_mode, dc_weight=args.dc_weight, eta=args.eta,
        cfg_mode=args.cfg_mode, cfg_center=args.cfg_center,
        cfg_width=args.cfg_width)
    use_selfcond = int(ck.get("in_ch", 3)) == (1 + int(ck.get("cond_in_ch", 1)) + 1)
    cfg = _sampler_config(combo, args.steps, schedule, ck, use_selfcond,
                          start_t_override=getattr(args, "start_t", None),
                          ladder=resolve_ladder(args),
                          refine=refine_from_args(args))
    # Stash the RESOLVED start_t for summary.json (its omission from the
    # recorded knobs made a start-t mismatch between two otherwise-identical
    # eval runs invisible — r3 debugging cost).
    args._start_t_resolved = int(cfg.start_t)
    if args.init_mode == "noise" and cfg.start_t < int(0.8 * schedule.T):
        import sys
        print(f"[grid] WARNING: init_mode=noise with resolved start_t="
              f"{int(cfg.start_t)} < 0.8*T = {int(0.8 * schedule.T)}: pure-noise "
              f"init "
              f"below the top of the chain is a domain mismatch and yields "
              f"near-zero correlation; pass --start-t {schedule.T - 1} "
              f"(or an --init-mode that uses y)", file=sys.stderr)

    by_len: Dict[int, List[int]] = {}
    for i, p in enumerate(preps):
        by_len.setdefault(p["L"], []).append(i)

    rows = []
    avg_seeds = int(getattr(args, "avg_seeds", 1))
    eff_seeds = max(1, avg_seeds)
    use_attn = bool(ck.get("use_attention", False))
    for L, idxs in sorted(by_len.items()):
        # HBM-aware chunking (round-5b): seeds multiply the scan batch
        # (S*B samples in ONE jitted scan), so an unchunked same-length
        # batch at 16 kHz is fatal — bottleneck-attention scores scale as
        # S*B*heads*(L/8)^2 (76 samples x 4 seeds at L=32768 would need
        # O(100 GB) of a 16 GB chip); conv activations scale as S*B*L.
        # Cap the per-scan work accordingly and pad the LAST chunk up to
        # the chunk size so every chunk reuses one compiled program per L
        # (16 kHz compiles cost minutes).  The budgets keep every
        # previously-working 4 kHz workload in a single unchanged batch.
        cap_override = getattr(args, "eval_scan_cap", None)
        if cap_override:
            cap = max(1, int(cap_override))
        elif use_attn:
            cap = max(1, int(2.4e10) // (eff_seeds * L * L))
        else:
            cap = max(1, (1 << 24) // (eff_seeds * L))
        chunk = min(len(idxs), cap)
        x0_parts, std_parts = [], []
        for c0 in range(0, len(idxs), chunk):
            sub = idxs[c0:c0 + chunk]
            pad = chunk - len(sub)
            conds = np.concatenate(
                [preps[i]["cond_stack"] for i in sub], axis=0)
            sigmas = np.array([preps[i]["sigma"] for i in sub], np.float32)
            cleans = [preps[i]["clean_norm"] for i in sub]
            cn = (np.concatenate(cleans, axis=0)
                  if all(c is not None for c in cleans) else None)
            if pad:
                conds = np.concatenate(
                    [conds, np.zeros((pad,) + conds.shape[1:], conds.dtype)],
                    axis=0)
                sigmas = np.concatenate(
                    [sigmas, np.ones((pad,), np.float32)])
                if cn is not None:
                    cn = np.concatenate(
                        [cn, np.zeros((pad,) + cn.shape[1:], cn.dtype)],
                        axis=0)
            key, k = jax.random.split(key)
            out = reconstruct_batch(model, params, schedule, conds, sigmas,
                                    cfg, k, clean_norms=cn,
                                    sampler=getattr(args, "sampler", "ddim"),
                                    avg_seeds=avg_seeds,
                                    avg_mode=getattr(args, "avg_mode",
                                                     "mean"),
                                    amp_calib=getattr(args, "amp_calib",
                                                      "none"),
                                    extra_models=getattr(
                                        args, "_extra_models", None),
                                    return_seed_std=avg_seeds > 1)
            xw, sw = out if avg_seeds > 1 else (out, None)
            x0_parts.append(np.asarray(xw)[:len(sub)])
            if sw is not None:
                std_parts.append(np.asarray(sw)[:len(sub)])
        x0_white = np.concatenate(x0_parts, axis=0)
        std_white = (np.concatenate(std_parts, axis=0)
                     if std_parts else None)
        for j, i in enumerate(idxs):
            p = preps[i]
            x0_raw = dewhiten_back(x0_white[j].astype(np.float64), p)
            clean = p["clean_raw"]
            if clean is None:
                continue
            a_al, b_al = M.apply_alignment(clean, x0_raw, p["fs"], args.align,
                                           args.align_max_shift_s)
            lo, hi = M.window_indices(args.win, a_al, p["fs"], args.tail_secs,
                                      args.left, args.right)
            c_w = a_al[lo:hi]
            r_w = b_al[lo:hi]
            mae = float(np.mean(np.abs(r_w - c_w)))
            # zero-GUARDED denominator, no absolute eps: physical-strain
            # scales (|clean| ~1e-22, sigma down to ~1e-22) are far below
            # any absolute eps, which would reduce NMAE to a constant
            # rescale of MAE (CLAUDE.md numerical-scale rule)
            denom = (float(np.mean(np.abs(c_w)))
                     if args.mae_norm == "clean" else float(p["sigma"]))
            row = {
                "index": p["index"],
                "corr": M.corr(r_w, c_w),
                "mae": mae,
                "mae_norm": mae / denom if denom > 0 else float("nan"),
                "sigma": p["sigma"],
                "L": p["L"],
            }
            if std_white is not None:
                # relative seed-ensemble scatter: RMS of the per-seed std
                # over the whitened recon's RMS — dimensionless, invariant
                # to the MF amplitude calibration applied to the aggregate
                num = float(np.sqrt(np.mean(std_white[j] ** 2)))
                den = float(np.sqrt(np.mean(x0_white[j] ** 2)))
                row["unc_rel"] = num / den if den > 0 else float("nan")
            if p.get("P_model_used") is not None:
                P = np.asarray(p["P_model_used"], np.float64)
                rho_r = M.matched_filter_snr(x0_raw, clean, P, p["fs"])
                rho_i = M.matched_filter_snr(clean, clean, P, p["fs"])
                row["mf_ratio"] = rho_r / rho_i if rho_i > 0 else float("nan")
            # residual-whiteness diagnostics (whitened domain; deployable
            # without clean — see metrics.residual_diagnostics)
            band = None
            if p.get("P_model_used") is not None:
                Pm = np.asarray(p["P_model_used"], np.float64)
                if len(Pm) == p["L"] // 2 + 1:
                    band = Pm > 0
            row.update(M.residual_diagnostics(
                p["y_for_cond"], x0_white[j],
                clean_white=p["clean_for_cond"], band_mask=band))
            rows.append(row)
    return rows


# ---------------------------------------------------------------------------
# Aggregation + plots
# ---------------------------------------------------------------------------

def aggregate_and_plot(args, rows: List[dict], labels: Dict[int, dict]) -> dict:
    import pandas as pd

    os.makedirs(args.outdir, exist_ok=True)
    df = pd.DataFrame(rows)
    df["m1"] = [labels[i]["m1"] for i in df["index"]]
    df["m2"] = [labels[i]["m2"] for i in df["index"]]
    has_snr = all("snr" in labels[i] for i in df["index"])
    if has_snr:
        df["snr"] = [labels[i]["snr"] for i in df["index"]]
    df.to_csv(os.path.join(args.outdir, "per_index_metrics.csv"), index=False)

    agg_cols = dict(
        corr_mean=("corr", "mean"), corr_std=("corr", "std"),
        mae_mean=("mae_norm", "mean"), mae_std=("mae_norm", "std"),
        n=("index", "count"))
    if "mf_ratio" in df.columns:
        agg_cols["mf_ratio_mean"] = ("mf_ratio", "mean")
    if "unc_rel" in df.columns:
        agg_cols["unc_rel_mean"] = ("unc_rel", "mean")
    agg = df.groupby(["m1", "m2"]).agg(**agg_cols).reset_index()
    agg.to_csv(os.path.join(args.outdir, "metrics_grid.csv"), index=False)
    agg.to_json(os.path.join(args.outdir, "metrics_grid.json"),
                orient="records", indent=2)

    c1, e1 = midpoint_edges_from_values(agg["m1"].values)
    c2, e2 = midpoint_edges_from_values(agg["m2"].values)
    grid_corr = np.full((len(c2), len(c1)), np.nan)
    grid_mae = np.full((len(c2), len(c1)), np.nan)
    for _, row in agg.iterrows():
        i1 = int(np.argmin(np.abs(c1 - row["m1"])))
        i2 = int(np.argmin(np.abs(c2 - row["m2"])))
        grid_corr[i2, i1] = row["corr_mean"]
        grid_mae[i2, i1] = row["mae_mean"]

    plot_heat(args, grid_corr, c1, c2, e1, e2, args.title_corr, "corr",
              os.path.join(args.outdir, "heat_corr.png"))
    plot_heat(args, grid_mae, c1, c2, e1, e2, args.title_mae, "mae",
              os.path.join(args.outdir, "heat_mae.png"))

    summary = {
        "n_rows": int(len(df)),
        "n_cells": int(len(agg)),
        "corr_macro_mean": float(agg["corr_mean"].mean()),
        "corr_macro_median": float(agg["corr_mean"].median()),
        "corr_micro_mean": float(df["corr"].mean()),
        "mae_macro_mean": float(agg["mae_mean"].mean()),
        "mae_macro_median": float(agg["mae_mean"].median()),
        "mae_micro_mean": float(df["mae_norm"].mean()),
        **({"mf_ratio_macro_mean": float(agg["mf_ratio_mean"].mean())}
           if "mf_ratio_mean" in agg.columns else {}),
        "knobs": {k: getattr(args, k, None) for k in
                  ["steps", "eta", "start_snr", "start_t", "init_mode",
                   "cfg_scale", "cfg_mode", "cfg_center", "cfg_width",
                   "dc_weight", "win", "align", "mae_norm", "amp_calib",
                   "avg_seeds", "avg_mode", "sampler", "ladder", "seed",
                   "refine_passes", "refine_t", "refine_steps"]},
        "start_t_resolved": getattr(args, "_start_t_resolved", None),
        # eval whitening domain actually used (VERDICT r3: a silent domain
        # fallback must be visible in every artifact)
        "whiten": bool(getattr(args, "whiten", False)),
        "whiten_mode": getattr(args, "whiten_mode", None),
        "whiten_kind_used": getattr(args, "_whiten_kind_used", None),
        "sigma_mode": getattr(args, "sigma_mode", None),
    }
    res_cols = [c for c in ("res_std_ratio", "res_clean_corr",
                            "res_flatness") if c in df.columns]
    if res_cols:
        # residual-whiteness block (extension): 1.0 / 0.0 / 1.0 = perfect
        summary["residuals"] = {
            c: {"mean": float(df[c].mean(skipna=True)),
                "median": float(df[c].median(skipna=True))}
            for c in res_cols if df[c].notna().any()
        }
    if "unc_rel" in df.columns and df["unc_rel"].notna().sum() >= 3:
        # Uncertainty calibration (extension; no reference counterpart):
        # does the seed-ensemble scatter PREDICT the actual error?  Rank
        # correlation between unc_rel and (1 - corr) across evaluated rows;
        # computed here (not scipy) to stay dependency-light.
        sel = df[df["unc_rel"].notna() & df["corr"].notna()]
        u = sel["unc_rel"].values.astype(np.float64)
        e = 1.0 - sel["corr"].values.astype(np.float64)

        def _pearson(a, b):
            a = a - a.mean()
            b = b - b.mean()
            d = np.sqrt((a * a).sum() * (b * b).sum())
            return float((a * b).sum() / d) if d > 0 else float("nan")

        def _rank(a):
            r = np.empty(len(a))
            r[np.argsort(a, kind="stable")] = np.arange(len(a))
            return r

        summary["uncertainty"] = {
            "n": int(len(sel)),
            "unc_rel_mean": float(u.mean()),
            "unc_rel_median": float(np.median(u)),
            "pearson_unc_vs_err": _pearson(u, e),
            "spearman_unc_vs_err": _pearson(_rank(u), _rank(e)),
        }
    if has_snr and df["snr"].nunique() >= 3:
        # SNR-stratified breakdown (extension; no reference counterpart —
        # grid_infer.py aggregates by mass cell only).  Motivation: measured
        # residual error is dominated by the low-SNR tail (corr vs injected
        # SNR r≈0.7 at equal train/eval SNR distributions, RESULTS.md
        # "Error anatomy"), which mass-cell macro averages hide.  Terciles
        # of the evaluated rows keep bins populated for any eval set.
        edges = np.quantile(df["snr"].values, [0.0, 1 / 3, 2 / 3, 1.0])
        bins = np.clip(np.searchsorted(edges[1:-1], df["snr"].values,
                                       side="right"), 0, 2)
        by_snr = []
        for b in range(3):
            sel = df[bins == b]
            if len(sel) == 0:
                continue
            ent = {
                "snr_lo": float(edges[b]), "snr_hi": float(edges[b + 1]),
                "n": int(len(sel)),
                "corr_mean": float(sel["corr"].mean()),
                "mae_norm_mean": float(sel["mae_norm"].mean()),
            }
            if "mf_ratio" in sel.columns:
                ent["mf_ratio_mean"] = float(sel["mf_ratio"].mean())
            by_snr.append(ent)
        summary["by_snr"] = by_snr
    with open(os.path.join(args.outdir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    return summary


def plot_heat(args, grid: np.ndarray, c1, c2, e1, e2, title: str, kind: str,
              path: str) -> None:
    """Annotated heatmap with tick thinning + optional gridlines
    (ref ``grid_infer.py:492-559``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6.5))
    cmap = "viridis" if kind == "corr" else "magma_r"
    pm = ax.pcolormesh(e1, e2, grid, cmap=cmap, shading="flat")
    fig.colorbar(pm, ax=ax)
    ax.set_xlabel(args.xlabel)
    ax.set_ylabel(args.ylabel)
    ax.set_title(title)

    def thin(centers, max_ticks):
        if len(centers) <= max_ticks:
            return centers
        stride = int(np.ceil(len(centers) / max_ticks))
        return centers[::stride]

    ax.set_xticks(thin(c1, args.max_ticks_x))
    ax.set_yticks(thin(c2, args.max_ticks_y))
    ax.set_xticklabels([args.tick_fmt % v for v in thin(c1, args.max_ticks_x)])
    ax.set_yticklabels([args.tick_fmt % v for v in thin(c2, args.max_ticks_y)])

    if args.gridlines:
        for e in e1:
            ax.axvline(e, color="w", alpha=args.gridline_alpha,
                       lw=args.gridline_width)
        for e in e2:
            ax.axhline(e, color="w", alpha=args.gridline_alpha,
                       lw=args.gridline_width)

    if args.annot and grid.size <= 400:
        for i2 in range(len(c2)):
            for i1 in range(len(c1)):
                v = grid[i2, i1]
                if np.isfinite(v):
                    ax.text(c1[i1], c2[i2],
                            args.annot_fmt % (v / args.annot_div),
                            ha="center", va="center", fontsize=7, color="w")
    fig.savefig(path, dpi=130)
    plt.close(fig)
