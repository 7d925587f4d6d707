"""Consolidate every grid/sweep/bench artifact under runs/ into one table.

Usage: python tools/collect_results.py [--root runs] [--markdown]

Walks for ``summary.json`` (gw-grid), ``validation.json`` + ``best_cmd.txt``
(gw-sweep), ``bench_*.json`` (serving bench) and prints one line per
artifact: corr/mf/by-SNR for grids, gate verdicts for sweeps, throughput for
benches.  ``--markdown`` emits a RESULTS.md-ready table.
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def fmt(v, nd=4):
    return f"{v:.{nd}f}" if isinstance(v, (int, float)) else "-"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="runs")
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args(argv)

    rows = []
    for p in sorted(glob.glob(os.path.join(args.root, "**", "summary.json"),
                              recursive=True)):
        with open(p) as fh:
            s = json.load(fh)
        by = s.get("by_snr") or []
        rows.append({
            "artifact": os.path.relpath(os.path.dirname(p), args.root),
            "kind": "grid",
            "corr_macro": s.get("corr_macro_mean"),
            "mf_ratio": s.get("mf_ratio_macro_mean"),
            "by_snr": "/".join(f"{b['corr_mean']:.3f}" for b in by) or "-",
            "domain": s.get("whiten_kind_used"),
            "knobs": (f"s{s.get('knobs', {}).get('steps')}"
                      f" {s.get('knobs', {}).get('ladder')}"
                      f" avg{s.get('knobs', {}).get('avg_seeds')}"
                      f" t{s.get('start_t_resolved')}"),
        })
    for p in sorted(glob.glob(os.path.join(args.root, "**", "validation.json"),
                              recursive=True)):
        with open(p) as fh:
            v = json.load(fh)
        rows.append({
            "artifact": os.path.relpath(os.path.dirname(p), args.root),
            "kind": "sweep-gate",
            "corr_macro": v.get("candidate_score", v.get("candidate_J")),
            "mf_ratio": v.get("reference_score", v.get("reference_J")),
            "by_snr": str(v.get("passed", v.get("gate_passed", "-"))),
            "domain": "-", "knobs": "-",
        })
    for p in sorted(glob.glob(os.path.join(args.root, "**", "bench_*.json"),
                              recursive=True)):
        try:
            with open(p) as fh:
                b = json.load(fh)
        except Exception:
            continue
        rows.append({
            "artifact": os.path.relpath(p, args.root),
            "kind": "serving-bench",
            "corr_macro": None, "mf_ratio": None,
            "by_snr": f"{b.get('measurements_per_s', '-')}/s",
            "domain": "-",
            "knobs": (f"B{b.get('batch')} s{b.get('steps')}"
                      f" avg{b.get('avg_seeds')}"),
        })

    if args.markdown:
        print("| artifact | kind | corr_macro | mf_ratio | by_snr | domain | knobs |")
        print("|---|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['artifact']} | {r['kind']} | {fmt(r['corr_macro'])} "
                  f"| {fmt(r['mf_ratio'])} | {r['by_snr']} | {r['domain']} "
                  f"| {r['knobs']} |")
    else:
        for r in rows:
            print(f"{r['artifact']:48s} {r['kind']:13s} "
                  f"corr={fmt(r['corr_macro'])} mf={fmt(r['mf_ratio'])} "
                  f"by_snr={r['by_snr']} domain={r['domain']} {r['knobs']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
