"""Measure exported-artifact serving latency on the attached accelerator.

Replays a ``gw-export`` StableHLO artifact on random inputs and reports
wall-clock per call / per measurement.  Timing is fetch-forced (the axon
TPU client executes at host fetch, not at dispatch — RESULTS.md "fetch-
forced bench timing"): every rep fetches the full (B, L) output.

Usage:
    python tools/bench_serving.py --artifact runs/flagship/serve/X.shlo \
        [--reps 5] [--seed 0]

Prints one JSON line:
    {artifact, batch, steps, avg_seeds, cfg_scale, best_s_per_call,
     median_s_per_call, s_per_measurement, measurements_per_s,
     unet_forwards_per_call}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.serving import (  # noqa: E501
        load_exported,
    )

    call, contract = load_exported(args.artifact)
    if contract is None:
        print(f"missing sidecar {args.artifact}.json", file=sys.stderr)
        return 2
    B, C, L = (int(v) for v in
               contract["calling_convention"]["inputs"]["cond_stack"][:3])
    k = contract["knobs"]
    steps, avg_seeds = int(k["steps"]), int(k["avg_seeds"])
    cfg_scale = float(k["cfg_scale"])
    # forwards per call: B measurements x avg_seeds trajectories x steps,
    # x2 when CFG is applied at sampling time (folded CFG: cfg_scale==1)
    forwards = B * avg_seeds * steps * (2 if cfg_scale != 1.0 else 1)

    rng = np.random.default_rng(args.seed)
    cond = rng.normal(size=(B, C, L)).astype(np.float32)
    sig = np.ones((B,), np.float32)

    _ = np.asarray(call(cond, sig, np.int32(0)))       # compile + force
    times = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        out = np.asarray(call(cond, sig, np.int32(r + 1)))   # fetch forces
        times.append(time.perf_counter() - t0)
    assert out.shape == (B, L) and np.all(np.isfinite(out))

    best = float(min(times))
    med = float(np.median(times))
    print(json.dumps({
        "artifact": os.path.basename(args.artifact),
        "batch": B, "length": L, "steps": steps, "avg_seeds": avg_seeds,
        "cfg_scale": cfg_scale, "sampler": k["sampler"],
        "unet_forwards_per_call": forwards,
        "best_s_per_call": round(best, 4),
        "median_s_per_call": round(med, 4),
        "s_per_measurement": round(best / B, 5),
        "measurements_per_s": round(B / best, 2),
        "forwards_per_s": round(forwards / best, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
