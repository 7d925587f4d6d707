"""Spin-conditioning sensitivity evaluation.

Measures whether a trained model's reconstructions actually USE the
spin1z/spin2z conditioning channels (VERDICT r2 item 1 'done' criterion):
for N held-out samples, reconstruct with (a) the true metadata stack and
(b) the same stack with the spin channels zeroed, and compare correlation
against clean.  A spin-blind model (round-2: trained on 0PN data where the
spin channels carried no signal) shows no gap; a spin-aware model scores
measurably worse when its spin conditioning is withheld.

Usage:
    python tools/spin_sensitivity.py --input-h5 EVAL.h5 --model CKPT \
        [--indices 0 1 ...] [--steps 50] [--avg-seeds 4] [--device tpu]

Prints one JSON line: {corr_true, corr_spin0, gap, per_sample: [...]}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input-h5", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--indices", type=int, nargs="+", default=None,
                   help="default: 16 spread over the file")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--ladder", choices=["t", "lambda"], default="lambda")
    p.add_argument("--avg-seeds", type=int, default=4)
    p.add_argument("--start-t", type=int, default=999)
    p.add_argument("--device", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.utils.platform import (
        maybe_force_platform,
    )
    maybe_force_platform(args.device)

    import h5py
    import jax

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.evals import (
        metrics as M,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.evals.sweep import (
        prep_samples,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import (
        dewhiten_back,
        load_model,
        reconstruct_batch,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        SamplerConfig,
    )

    model, params, schedule, ck = load_model(args.model)
    if args.indices is None:
        with h5py.File(args.input_h5, "r") as f:
            n = int(f["noisy"].shape[0])
        args.indices = list(np.linspace(0, n - 1, min(16, n)).astype(int))

    preps = prep_samples(
        args.input_h5, args.indices, ck, args.model,
        bool(ck.get("whiten", True)), str(ck.get("whiten_mode", "model")),
        str(ck.get("sigma_mode", "std")), float(ck.get("sigma_fixed", 1.0)))

    use_selfcond = int(ck.get("in_ch", 3)) == (1 + int(ck.get("cond_in_ch", 1)) + 1)
    cfg = SamplerConfig(
        steps=args.steps, start_t=args.start_t, ladder=args.ladder,
        pred_type=str(ck.get("pred_type", "eps")),
        drop_y_only=bool(ck.get("dropout_y_only", True)),
        use_selfcond=use_selfcond)

    # meta channel order is [m1/M, m2/M, s1, s2, ...] (inference.meta_to_stack)
    def run(zero_spins: bool):
        out = {}
        by_len = {}
        for i, pr in enumerate(preps):
            by_len.setdefault(pr["L"], []).append(i)
        key = jax.random.PRNGKey(args.seed)
        for L, idxs in sorted(by_len.items()):
            conds = np.concatenate([preps[i]["cond_stack"] for i in idxs])
            if zero_spins and conds.shape[1] >= 5:
                conds = conds.copy()
                conds[:, 3:5, :] = 0.0        # s1, s2 channels (after y)
            sig = np.array([preps[i]["sigma"] for i in idxs], np.float32)
            cn = np.concatenate([preps[i]["clean_norm"] for i in idxs])
            key, k = jax.random.split(key)
            xw = reconstruct_batch(model, params, schedule, conds, sig, cfg,
                                   k, clean_norms=cn,
                                   avg_seeds=args.avg_seeds)
            for j, i in enumerate(idxs):
                pr = preps[i]
                x0_raw = dewhiten_back(xw[j].astype(np.float64), pr)
                out[i] = M.score_last_window(x0_raw, pr["clean_raw"],
                                             pr["fs"])["corr_last"]
        return [out[i] for i in range(len(preps))]

    corr_true = run(zero_spins=False)
    corr_zero = run(zero_spins=True)
    res = {
        "corr_true": float(np.mean(corr_true)),
        "corr_spin0": float(np.mean(corr_zero)),
        "gap": float(np.mean(corr_true) - np.mean(corr_zero)),
        "n": len(preps),
        "per_sample": [
            {"index": int(ix), "corr_true": float(a), "corr_spin0": float(b)}
            for ix, a, b in zip(args.indices, corr_true, corr_zero)],
    }
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
