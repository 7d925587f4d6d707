"""``gw-export``: compile a checkpoint's deployment sampler to a portable
serving artifact (StableHLO via ``jax.export``).

Framework extension — no reference counterpart (the reference serves by
re-running its Python/torch inference script per measurement,
``inference.py:517-903``).  The artifact bakes the weights and the FULL
deployment recipe (ladder, CFG, self-cond policy, seed averaging, σ
rescale, MF amplitude calibration) into one XLA program per target
platform; a serving host needs only ``jax.export.deserialize`` — no model
code, no checkpoint, no flax.  Sampler knobs left unset resolve from the
checkpoint's deployment contract exactly like ``gw-infer`` (distilled
checkpoints carry their own steps/ladder/CFG).
"""
import argparse
import sys

from ..serving import export_sampler, validate_export


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "gw-export", description=__doc__.split("\n")[0],
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--model", required=True, help="Checkpoint (.msgpack/.pth)")
    p.add_argument("--output", required=True,
                   help="Artifact path (writes OUTPUT and OUTPUT.json)")
    p.add_argument("--batch-size", type=int, default=64,
                   help="Static serving batch size")
    p.add_argument("--length", type=int, default=4096,
                   help="Static segment length (samples)")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="Comma-separated lowering targets")
    p.add_argument("--sampler", default="ddim",
                   choices=["ddim", "ddpm", "dpmpp"])
    p.add_argument("--steps", type=int, default=None,
                   help="None = checkpoint contract / reference default")
    p.add_argument("--ladder", default=None, choices=["t", "lambda"])
    p.add_argument("--cfg-scale", type=float, default=None)
    p.add_argument("--start-t", type=int, default=None,
                   help="None = top of chain (T-1; serving samples from noise)")
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--avg-seeds", type=int, default=8)
    p.add_argument("--avg-mode", default="mean",
                   choices=["mean", "median", "mf"])
    p.add_argument("--amp-calib", default="mf", choices=["none", "mf"])
    p.add_argument("--no-ema", action="store_true",
                   help="Export raw (non-EMA) weights")
    p.add_argument("--dp", type=int, default=1,
                   help="Pod serving: shard the batch axis over a DP-device "
                        "'data' mesh (GSPMD collectives baked into the "
                        "artifact). The serving host must have exactly DP "
                        "local devices of the target platform; batch-size "
                        "must divide evenly.")
    p.add_argument("--device", default="cpu",
                   help="Process platform for the export itself. Lowering "
                        "is platform-parameterized (a CPU process emits "
                        "TPU artifacts), so default to cpu: checkpoint "
                        "skeleton init on the attached TPU would pay "
                        "minutes of tunnel compiles for nothing.")
    p.add_argument("--validate", action="store_true",
                   help="Deserialize and replay the artifact on random "
                        "inputs after export (needs a local device of one "
                        "of the target platforms)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..utils.platform import maybe_force_platform
    maybe_force_platform(args.device)
    contract = export_sampler(
        args.model, args.output,
        batch=args.batch_size, length=args.length,
        platforms=[s.strip() for s in args.platforms.split(",") if s.strip()],
        sampler=args.sampler, steps=args.steps, ladder=args.ladder,
        cfg_scale=args.cfg_scale, start_t=args.start_t, eta=args.eta,
        avg_seeds=args.avg_seeds, avg_mode=args.avg_mode,
        amp_calib=args.amp_calib, use_ema=not args.no_ema, dp=args.dp)
    k = contract["knobs"]
    print(f"[export] {args.output}: {contract['artifact_bytes'] / 1e6:.1f} MB"
          f", platforms={contract['platforms']}, dp={contract['dp']}"
          f", sampler={k['sampler']}"
          f"@{k['steps']} ladder={k['ladder']} avg_seeds={k['avg_seeds']}"
          f" amp_calib={k['amp_calib']}")
    if args.validate:
        peak = validate_export(args.output)
        print(f"[export] validate OK (max|x0_white| = {peak:.4g})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
