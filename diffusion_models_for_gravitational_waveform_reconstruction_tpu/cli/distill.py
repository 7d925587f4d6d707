"""Progressive-distillation CLI (``gw-distill``).

Framework extension (no reference counterpart — the reference's only
sampler is a 200-step Python DDIM loop,
``/root/reference/src/snr_denoising/inference.py:374-514``).  Chains
halving stages teacher->student (see ``training/distill.py``); each stage
checkpoint records its deployment contract (steps / ladder / folded CFG /
zero self-cond) so ``gw-infer``/``gw-grid`` pick the right knobs
automatically:

    gw-distill --teacher runs/big/model/model_diffusion.msgpack \
               --data runs/big/train.h5 --model_dir runs/big/distilled \
               --steps-schedule 64,32,16,8,4 --epochs 4
    gw-infer --model runs/big/distilled/model_distilled_4step.msgpack ...
"""
from __future__ import annotations

import argparse
from typing import List, Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gw-distill",
        description="Progressive distillation to few-step samplers.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--teacher", type=str, required=True,
                   help="Teacher checkpoint (.msgpack or reference .pth).")
    p.add_argument("--data", type=str, required=True,
                   help="Training HDF5 (same domain as the teacher).")
    p.add_argument("--model_dir", type=str, default="distilled")
    p.add_argument("--steps-schedule", type=str, default="64,32,16,8,4",
                   help="Comma-separated halving chain; first entry is the "
                        "teacher's sampling steps.")
    p.add_argument("--epochs", type=int, default=4,
                   help="Epochs per stage.")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--clip_grad", type=float, default=1.0)
    p.add_argument("--cfg-scale", type=float, default=1.5,
                   help="Guidance weight folded into the student.")
    p.add_argument("--ladder", choices=["t", "lambda"], default="lambda")
    p.add_argument("--start-t", type=int, default=999,
                   help="Top of the distilled ladder (full-range noise "
                        "init; matches the measured best eval recipe).")
    p.add_argument("--no-ema", dest="ema", action="store_false", default=True)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-device-data", dest="device_data",
                   action="store_false", default=True)
    p.add_argument("--log-jsonl", type=str, default=None)
    p.add_argument("--device", type=str, default=None,
                   help="JAX platform override (cpu/tpu); default: auto.")
    return p


def main(argv: Optional[List[str]] = None) -> None:
    args = build_parser().parse_args(argv)
    from ..utils.platform import maybe_force_platform
    maybe_force_platform(args.device)
    from ..parallel.mesh import multihost_init
    multihost_init()

    from ..training.distill import DistillConfig, distill

    chain = [int(x) for x in args.steps_schedule.split(",") if x]
    cfg = DistillConfig(
        teacher=args.teacher, data=args.data, model_dir=args.model_dir,
        steps_schedule=chain, epochs_per_stage=args.epochs,
        batch_size=args.batch_size, lr=args.lr,
        weight_decay=args.weight_decay, clip_grad=args.clip_grad,
        cfg_scale=args.cfg_scale, ladder=args.ladder, start_t=args.start_t,
        ema=args.ema, ema_decay=args.ema_decay, seed=args.seed,
        device_data=args.device_data, log_jsonl=args.log_jsonl)
    res = distill(cfg)
    print(f"[distill] done; checkpoints: {res['checkpoints']}")


if __name__ == "__main__":
    main()
