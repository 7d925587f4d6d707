"""``gw-soup``: average checkpoint weights into a single "model soup".

No reference counterpart (the reference saves one ``.pth`` per run,
``train.py:606-630``).  Parameter averaging across late-epoch checkpoints
of ONE run (or across runs fine-tuned from a shared init) is a free
quality/robustness lever (Wortsman et al. 2022): members must live in the
same loss basin, which periodic ``--save-every-epochs`` checkpoints of a
single run do by construction.

Distinct from ``gw-grid --model a,b`` checkpoint ENSEMBLING, which averages
member *reconstructions* at N× sampling cost; the soup averages *weights*
once, so inference cost is that of a single model.

Output is a standard checkpoint (msgpack + ``.args.json`` sidecar) carrying
``soup_members``/``soup_weights`` provenance; every downstream CLI
(gw-infer/grid/sweep/distill) consumes it like any other checkpoint.
"""
import argparse
import sys

from ..utils.checkpoint import average_checkpoints, save_checkpoint


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "gw-soup", description=__doc__.split("\n")[0],
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--inputs", nargs="+", required=True,
                   help="2+ member checkpoints (.msgpack), same architecture.")
    p.add_argument("--output", required=True,
                   help="Path for the averaged checkpoint.")
    p.add_argument("--weights", type=float, nargs="+", default=None,
                   help="Per-member weights (normalised); default uniform.")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        payload = average_checkpoints(args.inputs, args.weights)
    except ValueError as e:
        print(f"[soup] ERROR: {e}", file=sys.stderr)
        return 2
    save_checkpoint(
        args.output,
        payload["model_state"],
        payload["args"],
        payload["epoch"],
        model_ema_state=payload.get("model_ema_state"),
    )
    n = len(args.inputs)
    print(f"[soup] averaged {n} checkpoints -> {args.output} "
          f"(epoch={payload['epoch']}, ema={'model_ema_state' in payload})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
