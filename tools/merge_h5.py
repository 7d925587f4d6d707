"""Back-compat shim: dataset concatenation now lives in the packaged CLI
(``gw-merge``, cli/merge.py).  Usage: python tools/merge_h5.py OUT IN1 IN2…
"""
import sys

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.merge import (
    merge,
)


def main(out_path: str, in_paths: list) -> None:
    n = merge(out_path, in_paths)
    print(f"[merge] wrote {n} samples -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
