"""Backend platform selection for CLI entry points.

The reference picks a torch device per CLI (``train.py:715``,
``inference.py:597``). The JAX analogue is the *platform* — and on this
rig two programs are known to wedge the TPU tunnel (CLAUDE.md): on-device
rfft/irfft at L>=8192 (data synthesis) and single-sample long DDIM scans.
Those CLIs therefore default to (or accept) ``--device cpu``.

``jax.config.update("jax_platforms", ...)`` only works BEFORE the backend
initialises; the env var ``JAX_PLATFORMS`` is unreliable here because
sitecustomize registers an experimental TPU plugin in every interpreter.
Call :func:`maybe_force_platform` at the top of ``main()`` in a fresh
process and the switch is safe.
"""
from __future__ import annotations

import sys
from typing import Optional

_VALID = ("cpu", "tpu", "gpu")


def maybe_force_platform(device: Optional[str]) -> None:
    """Force the JAX platform if ``device`` names one.

    ``None``/""/"default" leave JAX's own selection (TPU when attached).
    Any other value is matched against known platforms; unknown strings
    (e.g. torch-style "cuda:0" from reference-parity scripts) are ignored
    rather than fatal, matching the reference's permissive ``--device``.
    """
    if not device:
        return
    dev = str(device).lower().split(":")[0]
    if dev == "cuda":  # torch spelling from reference command lines
        dev = "gpu"
    if dev not in _VALID:
        print(f"[platform] WARNING: unknown --device {device!r}; keeping "
              f"JAX's default backend selection", file=sys.stderr)
        return
    import jax

    try:
        jax.config.update("jax_platforms", dev)
    except RuntimeError:
        # Backend already initialised (e.g. library use, tests).  Silently
        # keeping the old backend would defeat --device cpu, which exists
        # specifically to dodge known TPU-tunnel wedges on this rig — warn
        # loudly instead (ADVICE r2).
        backend = jax.default_backend()
        if backend != dev:
            print(f"[platform] WARNING: --device {dev} requested but the "
                  f"JAX backend is already initialised to '{backend}'; the "
                  f"requested platform was NOT applied", file=sys.stderr)
