"""TPU-native diffusion framework for gravitational waveform reconstruction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``snr_denoising`` package (conditional DDPM/DDIM denoising of noisy BBH
strain), designed TPU-first:

- functional core: pure functions over pytrees, static shapes
- ``jit``/``lax.scan``/``vmap``/``shard_map`` throughout
- data-parallel training over a ``jax.sharding.Mesh``
- Pallas kernels for the fused hot ops

Subpackages
-----------
``ops``       diffusion math: beta schedules, q_sample, losses, samplers, whitening
``models``    the 1D U-Net denoiser (FiLM time conditioning, per-stage measurement
              conditioning, optional bottleneck attention)
``data``      synthetic chirp generation, HDF5 schema IO, batching pipeline
``training``  jitted/sharded train step, EMA, LR schedules, JSONL logging
``parallel``  mesh construction and sharding helpers
``evals``     metrics, sampler-hyperparameter sweep, mass-grid heatmap evaluation
``utils``     checkpointing, config dataclasses, JSONL logging
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
from . import models  # noqa: F401
