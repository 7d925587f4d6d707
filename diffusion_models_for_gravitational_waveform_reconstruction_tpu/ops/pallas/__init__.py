"""Pallas TPU kernels for the hot ops (BASELINE north-star kernels).

Each kernel has an XLA-equivalent reference implementation used for testing
(interpret mode on CPU) and as the automatic fallback when shapes don't fit
VMEM or the platform isn't TPU.
"""
from .attention import flash_attention, flash_attention_reference  # noqa: F401

