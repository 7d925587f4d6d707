"""Chip peak tables + analytic U-Net FLOPs for MFU accounting.

The serving bench derives exact per-step FLOPs from XLA cost analysis
(`bench.py`); the TRAINING loop cannot afford a second lowering of its jitted
step, so it uses the closed-form count below — validated against XLA's
number for the bench model (1.907 vs 1.945 GFLOP/sample, 2% low: GroupNorm/
SiLU/resize/time-MLP are excluded).  Conv MACs count as 2 FLOPs.
"""
from __future__ import annotations

from typing import Optional, Tuple

# device_kind substring -> (peak bf16 FLOP/s, peak HBM bytes/s)
PEAKS = {
    "v5 lite": (197e12, 819e9),
    "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6": (918e12, 1640e9),
}


def peak_for(device_kind: str) -> Optional[Tuple[float, float]]:
    kind = device_kind.lower()
    for k, v in PEAKS.items():
        if k in kind:
            return v
    return None


def unet_flops_per_sample(
    L: int,
    in_ch: int,
    base_ch: int,
    depth: int = 3,
    cond_ch: int = 0,
    kernel: int = 3,
    fast_decoder: bool = True,
    use_attention: bool = False,
    attn_heads: int = 4,
) -> float:
    """Forward FLOPs of one ``models.unet.UNet1D`` application on one
    length-``L`` sample (conv + cond-bias dense + attention; GN/SiLU/FiLM/
    resize excluded — they are <2% of the total at flagship shapes)."""
    chs = [base_ch * (2 ** i) for i in range(depth)]
    f = 0.0
    # encoder
    c_in = in_ch
    for i, c in enumerate(chs):
        Li = L >> i
        f += Li * kernel * c_in * c * 2          # ConvBlock
        f += Li * cond_ch * c * 2                # cond_bias Dense
        c_in = c
    # bottleneck
    Lb = L >> depth
    f += Lb * kernel * chs[-1] * chs[-1] * 2
    f += Lb * cond_ch * chs[-1] * 2
    if use_attention:
        C = chs[-1]
        f += 4 * Lb * C * C * 2                  # qkv + out projections
        f += 2 * Lb * Lb * C * 2                 # scores + weighted sum
    # decoder (skip lengths L>>i for i = depth-1 .. 0)
    c_h = chs[-1]
    for i, c_s in enumerate(reversed(chs)):
        Ls = L >> (depth - 1 - i)
        if fast_decoder and kernel == 3:
            f += Ls * kernel * c_s * c_s * 2     # skip branch, k=3 at Ls
            f += Ls * 2 * c_h * c_s * 2          # h branch: 2 k=2 convs at Ls/2
        else:
            f += Ls * kernel * (c_h + c_s) * c_s * 2
        f += Ls * cond_ch * c_s * 2              # cond_bias Dense
        c_h = c_s
    # head: conv3 over [h, x_t]
    f += L * kernel * (chs[0] + 1) * 1 * 2
    return float(f)
