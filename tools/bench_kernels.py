"""Kernel micro-benchmarks on the real TPU: Pallas vs plain XLA.

Run on hardware (the axon-attached chip); prints one JSON line per
comparison.  Used to decide whether ``use_pallas`` defaults on."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    """Per-call wall time on the tunneled axon backend.

    `block_until_ready` there can return before the work executes — only a
    host FETCH forces it.  Fetching every rep would bury sub-ms kernels in
    the tunnel round-trip, so instead every rep's output is folded into one
    scalar accumulator and a SINGLE final fetch forces the whole chain; the
    one round-trip amortises over `reps`."""
    import numpy as _np

    def head(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf.ravel()[:1].astype(jnp.float32)

    _np.asarray(head(fn(*args)))           # compile + first exec
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        h = head(fn(*args))
        acc = h if acc is None else acc + h
    _np.asarray(acc)                       # force all reps
    return (time.perf_counter() - t0) / reps


def bench_conv():
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.pallas.fused import (
        fused_conv_gn_silu,
        fused_conv_gn_silu_reference,
    )

    for (B, L, Cin, Cout) in [(64, 4096, 64, 64), (64, 2048, 64, 128),
                              (64, 1024, 128, 256), (64, 1024, 512, 256)]:
        g = 8
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(ks[0], (B, L, Cin), jnp.float32)
        W = jax.random.normal(ks[1], (3, Cin, Cout)) * 0.1
        b = jnp.zeros((Cout,))
        s = jnp.ones((Cout,)); bb = jnp.zeros((Cout,))
        ref = jax.jit(lambda x, W, b, s, bb:
                      fused_conv_gn_silu_reference(x, W, b, s, bb, g))
        pal = jax.jit(lambda x, W, b, s, bb:
                      fused_conv_gn_silu(x, W, b, s, bb, g))
        t_ref = timeit(ref, x, W, b, s, bb)
        t_pal = timeit(pal, x, W, b, s, bb)
        err = float(jnp.max(jnp.abs(pal(x, W, b, s, bb) - ref(x, W, b, s, bb))))
        print(json.dumps({"kernel": "conv_gn_silu", "shape": [B, L, Cin, Cout],
                          "xla_ms": round(t_ref * 1e3, 3),
                          "pallas_ms": round(t_pal * 1e3, 3),
                          "speedup": round(t_ref / t_pal, 2),
                          "max_abs_err": err}))


def bench_conv_bf16():
    """The round-1 conv table was f32-only; the flagship runs bf16 — measure
    the fused ConvBlock kernel against XLA in the model's own dtype."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.pallas.fused import (
        fused_conv_gn_silu,
        fused_conv_gn_silu_reference,
    )

    for (B, L, Cin, Cout) in [(64, 4096, 64, 64), (64, 2048, 64, 128),
                              (64, 1024, 128, 256), (64, 1024, 512, 256)]:
        g = 8
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(ks[0], (B, L, Cin), jnp.bfloat16)
        W = (jax.random.normal(ks[1], (3, Cin, Cout)) * 0.1).astype(jnp.bfloat16)
        b = jnp.zeros((Cout,), jnp.bfloat16)
        s_ = jnp.ones((Cout,), jnp.bfloat16)
        bb = jnp.zeros((Cout,), jnp.bfloat16)
        ref = jax.jit(lambda x, W, b, s, bb:
                      fused_conv_gn_silu_reference(x, W, b, s, bb, g))
        pal = jax.jit(lambda x, W, b, s, bb:
                      fused_conv_gn_silu(x, W, b, s, bb, g))
        t_ref = timeit(ref, x, W, b, s_, bb)
        t_pal = timeit(pal, x, W, b, s_, bb)
        print(json.dumps({"kernel": "conv_gn_silu_bf16",
                          "shape": [B, L, Cin, Cout],
                          "xla_ms": round(t_ref * 1e3, 3),
                          "pallas_ms": round(t_pal * 1e3, 3),
                          "speedup": round(t_ref / t_pal, 2)}))


def bench_fast_decoder():
    """Algebraic decoder fusion (DecoderConvBlock) vs the materialised
    upsample+concat+ConvBlock path, per-stage and whole-model, bf16."""
    import flax.linen as nn

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.models.unet import (
        ConvBlock,
        DecoderConvBlock,
        UNet1D,
        _fix_len,
    )

    # flagship decoder stage shapes (L_skip, C_h, C_s, Cout)
    for (Ls, Ch, Cs, Co) in [(1024, 256, 256, 256), (2048, 256, 128, 128),
                             (4096, 128, 64, 64)]:
        B = 64
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        h = jax.random.normal(ks[0], (B, Ls // 2, Ch), jnp.float32)
        skip = jax.random.normal(ks[1], (B, Ls, Cs), jnp.float32)

        fast_m = DecoderConvBlock(Co, dtype=jnp.bfloat16)
        params_f = fast_m.init(jax.random.PRNGKey(1), h, skip)

        plain_m = ConvBlock(Co, 3, dtype=jnp.bfloat16)

        def plain(p, h, skip):
            u = jnp.repeat(h, 2, axis=1)
            u = _fix_len(u, skip.shape[1])
            return plain_m.apply(p, jnp.concatenate([u, skip], axis=-1))

        fast = jax.jit(lambda p, h, s: fast_m.apply(p, h, s))
        plainj = jax.jit(plain)
        t_plain = timeit(plainj, params_f, h, skip)
        t_fast = timeit(fast, params_f, h, skip)
        print(json.dumps({"kernel": "decoder_stage_fast_vs_plain_bf16",
                          "shape": [B, Ls, Ch, Cs, Co],
                          "plain_ms": round(t_plain * 1e3, 3),
                          "fast_ms": round(t_fast * 1e3, 3),
                          "speedup": round(t_plain / t_fast, 2)}))

    # whole flagship forward
    B, L = 64, 4096
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 7, L), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    for fastdec in (False, True):
        model = UNet1D(in_ch=7, base_ch=64, time_dim=128, depth=3,
                       cond_in_ch=5, use_selfcond=True,
                       dtype=jnp.bfloat16, fast_decoder=fastdec)
        params = model.init(jax.random.PRNGKey(1), x[:1], t[:1])
        fwd = jax.jit(lambda p, x, t: model.apply(p, x, t))
        dt = timeit(fwd, params, x, t, reps=10)
        print(json.dumps({"kernel": f"unet_fwd_fast_decoder={fastdec}",
                          "shape": [B, 7, L],
                          "ms": round(dt * 1e3, 3),
                          "fwd_per_sec": round(1.0 / dt, 1)}))


def bench_attention():
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.pallas.attention import (
        flash_attention,
        flash_attention_reference,
    )

    for (B, H, L, D) in [(8, 4, 2048, 64), (4, 4, 4096, 64), (2, 4, 8192, 64)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, H, L, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, H, L, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, H, L, D), jnp.float32)
        ref = jax.jit(flash_attention_reference)
        t_ref = timeit(ref, q, k, v)
        t_pal = timeit(lambda q, k, v: flash_attention(q, k, v), q, k, v)
        # correctness on hardware too
        err = float(jnp.max(jnp.abs(flash_attention(q, k, v)
                                    - ref(q, k, v))))
        print(json.dumps({"kernel": "flash_attention", "shape": [B, H, L, D],
                          "xla_ms": round(t_ref * 1e3, 3),
                          "pallas_ms": round(t_pal * 1e3, 3),
                          "speedup": round(t_ref / t_pal, 2),
                          "max_abs_err": err}))


def bench_unet():
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.models.unet import (
        UNet1D,
    )

    B, L = 64, 4096
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 7, L), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    for pallas in (False, True):
        model = UNet1D(in_ch=7, base_ch=64, time_dim=128, depth=3,
                       cond_in_ch=5, use_selfcond=True, use_attention=True,
                       dtype=jnp.bfloat16, use_pallas=pallas)
        params = model.init(jax.random.PRNGKey(1), x[:1], t[:1])
        fwd = jax.jit(lambda p, x, t: model.apply(p, x, t))
        dt = timeit(fwd, params, x, t, reps=10)
        print(json.dumps({"kernel": f"unet_fwd_pallas={pallas}",
                          "shape": [B, 7, L],
                          "ms": round(dt * 1e3, 3),
                          "fwd_per_sec": round(1.0 / dt, 1)}))


def bench_hbm_stream():
    """Pure-HBM-stream microbenchmark (VERDICT r4 item 8): measure the
    bandwidth this chip actually DELIVERS, so bench.py's `hbm_bw_util`
    (whose numerator is XLA's bytes-accessed upper bound) gets a measured
    denominator.  A saxpy over a buffer far larger than VMEM is compute-
    trivial and streams read+write HBM every iteration of an on-device
    fori_loop; K iterations amortise the single forced fetch, and the
    loop-carried dependence serialises them.  bytes = K * 2 * size."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.utils.roofline import (
        peak_for,
    )

    N = 64 * 1024 * 1024            # 256 MB f32 buffer >> VMEM
    K = 64
    x = jnp.full((N,), 1.0, jnp.float32)

    @jax.jit
    def stream(x):
        def body(_, y):
            return y * 1.0000001 + 1e-7
        return jax.lax.fori_loop(0, K, body, x)

    np.asarray(stream(x)[:1])       # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(stream(x)[:1])   # fetch forces execution (axon rule)
        best = min(best, time.perf_counter() - t0)
    moved = K * 2 * N * 4           # read + write per iteration
    gbps = moved / best / 1e9
    kind = jax.devices()[0].device_kind.lower()
    peak = peak_for(kind)
    out = {"kernel": "hbm_stream_saxpy", "buffer_mb": N * 4 // 2**20,
           "iters": K, "ms": round(best * 1e3, 2),
           "achieved_gbps": round(gbps, 1), "device_kind": kind}
    if peak:
        out["peak_gbps"] = peak[1] / 1e9
        out["fraction_of_spec_peak"] = round(gbps / (peak[1] / 1e9), 3)
    print(json.dumps(out))
    return gbps


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    import sys as _sys
    only = _sys.argv[1] if len(_sys.argv) > 1 else None
    table = {"conv": bench_conv, "conv_bf16": bench_conv_bf16,
             "decoder": bench_fast_decoder, "attn": bench_attention,
             "unet": bench_unet, "hbm": bench_hbm_stream}
    for name, fn in table.items():
        if only is None or only == name:
            fn()
