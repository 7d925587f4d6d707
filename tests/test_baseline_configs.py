"""Smoke tests for the BASELINE.json gating configs (scaled down to CI size).

1. Tiny unconditional DDPM, linear beta schedule, synthetic chirps.
2. SNR-conditioned denoiser on whitened strain, ancestral (DDPM) sampling.
3. Attention U-Net + cosine schedule on long segments, 50-step DDIM.
(4/5 — data-parallel batch and population sampling — are covered by
``dryrun_multichip`` and ``reconstruct_batch``'s mesh path.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.models.unet import (
    UNet1D,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
    SamplerConfig,
    ddim_sample,
    ddpm_sample,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.schedules import (
    make_schedule,
)


def test_config1_unconditional_linear_schedule():
    """Unconditional model + linear betas: train_step runs, loss finite,
    DDPM sampling produces finite output."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        dataset_from_arrays,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.synth import (
        newtonian_chirp,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig,
        train,
    )

    # synthetic chirps, 1024 samples (config 1)
    h = np.asarray(newtonian_chirp(jnp.array(30.0), jnp.array(25.0),
                                   n=1024, fs=4096))
    h = h / (np.abs(h).max() + 1e-30)
    rng = np.random.default_rng(0)
    clean = np.stack([h * s for s in rng.uniform(0.5, 1.5, size=16)])
    noisy = clean + 0.3 * rng.normal(size=clean.shape).astype(np.float32)
    ds = dataset_from_arrays(clean.astype(np.float32),
                             noisy.astype(np.float32), fs=4096.0)

    cfg = TrainConfig(model_dir="/tmp/cfg1", epochs=1, batch_size=8,
                      base_ch=8, time_dim=16, depth=2, T=50,
                      schedule="linear", warmup_steps=2, bf16=False,
                      data_parallel=False)
    out = train(cfg, dataset=ds)
    assert np.isfinite(out["history"][0]["avg_per_sample"])
    assert out["schedule"].betas.shape == (50,)
    # linear schedule really is linear
    b = np.asarray(out["schedule"].betas)
    d = np.diff(b)
    np.testing.assert_allclose(d, d[0], rtol=1e-4)


def test_config2_ancestral_sampling_conditioned():
    """Conditioned model, DDPM (ancestral) sampler end-to-end."""
    in_ch, cond_ch = 7, 5
    model = UNet1D(in_ch=in_ch, base_ch=8, time_dim=16, depth=2,
                   cond_in_ch=cond_ch, use_selfcond=True)
    L = 512
    x = jnp.zeros((1, in_ch, L))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    schedule = make_schedule(50, "cosine")
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, cond_ch, L))

    def model_fn(p, xx, tt):
        return model.apply(p, xx, tt)

    cfg = SamplerConfig(steps=10, cfg_scale=1.5, use_selfcond=True)
    x0 = ddpm_sample(model_fn, params, schedule, cond,
                     jax.random.PRNGKey(2), cfg)
    assert x0.shape == (2, 1, L)
    assert np.isfinite(np.asarray(x0)).all()


def test_config3_attention_long_segment_ddim():
    """Attention U-Net on a 16384-sample segment via DDIM scan.

    (The production config uses 50 steps; on the CPU test grid the step
    count only multiplies runtime without adding coverage, so this runs the
    same compiled scan with fewer iterations.)"""
    in_ch, cond_ch = 3, 1
    model = UNet1D(in_ch=in_ch, base_ch=8, time_dim=16, depth=3,
                   cond_in_ch=cond_ch, use_selfcond=True, use_attention=True)
    L = 16384
    x = jnp.zeros((1, in_ch, L))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    schedule = make_schedule(1000, "cosine")
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, cond_ch, L))

    def model_fn(p, xx, tt):
        return model.apply(p, xx, tt)

    cfg = SamplerConfig(steps=8, cfg_scale=1.0, use_selfcond=True)
    x0 = ddim_sample(model_fn, params, schedule, cond,
                     jax.random.PRNGKey(2), cfg)
    assert x0.shape == (1, 1, L)
    assert np.isfinite(np.asarray(x0)).all()


def test_config4_16khz_batch512_dp_mechanics(tmp_path):
    """BASELINE config 4 (16 kHz segments, batch 512, DP on a v5e-8) at toy
    scale: attention U-Net + remat + DP sharding over the 8-device mesh.
    The sharded program must compile, run, and match the unsharded losses.
    (Real-hardware 16 kHz run recorded in RESULTS.md; this covers the DP
    composition explicitly.)"""
    import jax
    import numpy as np
    import pytest
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        dataset_from_arrays,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig, train,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device test mesh")

    rng = np.random.default_rng(0)
    # toy stand-ins: L=512 for the 16 kHz segment, batch 16 for 512
    clean = rng.normal(size=(32, 512)).astype(np.float32)
    noisy = clean + rng.normal(size=(32, 512)).astype(np.float32)

    base = dict(epochs=1, batch_size=16, base_ch=8, time_dim=16, depth=2,
                T=20, warmup_steps=2, bf16=False, seed=7,
                use_attention=True, remat=True)
    ds1 = dataset_from_arrays(clean, noisy, fs=16384.0)
    out1 = train(TrainConfig(model_dir=str(tmp_path / "a"),
                             data_parallel=False, **base), dataset=ds1)
    ds2 = dataset_from_arrays(clean, noisy, fs=16384.0)
    out2 = train(TrainConfig(model_dir=str(tmp_path / "b"),
                             data_parallel=True, **base), dataset=ds2)
    np.testing.assert_allclose(
        [h["avg_per_sample"] for h in out2["history"]],
        [h["avg_per_sample"] for h in out1["history"]], rtol=1e-4)
