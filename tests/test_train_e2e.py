"""Minimum end-to-end slice (SURVEY.md §7 step 4 / BASELINE config 1):
train a tiny model on synthetic chirps and assert the loss decreases; then
reconstruct with the DDIM sampler end to end."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data import (
    pipeline as dpipe,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.synth import (
    SynthConfig,
    generate_batch,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
    SamplerConfig,
    ddim_sample,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training import (
    TrainConfig,
    train,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_params,
    select_weights,
)


@pytest.fixture(scope="module")
def tiny_dataset():
    cfg = SynthConfig(n=256, fs=1024, f_lower=20.0)
    n = 32
    rng = np.random.default_rng(0)
    m1 = jnp.asarray(rng.uniform(25, 35, n))
    m2 = jnp.asarray(rng.uniform(20, 30, n))
    snr = jnp.asarray(rng.uniform(10, 30, n))
    out = generate_batch(jax.random.PRNGKey(0), m1, m2, snr, config=cfg)
    # normalise the raw strain scale so sigma ~ O(1)
    scale = float(np.std(np.asarray(out["noisy"])))
    clean = np.asarray(out["signal"]) / scale
    noisy = np.asarray(out["noisy"]) / scale
    meta = np.stack([np.asarray(m1) / 80.0, np.asarray(m2) / 80.0,
                     np.zeros(n), np.zeros(n)], axis=1)
    return dpipe.dataset_from_arrays(clean, noisy, fs=cfg.fs, meta=meta)


def test_train_loss_decreases(tiny_dataset, tmp_path):
    cfg = TrainConfig(
        model_dir=str(tmp_path), epochs=6, batch_size=8, lr=3e-3, T=100,
        base_ch=8, time_dim=16, depth=2, seed=0, t_min_frac=0.0,
        p_uncond=0.2, p_selfcond=0.3, warmup_steps=4, bf16=False,
        log_jsonl=str(tmp_path / "log.jsonl"), probe_cond=True,
        probe_t=(10, 50), probe_interval=8, data_parallel=False,
    )
    result = train(cfg, dataset=tiny_dataset)
    hist = result["history"]
    assert hist[-1]["avg_per_sample"] < hist[0]["avg_per_sample"]
    assert os.path.exists(result["checkpoint"])
    # JSONL has train_batch + probe + epoch_end phases
    import json
    phases = set()
    with open(cfg.log_jsonl) as fh:
        for line in fh:
            phases.add(json.loads(line)["phase"])
    assert {"train_batch", "probe", "epoch_end"} <= phases


def test_checkpoint_roundtrip_and_sampling(tiny_dataset, tmp_path):
    cfg = TrainConfig(
        model_dir=str(tmp_path), epochs=2, batch_size=8, lr=1e-3, T=100,
        base_ch=8, time_dim=16, depth=2, seed=0, bf16=False,
        data_parallel=False,
    )
    result = train(cfg, dataset=tiny_dataset)
    model = result["model"]
    schedule = result["schedule"]

    ckpt = load_checkpoint(result["checkpoint"])
    assert ckpt["args"]["in_ch"] == result["in_ch"]
    assert ckpt["args"]["cond_in_ch"] == result["cond_in_ch"]
    assert ckpt["args"]["meta_scale"]["M"] > 0
    weights, used_ema = select_weights(ckpt, use_ema=True)
    assert used_ema
    params = restore_params(result["state"].params, weights)

    # end-to-end DDIM reconstruction on one sample
    bucket = tiny_dataset.buckets[tiny_dataset.bucket_lengths[0]]
    y = jnp.asarray(bucket["noisy"][:1] / bucket["sigma"][0])
    meta_bc = jnp.broadcast_to(
        jnp.asarray(bucket["meta"][:1])[:, :, None], (1, 4, y.shape[-1]))
    cond = jnp.concatenate([y, meta_bc], axis=1)

    def model_fn(p, x, t):
        return model.apply(p, x, t)

    scfg = SamplerConfig(steps=10, cfg_scale=1.0, use_selfcond=True,
                         init_mode="y-blend", start_t=80)
    x0 = ddim_sample(model_fn, params, schedule, cond, jax.random.PRNGKey(0), scfg)
    assert x0.shape == (1, 1, y.shape[-1])
    assert np.all(np.isfinite(np.asarray(x0)))


def test_resume_from_checkpoint(tiny_dataset, tmp_path):
    cfg = TrainConfig(model_dir=str(tmp_path / "a"), epochs=1, batch_size=8,
                      T=100, base_ch=8, time_dim=16, depth=2, bf16=False,
                      data_parallel=False)
    r1 = train(cfg, dataset=tiny_dataset)
    cfg2 = TrainConfig(model_dir=str(tmp_path / "b"), epochs=1, batch_size=8,
                       T=100, base_ch=8, time_dim=16, depth=2, bf16=False,
                       init_from=r1["checkpoint"], data_parallel=False)
    r2 = train(cfg2, dataset=tiny_dataset)
    assert os.path.exists(r2["checkpoint"])


def test_resume_roundtrip(tmp_path):
    """Full-state resume: params/EMA/opt/epoch restored; training continues."""
    import jax
    import numpy as np
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        dataset_from_arrays,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig, train,
    )

    rng = np.random.default_rng(0)
    clean = rng.normal(size=(16, 256)).astype(np.float32)
    noisy = clean + rng.normal(size=(16, 256)).astype(np.float32)
    ds = dataset_from_arrays(clean, noisy, fs=4096.0)

    base = dict(model_dir=str(tmp_path / "m1"), epochs=2, batch_size=8,
                base_ch=8, time_dim=16, depth=1, T=20, warmup_steps=2,
                bf16=False, data_parallel=False, save_every_epochs=1)
    out1 = train(TrainConfig(**base), dataset=ds)
    ep1_ckpt = str(tmp_path / "m1" / "latest_model" / "model_diffusion_ep1.msgpack")
    import os
    assert os.path.exists(ep1_ckpt)

    # resume from epoch-1 checkpoint into a fresh run dir, finish epoch 2
    base2 = dict(base, model_dir=str(tmp_path / "m2"), resume=ep1_ckpt)
    out2 = train(TrainConfig(**base2), dataset=ds)
    assert [h["epoch"] for h in out2["history"]] == [2]
    # resumed params differ from the ep1 checkpoint after the extra epoch
    p_new = jax.tree_util.tree_leaves(out2["state"].params)
    assert all(np.isfinite(np.asarray(x)).all() for x in p_new)


def test_resume_restores_global_step_and_rng(tmp_path):
    """Resume restores the EXACT global step (not epoch*n_batches): the LR
    schedule stays continuous even when batch size changes between runs —
    and resuming from a checkpoint inside model_dir/latest_model is safe
    (the payload is read before the output-dir wipe)."""
    import numpy as np
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        dataset_from_arrays,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig, train,
    )

    rng = np.random.default_rng(0)
    clean = rng.normal(size=(16, 128)).astype(np.float32)
    noisy = clean + rng.normal(size=(16, 128)).astype(np.float32)
    ds = dataset_from_arrays(clean, noisy, fs=4096.0)

    base = dict(base_ch=8, time_dim=16, depth=1, T=20, warmup_steps=2,
                bf16=False, data_parallel=False, skip_bad_batches=False)
    # run 1: batch 8 -> 2 batches/epoch, 2 epochs -> global step 4
    out1 = train(TrainConfig(model_dir=str(tmp_path / "m"), epochs=2,
                             batch_size=8, **base), dataset=ds)
    ck = load_checkpoint(out1["checkpoint"])
    assert ck["global_step"] == 4
    assert "rng_key" in ck

    # resume IN PLACE with batch 4 (4 batches/epoch). The old
    # epoch*n_batches reconstruction would restart from step 8; the exact
    # restore continues from 4 and epoch 3 adds 4 more -> 8.
    out2 = train(TrainConfig(model_dir=str(tmp_path / "m"), epochs=3,
                             batch_size=4, resume=out1["checkpoint"], **base),
                 dataset=ds)
    assert int(np.asarray(out2["state"].step)) == 8
    assert [h["epoch"] for h in out2["history"]] == [3]


def test_train_from_synth_spec(tmp_path):
    """--data synth:N trains end-to-end with no HDF5/PyCBC round trip."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig, train,
    )

    cfg = TrainConfig(data="synth:16", model_dir=str(tmp_path / "m"),
                      epochs=1, batch_size=8, base_ch=8, time_dim=16,
                      depth=1, T=20, warmup_steps=2, bf16=False,
                      data_parallel=False, whiten=True)
    out = train(cfg)
    import numpy as np
    assert np.isfinite(out["history"][0]["avg_per_sample"])


def test_data_parallel_matches_single_device(tmp_path):
    """XLA SPMD data parallelism is semantics-preserving: the mesh-sharded
    run must produce the same per-epoch losses as the unsharded run (same
    data, same seed)."""
    import jax
    import numpy as np
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        dataset_from_arrays,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig, train,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    rng = np.random.default_rng(0)
    clean = rng.normal(size=(16, 128)).astype(np.float32)
    noisy = clean + rng.normal(size=(16, 128)).astype(np.float32)

    base = dict(epochs=2, batch_size=8, base_ch=8, time_dim=16, depth=1,
                T=20, warmup_steps=2, bf16=False, seed=3)
    ds1 = dataset_from_arrays(clean, noisy, fs=4096.0)
    out1 = train(TrainConfig(model_dir=str(tmp_path / "a"),
                             data_parallel=False, **base), dataset=ds1)
    ds2 = dataset_from_arrays(clean, noisy, fs=4096.0)
    out2 = train(TrainConfig(model_dir=str(tmp_path / "b"),
                             data_parallel=True, **base), dataset=ds2)
    l1 = [h["avg_per_sample"] for h in out1["history"]]
    l2 = [h["avg_per_sample"] for h in out2["history"]]
    np.testing.assert_allclose(l2, l1, rtol=1e-4)


def test_remat_matches_plain(tmp_path):
    """jax.checkpoint must not change the math - identical losses."""
    import numpy as np
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        dataset_from_arrays,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig, train,
    )

    rng = np.random.default_rng(1)
    clean = rng.normal(size=(8, 128)).astype(np.float32)
    noisy = clean + rng.normal(size=(8, 128)).astype(np.float32)
    base = dict(epochs=1, batch_size=4, base_ch=8, time_dim=16, depth=1,
                T=10, warmup_steps=1, bf16=False, data_parallel=False, seed=5)
    out_a = train(TrainConfig(model_dir=str(tmp_path / "a"), remat=False,
                              **base),
                  dataset=dataset_from_arrays(clean, noisy, fs=4096.0))
    out_b = train(TrainConfig(model_dir=str(tmp_path / "b"), remat=True,
                              **base),
                  dataset=dataset_from_arrays(clean, noisy, fs=4096.0))
    np.testing.assert_allclose(out_b["history"][0]["avg_per_sample"],
                               out_a["history"][0]["avg_per_sample"],
                               rtol=1e-5)


def test_v_prediction_train_and_sample(tmp_path):
    """pred_type='v' trains and samples end-to-end; ckpt records it and
    gw-infer inherits it."""
    import json
    import os

    import numpy as np
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        dataset_from_arrays,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig, train,
    )

    rng = np.random.default_rng(2)
    clean = rng.normal(size=(8, 128)).astype(np.float32)
    noisy = clean + rng.normal(size=(8, 128)).astype(np.float32)
    ds = dataset_from_arrays(clean, noisy, fs=4096.0)
    cfg = TrainConfig(model_dir=str(tmp_path / "m"), epochs=1, batch_size=4,
                      base_ch=8, time_dim=16, depth=1, T=10, warmup_steps=1,
                      bf16=False, data_parallel=False, pred_type="v")
    out = train(cfg, dataset=ds)
    assert np.isfinite(out["history"][0]["avg_per_sample"])
    with open(out["checkpoint"] + ".args.json") as fh:
        assert json.load(fh)["pred_type"] == "v"

    # sampler consumes the v model
    import jax
    import jax.numpy as jnp
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        SamplerConfig, ddim_sample,
    )

    model, schedule = out["model"], out["schedule"]

    def model_fn(p, x, t):
        return model.apply(p, x, t)

    cond = jnp.zeros((1, out["cond_in_ch"], 128))
    scfg = SamplerConfig(steps=5, pred_type="v", cfg_scale=1.0,
                         use_selfcond=True)
    x0 = ddim_sample(model_fn, out["state"].ema_params, schedule, cond,
                     jax.random.PRNGKey(0), scfg)
    assert np.isfinite(np.asarray(x0)).all()


def test_dp_tp_mesh_matches_single_device(tmp_path):
    """dp x tp sharding through the trainer's OWN mesh path (cfg.tp):
    conv output channels sharded over the 'model' axis, batch over 'data'.
    GSPMD partitioning must be semantics-preserving vs the unsharded run."""
    import jax
    import numpy as np
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        dataset_from_arrays,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig, train,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")

    rng = np.random.default_rng(0)
    clean = rng.normal(size=(16, 128)).astype(np.float32)
    noisy = clean + rng.normal(size=(16, 128)).astype(np.float32)

    # base_ch 16 so encoder/decoder leaves clear the tp min-channel bar
    base = dict(epochs=2, batch_size=8, base_ch=16, time_dim=16, depth=2,
                T=20, warmup_steps=2, bf16=False, seed=3)
    ds1 = dataset_from_arrays(clean, noisy, fs=4096.0)
    out1 = train(TrainConfig(model_dir=str(tmp_path / "a"),
                             data_parallel=False, **base), dataset=ds1)
    ds2 = dataset_from_arrays(clean, noisy, fs=4096.0)
    out2 = train(TrainConfig(model_dir=str(tmp_path / "b"),
                             data_parallel=True, tp=2, **base), dataset=ds2)
    l1 = [h["avg_per_sample"] for h in out1["history"]]
    l2 = [h["avg_per_sample"] for h in out2["history"]]
    np.testing.assert_allclose(l2, l1, rtol=1e-4)


def test_first_batch_debug_x0_probe(tmp_path, capsys):
    """--debug_first emits the reference-parity one-step-x0 quality line
    (masked corr/MSE vs clean, norm+white domains) and dumps x0_hat.npy
    (ref train.py:524-585; VERDICT r2 item 10)."""
    import os

    import numpy as np
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        dataset_from_arrays,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig, train,
    )

    rng = np.random.default_rng(0)
    clean = rng.normal(size=(8, 128)).astype(np.float32)
    noisy = clean + rng.normal(size=(8, 128)).astype(np.float32)
    ds = dataset_from_arrays(clean, noisy, fs=4096.0)
    cfg = TrainConfig(model_dir=str(tmp_path / "m"), epochs=1, batch_size=8,
                      base_ch=8, time_dim=16, depth=1, T=20, warmup_steps=2,
                      bf16=False, data_parallel=False, debug_first=True)
    out = train(cfg, dataset=ds)
    text = capsys.readouterr().out
    assert "corr_masked(x0_norm, clean_norm)" in text
    assert "MSE_masked_white" in text
    dbg = os.path.join(out["out_dir"], "debug_batch0")
    for f in ("clean_raw.npy", "y_norm.npy", "x0_hat.npy"):
        assert os.path.exists(os.path.join(dbg, f)), f
    x0 = np.load(os.path.join(dbg, "x0_hat.npy"))
    assert x0.shape == (128,) and np.isfinite(x0).all()
