"""Regression tests pinning the round-3 review fixes."""
import numpy as np
import pytest


# --- pipeline wrap-fill: buckets smaller than the shortfall / mesh axis ----

def _tiny_ds(n_rows=3, L=1000, seed=0):
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        dataset_from_arrays,
    )
    rng = np.random.default_rng(seed)
    sig = [rng.normal(size=L).astype(np.float32) for _ in range(n_rows)]
    noisy = [s + rng.normal(size=L).astype(np.float32) for s in sig]
    return dataset_from_arrays(noisy, sig, 4096.0)


def test_wrap_fill_bucket_smaller_than_batch():
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data import (
        pipeline as P,
    )
    ds = _tiny_ds(3)
    bs = list(P.iterate_batches(ds, batch_size=8,
                                rng=np.random.default_rng(1)))
    assert all(b["clean"].shape[0] == 8 for b in bs)
    # device path stays bit-identical to the host path
    dev = P.upload_buckets(ds)
    bs2 = list(P.device_resident_batches(ds, 8, np.random.default_rng(1),
                                         dev))
    for a, b in zip(bs, bs2):
        assert np.allclose(a["clean"], np.asarray(b["clean"]))


def test_sharded_upload_bucket_smaller_than_mesh_axis():
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data import (
        pipeline as P,
    )
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    sh = NamedSharding(mesh, PartitionSpec("data"))
    ds = _tiny_ds(3)  # 3 rows, pad to 8 needs 5 wrap rows (> bucket size)
    dev = P.upload_buckets(ds, sharding=sh)
    assert dev is not None
    n_dev = int(np.prod(list(mesh.shape.values())))
    bs = list(P.device_resident_batches(ds, n_dev, np.random.default_rng(1),
                                        dev, sharding=sh))
    assert all(b["clean"].shape[0] == n_dev for b in bs)


# --- gen probe: PN duration gating -----------------------------------------

def test_probe_config_pn_duration_gates():
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.gen import (
        config_duration_s,
        probe_config,
    )
    # the engines genuinely disagree on duration (PN terminates at the Kerr
    # ISCO and carries 1PN..3.5PN + spin phasing; measured: spinless PN is
    # SHORTER than the Newtonian to-coalescence estimate, while aligned
    # positive spin lengthens past it)
    d_newt = config_duration_s(25.0, 25.0, 20.0, "newtonian")
    d_pn = config_duration_s(25.0, 25.0, 20.0, "pn")
    d_up = config_duration_s(25.0, 25.0, 20.0, "pn", 0.8, 0.8)
    d_dn = config_duration_s(25.0, 25.0, 20.0, "pn", -0.8, -0.8)
    assert abs(d_pn - d_newt) / d_newt > 0.05
    assert d_dn < d_pn < d_up
    # a cap between the spinless and max-spin PN durations gates the
    # spinning config but not the spinless one — the probe must see spins
    cap = 0.5 * (d_pn + d_up)
    assert probe_config(25.0, 25.0, 20.0, cap, "pn")
    assert not probe_config(25.0, 25.0, 20.0, cap, "pn", 0.8, 0.8)


# --- masked_corr: physical-strain scale invariance --------------------------

def test_masked_corr_physical_strain_scale():
    import jax.numpy as jnp

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        masked_corr,
    )
    rng = np.random.default_rng(0)
    a = rng.normal(size=(1, 1, 512)).astype(np.float32)
    m = np.ones_like(a)
    # perfect correlation at strain scale 1e-22 (f32 products subnormal)
    c = float(masked_corr(jnp.asarray(a * 1e-22), jnp.asarray(a * 3e-22),
                          jnp.asarray(m)))
    assert c == pytest.approx(1.0, abs=1e-5)
    # zero input -> guarded 0, not NaN
    z = float(masked_corr(jnp.zeros_like(jnp.asarray(a)),
                          jnp.asarray(a), jnp.asarray(m)))
    assert z == 0.0


# --- gw-merge guards ---------------------------------------------------------

def test_merge_refuses_output_equals_input(tmp_path, rng):
    import h5py

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.merge import (
        merge,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.hdf5io import (
        write_dataset,
    )
    p = tmp_path / "a.h5"
    sig = [rng.normal(size=800).astype(np.float32) for _ in range(2)]
    noise = [rng.normal(size=800).astype(np.float32) for _ in range(2)]
    noisy = [s + x for s, x in zip(sig, noise)]
    times = [np.arange(800) / 4096.0 for _ in range(2)]
    meta = {k: [1.0, 1.0] for k in ("mass1", "mass2", "spin1z", "spin2z",
                                    "q", "chirp_mass", "snr")}
    write_dataset(str(p), sig, noise, noisy, times, meta, 4096.0)
    with pytest.raises(ValueError, match="truncate"):
        merge(str(p), [str(p), str(p)])
    # source must be intact afterwards
    with h5py.File(p) as f:
        assert f["lengths"].shape[0] == 2


# --- trainer: --no-data-parallel with --tp does not re-enable a data axis ---

def test_no_data_parallel_with_tp_keeps_data_axis_1(tmp_path, capsys):
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data import (
        pipeline as dpipe,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig,
        train,
    )
    rng = np.random.default_rng(1)
    clean = rng.normal(size=(16, 128)).astype(np.float32)
    noisy = clean + rng.normal(size=(16, 128)).astype(np.float32)
    train(TrainConfig(data="", model_dir=str(tmp_path / "m"), epochs=1,
                      batch_size=8, base_ch=8, time_dim=16, depth=1, T=20,
                      warmup_steps=2, bf16=False, seed=3,
                      data_parallel=False, tp=2),
          dataset=dpipe.dataset_from_arrays(list(noisy), list(clean),
                                            fs=4096.0))
    out = capsys.readouterr().out
    # --no-data-parallel respected: the tp mesh gets NO data axis
    assert "'data': 1" in out and "'model': 2" in out


# --- parse_sweep_best: gate honouring + sampler/ladder transfer -------------

def test_parse_sweep_best_honours_validation_gate(tmp_path):
    import json

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.evals.grid import (
        parse_sweep_best,
    )
    top_combo = {"start_snr": 6.0, "cfg_scale": 2.5, "init_mode": "noise",
                 "dc_weight": 0.1, "eta": 0.2, "cfg_mode": "gauss",
                 "cfg_center": 0.7, "cfg_width": 0.12}
    default_combo = {"start_snr": 0.0, "cfg_scale": 1.5, "init_mode": "noise",
                     "dc_weight": 0.0, "eta": 0.0, "cfg_mode": "const",
                     "cfg_center": 0.7, "cfg_width": 0.12}
    finals = [{
        "combo": top_combo, "steps": 50, "J": 0.9,
        "sampler": "dpmpp", "ladder": "lambda",
        "validation": {"enabled": True, "emit_top": False,
                       "J_val_top": 0.2, "J_val_default": 0.7,
                       "default_combo": default_combo,
                       "default_start_t": 999},
    }]
    (tmp_path / "final_results.json").write_text(json.dumps(finals))
    knobs = parse_sweep_best(str(tmp_path))
    # the gate rejected the top combo -> defaults + top-of-chain start
    assert knobs["cfg_scale"] == 1.5 and knobs["eta"] == 0.0
    assert knobs["start_t"] == 999
    # the sampler/ladder the sweep scored under still transfer
    assert knobs["sampler"] == "dpmpp" and knobs["ladder"] == "lambda"

    # emit_top=True keeps the winning combo
    finals[0]["validation"]["emit_top"] = True
    (tmp_path / "final_results.json").write_text(json.dumps(finals))
    knobs = parse_sweep_best(str(tmp_path))
    assert knobs["cfg_scale"] == 2.5 and knobs["sampler"] == "dpmpp"


def test_parse_sweep_best_cmd_fallback_sampler_ladder(tmp_path):
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.evals.grid import (
        parse_sweep_best,
    )
    (tmp_path / "best_cmd.txt").write_text(
        "gw-infer --input-h5 x.h5 --index 0 --model m.msgpack "
        "--steps 50 --eta 0.0 --start-t 999 --init-mode noise "
        "--cfg-scale 1.5 --cfg-mode const --cfg-center 0.7 --cfg-width 0.12 "
        "--dc-weight 0 --whiten 1 --whiten-mode model --sigma-mode std "
        "--sampler dpmpp --ladder lambda\n")
    knobs = parse_sweep_best(str(tmp_path))
    assert knobs["sampler"] == "dpmpp"
    assert knobs["ladder"] == "lambda"
    assert knobs["start_t"] == 999


# --- third batch: models/parallel/synth/hdf5io -------------------------------

def test_attention_heads_divide_channels():
    import jax
    import jax.numpy as jnp

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.models import (
        UNet1D,
    )
    # base_ch 28 -> bottleneck C=112; naive heads=3 does not divide 112
    model = UNet1D(in_ch=3, base_ch=28, time_dim=16, depth=2,
                   t_embed_max_time=19.0, cond_in_ch=1, use_selfcond=True,
                   use_attention=True)
    x = jnp.zeros((1, 3, 256))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    out = model.apply(params, x, jnp.zeros((1,), jnp.int32))
    assert out.shape == (1, 1, 256)


def test_make_mesh_rejects_oversized_model_axis():
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.parallel.mesh import (
        make_mesh,
    )
    import jax
    with pytest.raises(AssertionError, match="empty"):
        make_mesh(n_model=2 * len(jax.devices()))


def test_generate_batch_scalar_spins():
    import jax
    import jax.numpy as jnp

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.synth import (
        SynthConfig,
        generate_batch,
    )
    out = generate_batch(jax.random.PRNGKey(0), jnp.asarray([30.0, 40.0]),
                         jnp.asarray([25.0, 35.0]), jnp.asarray([10.0, 10.0]),
                         spin1z=0.5, spin2z=-0.25,
                         config=SynthConfig(n=1024))
    assert out["signal"].shape == (2, 1024)
    assert np.isfinite(np.asarray(out["signal"])).all()


def test_psd_saved_attr_mirrors_writes(tmp_path, rng):
    import h5py

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.hdf5io import (
        write_dataset,
    )
    sig = [rng.normal(size=512).astype(np.float32)]
    noise = [rng.normal(size=512).astype(np.float32)]
    noisy = [sig[0] + noise[0]]
    times = [np.arange(512) / 4096.0]
    meta = {k: [1.0] for k in ("mass1", "mass2", "spin1z", "spin2z",
                               "q", "chirp_mass", "snr")}
    p = tmp_path / "x.h5"
    # welch arrays WITHOUT freqs are not written -> psd_saved must be False
    write_dataset(str(p), sig, noise, noisy, times, meta, 4096.0,
                  psd_welch=[np.ones(257)], psd_welch_freqs=None)
    with h5py.File(p) as f:
        assert "psd_welch" not in f
        assert not bool(f.attrs["psd_saved"])


def test_tiled_apply_mesh_non_divisible_tiles():
    import jax
    import jax.numpy as jnp

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.models import (
        UNet1D,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.parallel.mesh import (
        make_mesh,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.parallel.seqtile import (
        tiled_apply,
    )
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    model = UNet1D(in_ch=3, base_ch=8, time_dim=16, depth=2,
                   t_embed_max_time=19.0, cond_in_ch=1, use_selfcond=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 5120))  # 5 tiles @1024
    params = model.init(jax.random.PRNGKey(0), x[:, :, :1024],
                        jnp.zeros((1,), jnp.int32))
    t = jnp.zeros((1,), jnp.int32)
    mesh = make_mesh()          # 8 devices; 5 % 8 != 0 -> padded tile axis
    out = tiled_apply(model, params, x, t, chunk=1024, mesh=mesh)
    ref = tiled_apply(model, params, x, t, chunk=1024)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
