"""Mesh-native device-resident input path + batch-512 DP at spec.

VERDICT r2 items 5/6: (a) resident buckets upload ROW-SHARDED over the
``data`` mesh axis and every batch lands pre-sharded (no per-batch
single-device bounce, no full replica); (b) BASELINE config 4's batch-512
data-parallel training runs on the 8-device CPU mesh with loss identity vs
the unsharded run.  Runs on the conftest-forced 8-device CPU platform.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data import pipeline as dpipe
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device CPU mesh")


def _toy_dataset(n=40, L=64, seed=0):
    rng = np.random.default_rng(seed)
    clean = rng.normal(size=(n, L)).astype(np.float32)
    noisy = clean + rng.normal(size=(n, L)).astype(np.float32)
    return dpipe.dataset_from_arrays(clean, noisy, fs=4096.0)


def test_upload_buckets_row_sharded():
    ds = _toy_dataset(n=41)          # deliberately not divisible by 8
    mesh = pmesh.make_mesh(n_data=8)
    sh = pmesh.batch_sharding(mesh)
    dev = dpipe.upload_buckets(ds, sharding=sh)
    assert dev is not None
    for Lb, b in dev.items():
        for k, v in b.items():
            # rows wrap-padded to a multiple of 8 and sharded over 'data'
            assert v.shape[0] % 8 == 0
            assert v.sharding.is_equivalent_to(sh, v.ndim), (Lb, k)
            # each device holds exactly 1/8 of the rows (no full replica)
            shard_rows = {s.data.shape[0] for s in v.addressable_shards}
            assert shard_rows == {v.shape[0] // 8}, (Lb, k)


def test_resident_batches_pre_sharded_and_bit_identical():
    """Mesh path yields batches already sharded P('data') with contents
    bit-identical to the unsharded resident path (same schedule rng)."""
    ds = _toy_dataset(n=40)
    mesh = pmesh.make_mesh(n_data=8)
    sh = pmesh.batch_sharding(mesh)

    dev_plain = dpipe.upload_buckets(ds)
    plain = list(dpipe.device_resident_batches(
        ds, 8, np.random.default_rng(123), dev_plain))

    dev_sh = dpipe.upload_buckets(ds, sharding=sh)
    sharded = list(dpipe.device_resident_batches(
        ds, 8, np.random.default_rng(123), dev_sh, sharding=sh))

    assert len(plain) == len(sharded) == 5
    for bp, bs in zip(plain, sharded):
        assert set(bp) == set(bs)
        for k in bp:
            v = bs[k]
            # pre-sharded over the data axis — zero per-batch bounce
            expect = pmesh.NamedSharding(mesh, P("data"))
            assert v.sharding.is_equivalent_to(expect, v.ndim), k
            np.testing.assert_array_equal(np.asarray(v), np.asarray(bp[k]))


def test_batch512_data_parallel_loss_identity(tmp_path):
    """BASELINE config 4 at spec: batch-512 data-parallel training (64 per
    device on the 8-device mesh) matches the single-device run's losses at
    equal global batch, through the mesh-native resident input path."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig, train,
    )

    rng = np.random.default_rng(1)
    n, L = 1024, 128
    clean = rng.normal(size=(n, L)).astype(np.float32)
    noisy = clean + rng.normal(size=(n, L)).astype(np.float32)

    base = dict(epochs=2, batch_size=512, base_ch=8, time_dim=16, depth=1,
                T=20, warmup_steps=2, bf16=False, seed=3, device_data=True)
    out1 = train(TrainConfig(model_dir=str(tmp_path / "a"),
                             data_parallel=False, **base),
                 dataset=dpipe.dataset_from_arrays(clean, noisy, fs=4096.0))
    out2 = train(TrainConfig(model_dir=str(tmp_path / "b"),
                             data_parallel=True, **base),
                 dataset=dpipe.dataset_from_arrays(clean, noisy, fs=4096.0))
    l1 = [h["avg_per_sample"] for h in out1["history"]]
    l2 = [h["avg_per_sample"] for h in out2["history"]]
    assert np.isfinite(l1).all()
    np.testing.assert_allclose(l2, l1, rtol=1e-4)
