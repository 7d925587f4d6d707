"""Host pipeline: bucketing, left-pad convention, batching, prefetch."""
import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
    PreparedDataset,
    dataset_from_arrays,
    iterate_batches,
    next_pow2,
    num_batches,
    prefetch_to_device,
    prepare_dataset,
)


def test_next_pow2():
    assert next_pow2(1) == 1
    assert next_pow2(1000) == 1024
    assert next_pow2(1024) == 1024
    assert next_pow2(1025) == 2048


@pytest.fixture
def ragged_h5(tmp_path, rng):
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.hdf5io import (
        write_dataset,
    )

    lengths = [900, 1000, 1024, 1500, 2048, 3000]
    signal = [rng.normal(size=n).astype(np.float32) for n in lengths]
    noise = [rng.normal(size=n).astype(np.float32) for n in lengths]
    noisy = [s + x for s, x in zip(signal, noise)]
    times = [np.arange(n) / 4096.0 for n in lengths]
    meta = {"mass1": [30.0] * 6, "mass2": [25.0] * 6,
            "spin1z": [0.0] * 6, "spin2z": [0.0] * 6,
            "q": [1.2] * 6, "chirp_mass": [23.9] * 6, "snr": [10.0] * 6}
    path = str(tmp_path / "ragged.h5")
    write_dataset(path, signal, noise, noisy, times, meta, 4096.0)
    return path, lengths


def test_bucketing_and_left_pad(ragged_h5):
    path, lengths = ragged_h5
    ds = prepare_dataset(path)
    # 900/1000/1024 -> 1024; 1500/2048 -> 2048; 3000 -> 4096
    assert ds.bucket_lengths == [1024, 2048, 4096]
    assert ds.buckets[1024]["clean"].shape == (3, 1, 1024)
    # LEFT padding: mask zeros at the START, data at the end
    m = ds.buckets[1024]["mask"]
    i900 = list(ds.buckets[1024]["index"]).index(0)   # the 900-length sample
    assert m[i900, 0, :124].sum() == 0
    assert m[i900, 0, 124:].sum() == 900


def test_bucket_lengths_explicit(ragged_h5):
    path, _ = ragged_h5
    ds = prepare_dataset(path, bucket_lengths=[4096])
    assert ds.bucket_lengths == [4096]
    assert ds.buckets[4096]["clean"].shape[0] == 6
    with pytest.raises(ValueError):
        prepare_dataset(path, bucket_lengths=[1024])


def test_max_samples(ragged_h5):
    path, _ = ragged_h5
    ds = prepare_dataset(path, max_samples=2)
    assert ds.n == 2


def test_iterate_batches_static_shapes(rng):
    clean = rng.normal(size=(10, 64)).astype(np.float32)
    ds = dataset_from_arrays(clean, clean + 1.0, fs=4096.0)
    shapes = set()
    count = 0
    for b in iterate_batches(ds, 4, np.random.default_rng(0)):
        shapes.add(b["clean"].shape)
        count += 1
    # wrap-around fill keeps every batch the same static shape
    assert shapes == {(4, 1, 64)}
    assert count == num_batches(ds, 4) == 3


def test_prefetch_to_device_preserves_order(rng):
    clean = rng.normal(size=(8, 32)).astype(np.float32)
    ds = dataset_from_arrays(clean, clean, fs=4096.0)
    direct = list(iterate_batches(ds, 4, np.random.default_rng(7)))
    fetched = list(prefetch_to_device(
        iterate_batches(ds, 4, np.random.default_rng(7))))
    assert len(direct) == len(fetched)
    for d, f in zip(direct, fetched):
        np.testing.assert_allclose(np.asarray(f["clean"]), d["clean"])
        assert "index" not in f
