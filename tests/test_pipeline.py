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


def test_max_len_left_truncates(ragged_h5):
    """max_len drops EARLY samples only: the right end (merger, per the
    LEFT-pad collation contract) of a truncated sample is bit-identical to
    the right end of the untruncated one, and no bucket exceeds max_len."""
    path, lengths = ragged_h5
    full = prepare_dataset(path)
    ds = prepare_dataset(path, max_len=2048)
    assert max(ds.bucket_lengths) <= 2048
    assert sum(b["clean"].shape[0] for b in ds.buckets.values()) == len(lengths)
    # sample index 5 has length 3000 -> truncated to its last 2048 samples
    i_full = list(full.buckets[4096]["index"]).index(5)
    i_tr = list(ds.buckets[2048]["index"]).index(5)
    np.testing.assert_array_equal(
        ds.buckets[2048]["clean"][i_tr, 0, :],          # fills the bucket
        full.buckets[4096]["clean"][i_full, 0, -2048:])
    # mask covers the whole truncated sample (no pad)
    assert ds.buckets[2048]["mask"][i_tr, 0].sum() == 2048


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


# ---------------------------------------------------------------------------
# StreamingDataset (larger-than-RAM path)
# ---------------------------------------------------------------------------

def test_streaming_matches_dense(ragged_h5):
    """Every sample the streaming path yields is bit-identical to the dense
    ahead-of-time path (same _prep_sample math, same left-pad bucketing)."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        StreamingDataset,
    )

    path, _ = ragged_h5
    dense = prepare_dataset(path, whiten=True, sigma_mode="std")
    stream = StreamingDataset(path, whiten=True, sigma_mode="std", chunk=2)
    assert stream.bucket_lengths == dense.bucket_lengths
    assert stream.n == dense.n
    assert num_batches(stream, 2) == num_batches(dense, 2)

    # collect streamed samples by original index
    got = {}
    for b in iterate_batches(stream, 2, np.random.default_rng(0),
                             shuffle=False, drop_remainder=False):
        for j, idx in enumerate(np.asarray(b["index"])):
            got[int(idx)] = {k: np.asarray(v[j]) for k, v in b.items()
                             if k != "index"}
    for Lb in dense.bucket_lengths:
        bk = dense.buckets[Lb]
        for j, idx in enumerate(np.asarray(bk["index"])):
            g = got[int(idx)]
            np.testing.assert_array_equal(g["clean"], bk["clean"][j])
            np.testing.assert_array_equal(g["noisy"], bk["noisy"][j])
            np.testing.assert_array_equal(g["mask"], bk["mask"][j])
            np.testing.assert_array_equal(g["sigma"], bk["sigma"][j])
            np.testing.assert_array_equal(g["meta"], bk["meta"][j])


def test_streaming_bounded_memory_and_shuffle(ragged_h5):
    """Host memory stays bounded by chunk*cache_chunks prepared samples even
    across multiple shuffled epochs; every sample appears once per epoch."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        StreamingDataset,
    )

    path, _ = ragged_h5
    stream = StreamingDataset(path, chunk=2, cache_chunks=1)
    rng = np.random.default_rng(1)
    for _ in range(3):
        seen = []
        for b in iterate_batches(stream, 2, rng, shuffle=True,
                                 drop_remainder=True):
            assert b["clean"].shape[0] == 2
            seen.extend(np.asarray(b["index"]).tolist())
        # drop_remainder: odd buckets lose their tail, but no duplicates
        assert len(seen) == len(set(seen))
    assert stream.peak_live_samples <= 2 * 1


def test_streaming_train_e2e(ragged_h5):
    """The trainer runs end to end on a StreamingDataset (cfg.streaming)."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig,
        train,
    )

    path, _ = ragged_h5
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        cfg = TrainConfig(
            data=path, model_dir=os.path.join(d, "m"), epochs=2,
            batch_size=2, base_ch=8, time_dim=16, depth=1, T=20,
            t_min_frac=0.0, bf16=False, ema=True, warmup_steps=2,
            data_parallel=False, streaming=True, stream_chunk=2,
            p_selfcond=0.0,
        )
        out = train(cfg)
        assert np.isfinite(out["history"][-1]["avg_per_sample"])


def test_device_resident_batches_match_host_path():
    """upload_buckets + device_resident_batches must reproduce EXACTLY the
    batch schedule and contents of iterate_batches under the same rng seed
    (the trainer switches between them transparently)."""
    import numpy as np

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        dataset_from_arrays,
        device_resident_batches,
        iterate_batches,
        upload_buckets,
    )

    rng0 = np.random.default_rng(7)
    clean = rng0.normal(size=(13, 64)).astype(np.float32)
    noisy = clean + rng0.normal(size=(13, 64)).astype(np.float32)
    ds = dataset_from_arrays(clean, noisy, fs=64.0)

    dev = upload_buckets(ds)
    assert dev is not None
    host = list(iterate_batches(ds, 4, np.random.default_rng(3)))
    devb = list(device_resident_batches(ds, 4, np.random.default_rng(3), dev))
    assert len(host) == len(devb)
    for hb, db in zip(host, devb):
        for k in hb:
            if k == "index":
                continue
            np.testing.assert_array_equal(hb[k], np.asarray(db[k]), err_msg=k)


def test_upload_buckets_budget_guard_and_streaming():
    import numpy as np

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        dataset_from_arrays,
        upload_buckets,
    )

    clean = np.zeros((4, 64), np.float32)
    ds = dataset_from_arrays(clean, clean.copy(), fs=64.0)
    assert upload_buckets(ds, budget_bytes=1) is None       # too big -> host path

    class FakeStreaming:
        pass

    assert upload_buckets(FakeStreaming()) is None           # no .buckets


def test_streaming_device_residency_compose(ragged_h5):
    """iter_batches_device (VERDICT r2 item 7): bit-identical batches to the
    host streaming path, chunks cached in HBM after the first epoch (zero
    steady-state H2D), bounded host RSS, budget fallback to transient
    uploads."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        StreamingDataset,
    )

    path, _ = ragged_h5
    host = StreamingDataset(path, whiten=True, sigma_mode="std", chunk=2,
                            cache_chunks=1)
    dev = StreamingDataset(path, whiten=True, sigma_mode="std", chunk=2,
                           cache_chunks=1)

    h_batches = list(host.iter_batches(2, np.random.default_rng(7)))
    d_batches = list(dev.iter_batches_device(2, np.random.default_rng(7)))
    assert len(h_batches) == len(d_batches) > 0
    for hb, db in zip(h_batches, d_batches):
        for k in ("clean", "noisy", "mask", "sigma", "meta"):
            np.testing.assert_array_equal(np.asarray(db[k]), hb[k]), k

    # epoch 1 uploaded everything once; epoch 2 is fully HBM-cached
    assert dev.h2d_bytes_epoch > 0
    first_epoch_bytes = dev.h2d_bytes_epoch
    _ = list(dev.iter_batches_device(2, np.random.default_rng(8)))
    assert dev.h2d_bytes_epoch == 0          # zero steady-state H2D

    # host RSS stays bounded by the chunk cache, not the dataset
    assert dev.peak_live_samples <= 2 * dev.cache_chunks + 2

    # tiny budget -> nothing cached -> every epoch re-uploads (but still
    # bounded host memory and a working iterator)
    small = StreamingDataset(path, whiten=True, sigma_mode="std", chunk=2)
    _ = list(small.iter_batches_device(2, np.random.default_rng(7),
                                       budget_bytes=1))
    e1 = small.h2d_bytes_epoch
    _ = list(small.iter_batches_device(2, np.random.default_rng(8),
                                       budget_bytes=1))
    assert small.h2d_bytes_epoch > 0 and e1 > 0
    assert len(small._dev_chunks) == 0
    assert first_epoch_bytes > 0


def test_streaming_device_trainer_e2e(ragged_h5, tmp_path):
    """cfg.streaming + cfg.device_data composes in the trainer."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig, train,
    )

    path, _ = ragged_h5
    cfg = TrainConfig(data=path, model_dir=str(tmp_path / "m"), epochs=1,
                      batch_size=2, base_ch=8, time_dim=16, depth=1, T=20,
                      warmup_steps=2, bf16=False, data_parallel=False,
                      whiten=True, streaming=True, stream_chunk=2,
                      device_data=True)
    out = train(cfg)
    assert np.isfinite(out["history"][0]["avg_per_sample"])
