"""tools/merge_h5.py: stream-concatenation of gw-gen HDF5 datasets."""
import sys
from pathlib import Path

import h5py
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from tools.merge_h5 import main as merge_main  # noqa: E402

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.hdf5io import (  # noqa: E402
    write_dataset,
)


def _make(path, rng, n, extra_key=None):
    lengths = rng.integers(800, 2000, size=n)
    signal = [rng.normal(size=L).astype(np.float32) for L in lengths]
    noise = [rng.normal(size=L).astype(np.float32) for L in lengths]
    noisy = [s + x for s, x in zip(signal, noise)]
    times = [np.arange(L) / 4096.0 for L in lengths]
    meta = {"mass1": rng.uniform(20, 50, n), "mass2": rng.uniform(20, 50, n),
            "spin1z": np.zeros(n), "spin2z": np.zeros(n),
            "q": np.ones(n), "chirp_mass": np.full(n, 23.9),
            "snr": np.full(n, 10.0)}
    write_dataset(str(path), signal, noise, noisy, times, meta, 4096.0)
    if extra_key:
        with h5py.File(path, "a") as f:
            f.create_dataset(extra_key, data=np.zeros(n, np.float32))
    return signal, meta


def test_merge_concat_and_key_intersection(tmp_path, rng):
    p1, p2, out = tmp_path / "a.h5", tmp_path / "b.h5", tmp_path / "m.h5"
    sig1, meta1 = _make(p1, rng, 5, extra_key="psd_welch")
    sig2, meta2 = _make(p2, rng, 3)
    merge_main(str(out), [str(p1), str(p2)])
    with h5py.File(out, "r") as f:
        assert f["lengths"].shape[0] == 8
        # extra key present in only one input is dropped
        assert "psd_welch" not in f
        # vlen rows bitwise-preserved across the boundary
        assert np.array_equal(f["signal"][0], sig1[0])
        assert np.array_equal(f["signal"][4], sig1[4])
        assert np.array_equal(f["signal"][5], sig2[0])
        assert np.array_equal(f["signal"][7], sig2[2])
        # scalars concatenated in order
        assert np.allclose(f["mass1"][:5], meta1["mass1"].astype(np.float32))
        assert np.allclose(f["mass1"][5:], meta2["mass1"].astype(np.float32))
        # provenance attr
        assert "merged_from" in f.attrs
        # attrs inherited from the first input
        assert float(f.attrs["sampling_rate"]) == 4096.0


def test_merge_rejects_fs_mismatch(tmp_path, rng):
    p1, p2, out = tmp_path / "a.h5", tmp_path / "b.h5", tmp_path / "m.h5"
    _make(p1, rng, 2)
    _make(p2, rng, 2)
    with h5py.File(p2, "a") as f:
        f.attrs["sampling_rate"] = 8192.0
        f.attrs["delta_t"] = 1.0 / 8192.0
    with pytest.raises(ValueError):
        merge_main(str(out), [str(p1), str(p2)])


def test_gw_merge_cli(tmp_path, rng, capsys):
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.merge import (
        main as cli_main,
    )
    p1, p2, out = tmp_path / "a.h5", tmp_path / "b.h5", tmp_path / "m.h5"
    _make(p1, rng, 3)
    _make(p2, rng, 2)
    cli_main(["--output-path", str(out), str(p1), str(p2)])
    assert "wrote 5 samples" in capsys.readouterr().out
    with h5py.File(out, "r") as f:
        assert f["lengths"].shape[0] == 5


def test_merge_equal_length_vlen_rows(tmp_path, rng):
    """Equal-length vlen rows (e.g. psd_welch: fixed nperseg -> every row
    2049 bins) collapse to a 2-D array inside h5py's chunked assignment and
    used to crash the merge with 'Can't broadcast (N, L) -> (N,)'."""
    p1, p2, out = tmp_path / "a.h5", tmp_path / "b.h5", tmp_path / "m.h5"
    _make(p1, rng, 4)
    _make(p2, rng, 3)
    for p, n in ((p1, 4), (p2, 3)):
        with h5py.File(p, "a") as f:
            dt = h5py.special_dtype(vlen=np.dtype("float64"))
            d = f.create_dataset("psd_welch", shape=(n,), dtype=dt)
            for i in range(n):  # every row the SAME length
                d[i] = np.full(33, float(i), np.float64)
    merge_main(str(out), [str(p1), str(p2)])
    with h5py.File(out, "r") as f:
        assert f["psd_welch"].shape[0] == 7
        assert np.array_equal(f["psd_welch"][3], np.full(33, 3.0))
        assert np.array_equal(f["psd_welch"][4], np.full(33, 0.0))
        assert all(len(f["psd_welch"][i]) == 33 for i in range(7))


def test_merge_warns_on_generator_domain_mismatch(tmp_path, rng, capsys):
    """Mixing corpora with different below-band tapers / merger attachments
    silently mixes waveform domains (CLAUDE.md trap; measured end-to-end
    taper A/B in RESULTS.md) — gw-merge warns but does not refuse."""
    import json

    p1, p2, out = tmp_path / "a.h5", tmp_path / "b.h5", tmp_path / "m.h5"
    _make(p1, rng, 2)
    _make(p2, rng, 2)
    with h5py.File(p1, "a") as f:
        f.attrs["config_args"] = json.dumps(
            {"approximant": "pn", "ringdown": "qnm", "f_taper_frac": 1.0})
    with h5py.File(p2, "a") as f:
        f.attrs["config_args"] = json.dumps(
            {"approximant": "pn", "ringdown": "qnm_c1", "f_taper_frac": 0.85})
    merge_main(str(out), [str(p1), str(p2)])
    err = capsys.readouterr().err
    assert "ringdown" in err and "f_taper_frac" in err
    assert "mixes" in err
    with h5py.File(out, "r") as f:
        assert f["lengths"].shape[0] == 4  # merge still happens


def test_merge_no_warning_when_domains_match(tmp_path, rng, capsys):
    import json

    p1, p2, out = tmp_path / "a.h5", tmp_path / "b.h5", tmp_path / "m.h5"
    _make(p1, rng, 2)
    _make(p2, rng, 2)
    cfg = json.dumps({"approximant": "pn", "ringdown": "qnm",
                      "f_taper_frac": 0.85, "f_lower": 20.0})
    for p in (p1, p2):
        with h5py.File(p, "a") as f:
            f.attrs["config_args"] = cfg
    merge_main(str(out), [str(p1), str(p2)])
    assert "mixes" not in capsys.readouterr().err
