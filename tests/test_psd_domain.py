"""Whitening-domain integrity: derived model PSDs + resolved-domain contract.

Round-3 postmortem (VERDICT r3 weak-point 1/2): corpora generated without
``--save-psd`` carry no per-sample model PSD, and an explicit
``whiten_mode='model'`` silently degraded to train-like whitening while the
checkpoint recorded 'model'.  These tests pin the fix:

- the analytic aLIGO-ZDHP PSD is re-derivable from the stored grid scalars
  (``psd_len/psd_df/psd_f_lower``, written by every dataset — ref
  ``gen.py:170-177``) and matches a ``--save-psd`` file;
- every load path (dense, streaming, single-measurement) derives it;
- fallbacks are LOUD and the resolved domain is recorded everywhere
  (checkpoint args, PreparedDataset, inherit helper).
"""
import json
import os
import types

import h5py
import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data import (
    hdf5io, pipeline as dpipe)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import (
    inherit_whiten_domain, prepare_measurement)


@pytest.fixture(scope="module")
def gen_pair(tmp_path_factory):
    """A tiny dataset WITH saved PSDs + a stripped copy WITHOUT them."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.gen import (
        main as gen_main)
    d = tmp_path_factory.mktemp("psd")
    saved = str(d / "saved.h5")
    gen_main(["--mode", "random", "--num-samples", "4", "--seed", "3",
              "--output-path", saved, "--save-psd"])
    bare = str(d / "bare.h5")
    import shutil
    shutil.copy(saved, bare)
    with h5py.File(bare, "a") as f:
        for k in ("psd", "psd_model", "psd_welch", "psd_welch_freqs"):
            if k in f:
                del f[k]
        f.attrs["psd_saved"] = False
    return saved, bare


def test_derived_psd_matches_saved(gen_pair):
    saved, _ = gen_pair
    with h5py.File(saved, "r") as f:
        P_saved = np.asarray(f["psd_model"][0], np.float64)
        P_der = hdf5io.derive_model_psd_np(
            f["psd_len"][0], f["psd_df"][0], f["psd_f_lower"][0])
    assert P_saved.shape == P_der.shape
    # stored PSDs passed through f32 on the synthesis path; derivation is f64
    m = P_saved > 0
    assert (P_der[~m] == 0).all()
    assert np.max(np.abs(P_der[m] - P_saved[m]) / P_saved[m]) < 1e-5


def test_derived_psd_cache_shares_arrays():
    a = hdf5io.derive_model_psd_np(2049, 1.0, 20.0)
    b = hdf5io.derive_model_psd_np(2049, 1.0, 20.0)
    assert a is b                       # one array per grid, not per sample
    assert not a.flags.writeable        # shared -> must be immutable


def test_prepare_dataset_derived_equals_saved(gen_pair):
    saved, bare = gen_pair
    a = dpipe.prepare_dataset(saved, whiten=True, whiten_mode="model")
    b = dpipe.prepare_dataset(bare, whiten=True, whiten_mode="model")
    assert a.whiten_mode_resolved == "model"
    assert b.whiten_mode_resolved == "model"
    for L in a.bucket_lengths:
        ya, yb = a.buckets[L]["noisy"], b.buckets[L]["noisy"]
        scale = np.abs(ya).max()
        assert np.abs(ya - yb).max() / scale < 1e-5
        np.testing.assert_allclose(a.buckets[L]["sigma"],
                                   b.buckets[L]["sigma"], rtol=1e-5)


def test_streaming_derives_and_matches_dense(gen_pair):
    _, bare = gen_pair
    dense = dpipe.prepare_dataset(bare, whiten=True, whiten_mode="model")
    stream = dpipe.StreamingDataset(bare, whiten=True, whiten_mode="model",
                                    chunk=2)
    assert stream.whiten_mode_resolved == "model"
    for L in dense.bucket_lengths:
        n = len(dense.buckets[L]["sigma"])
        got = np.concatenate(
            [stream._load_chunk(L, ci)["noisy"]
             for ci in range(-(-n // 2))])[:n]
        np.testing.assert_array_equal(got, dense.buckets[L]["noisy"])


def test_explicit_model_mode_fallback_is_loud(gen_pair, capsys):
    """No PSD and no grid scalars: explicit 'model' degrades LOUDLY to
    'train' and the resolved domain says so."""
    _, bare = gen_pair
    import shutil
    nogrid = bare.replace("bare.h5", "nogrid.h5")
    shutil.copy(bare, nogrid)
    with h5py.File(nogrid, "a") as f:
        for k in ("psd_len", "psd_df", "psd_f_lower"):
            del f[k]
    ds = dpipe.prepare_dataset(nogrid, whiten=True, whiten_mode="model")
    assert ds.whiten_mode_resolved == "train"
    err = capsys.readouterr().err
    assert "WARNING" in err and "TRAIN-LIKE" in err
    st = dpipe.StreamingDataset(nogrid, whiten=True, whiten_mode="model")
    assert st.whiten_mode_resolved == "train"


def test_load_measurement_derives_psd(gen_pair):
    _, bare = gen_pair
    y, clean, fs, P, welch, meta = hdf5io.load_measurement(bare, 1)
    assert P is not None
    assert meta.get("psd_model_source", "").startswith("derived")
    prep = prepare_measurement(
        y, clean, fs, P, welch, meta, cond_in_ch=5,
        whiten=True, whiten_mode="model")
    assert prep["whiten_kind_used"] == "model"
    assert prep["P_model_used"] is not None   # mf_ratio becomes computable


def test_checkpoint_args_record_resolved_domain():
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.train import (
        TrainConfig, checkpoint_args)
    cfg = TrainConfig(data="x.h5", whiten=True, whiten_mode="model")
    d = checkpoint_args(cfg, 7, 5, 4, {"M": 80.0, "q": 10.0},
                        whiten_mode_resolved="train")
    assert d["whiten_mode"] == "model"
    assert d["whiten_mode_resolved"] == "train"


def _args(**kw):
    ns = types.SimpleNamespace(whiten=None, whiten_mode=None,
                               allow_domain_mismatch=False)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_inherit_prefers_resolved_domain(capsys):
    ck = {"whiten": True, "whiten_mode": "model",
          "whiten_mode_resolved": "train"}
    a = _args()
    inherit_whiten_domain(a, ck)
    assert a.whiten == 1 and a.whiten_mode == "train"
    assert "TRAINED in 'train'" in capsys.readouterr().err


def test_inherit_mismatch_raises_unless_allowed():
    ck = {"whiten": True, "whiten_mode": "model",
          "whiten_mode_resolved": "model"}
    with pytest.raises(ValueError, match="domain"):
        inherit_whiten_domain(_args(whiten=1, whiten_mode="train"), ck)
    a = _args(whiten=1, whiten_mode="train", allow_domain_mismatch=True)
    inherit_whiten_domain(a, ck)          # no raise
    assert a.whiten_mode == "train"
    # 'auto' and the matching mode are never a mismatch
    inherit_whiten_domain(_args(whiten=1, whiten_mode="auto"), ck)
    inherit_whiten_domain(_args(whiten=1, whiten_mode="model"), ck)


def test_inherit_legacy_checkpoint_unchanged():
    """Pre-r4 checkpoints (no resolved field) keep the old inheritance."""
    ck = {"whiten": True, "whiten_mode": "model"}
    a = _args()
    inherit_whiten_domain(a, ck)
    assert a.whiten_mode == "model"
