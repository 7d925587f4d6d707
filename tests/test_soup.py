"""Checkpoint weight averaging (utils.checkpoint.average_checkpoints +
gw-soup CLI).

Framework extension — no reference counterpart (the reference saves one
``.pth`` per run, ``train.py:606-630``).  Covers exact-mean semantics,
self-soup identity, weighted averaging, architecture-mismatch rejection,
and that the CLI output round-trips through the standard model loader.
"""
import copy
import json
import os

import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli.soup import main as soup_main
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import load_model
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.utils.checkpoint import (
    average_checkpoints,
    load_checkpoint,
    save_checkpoint,
)

ARGS = {"base_ch": 8, "in_ch": 3, "cond_in_ch": 1, "T": 100,
        "schedule": "cosine", "pred_type": "eps", "time_dim": 16,
        "depth": 2, "meta_scale": {"M": 80.0, "q": 10.0}}


def _state(seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return {"layer": {"kernel": scale * rng.normal(size=(3, 4)).astype(np.float32),
                      "bias": scale * rng.normal(size=(4,)).astype(np.float32)}}


def _write(path, seed, scale=1.0, args=None, ema=True):
    st = _state(seed, scale)
    save_checkpoint(str(path), st, dict(args or ARGS), epoch=int(seed),
                    model_ema_state=_state(seed + 100, scale) if ema else None)
    return st


def test_self_soup_is_identity(tmp_path):
    a = tmp_path / "a.msgpack"
    st = _write(a, 1)
    out = average_checkpoints([str(a), str(a)])
    np.testing.assert_array_equal(out["model_state"]["layer"]["kernel"],
                                  st["layer"]["kernel"])


def test_exact_mean_and_weights(tmp_path):
    a, b = tmp_path / "a.msgpack", tmp_path / "b.msgpack"
    sa, sb = _write(a, 1), _write(b, 2)
    out = average_checkpoints([str(a), str(b)])
    np.testing.assert_allclose(
        out["model_state"]["layer"]["kernel"],
        0.5 * (sa["layer"]["kernel"] + sb["layer"]["kernel"]), rtol=1e-6)
    # weighted: weights normalise, (3,1) -> 0.75/0.25
    out_w = average_checkpoints([str(a), str(b)], weights=[3.0, 1.0])
    np.testing.assert_allclose(
        out_w["model_state"]["layer"]["bias"],
        0.75 * sa["layer"]["bias"] + 0.25 * sb["layer"]["bias"], rtol=1e-6)
    # provenance + epoch=max
    assert out["args"]["soup_members"] == ["a.msgpack", "b.msgpack"]
    assert out["epoch"] == 2
    # EMA averaged too (both members carry one)
    assert "model_ema_state" in out


def test_arch_mismatch_rejected(tmp_path):
    a, b = tmp_path / "a.msgpack", tmp_path / "b.msgpack"
    _write(a, 1)
    args2 = dict(ARGS, base_ch=16)
    _write(b, 2, args=args2)
    with pytest.raises(ValueError, match="base_ch"):
        average_checkpoints([str(a), str(b)])


def test_shape_mismatch_rejected(tmp_path):
    a, b = tmp_path / "a.msgpack", tmp_path / "b.msgpack"
    _write(a, 1)
    st = {"layer": {"kernel": np.zeros((5, 4), np.float32),
                    "bias": np.zeros((4,), np.float32)}}
    save_checkpoint(str(b), st, dict(ARGS), epoch=2,
                    model_ema_state=st)
    with pytest.raises(ValueError, match="shape"):
        average_checkpoints([str(a), str(b)])


def test_needs_two_members(tmp_path):
    a = tmp_path / "a.msgpack"
    _write(a, 1)
    with pytest.raises(ValueError, match="at least 2"):
        average_checkpoints([str(a)])


def test_cli_roundtrip_through_loader(tmp_path):
    """gw-soup output loads through the standard inference loader (real tiny
    U-Net checkpoints, EMA preferred) and equals the member mean."""
    import jax
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.models.unet import UNet1D

    model = UNet1D(base_ch=8, in_ch=3, cond_in_ch=1, time_dim=16, depth=2)
    paths = []
    states = []
    for i in (0, 1):
        key = jax.random.PRNGKey(i)
        params = model.init(key, np.zeros((1, 3, 64), np.float32),
                            np.zeros((1,), np.int32))
        st = jax.tree_util.tree_map(np.asarray, params)
        p = tmp_path / f"m{i}.msgpack"
        save_checkpoint(str(p), st, dict(ARGS), epoch=i, model_ema_state=st)
        paths.append(str(p))
        states.append(st)
    out_path = str(tmp_path / "soup.msgpack")
    rc = soup_main(["--inputs", *paths, "--output", out_path])
    assert rc == 0
    loaded_model, loaded_params, schedule, ck = load_model(out_path)
    assert ck["soup_members"] == ["m0.msgpack", "m1.msgpack"]
    mean_leaf = 0.5 * (
        jax.tree_util.tree_leaves(states[0])[0]
        + jax.tree_util.tree_leaves(states[1])[0])
    np.testing.assert_allclose(jax.tree_util.tree_leaves(loaded_params)[0],
                               mean_leaf, rtol=1e-6)
    # sidecar json written
    assert os.path.exists(out_path + ".args.json")
    side = json.load(open(out_path + ".args.json"))
    assert side["soup_weights"] == [1.0, 1.0]
