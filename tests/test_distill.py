"""Progressive distillation (training/distill.py + gw-distill CLI).

Framework extension — no reference counterpart (the reference's only
sampler is the 200-step DDIM loop, ``inference.py:374-514``).  Covers the
teacher-ladder construction, the stage chain end-to-end on a tiny model,
the deployment-contract metadata, and the auto-knob resolution
(``apply_distilled_defaults``) + ``selfcond_mode='zero'`` sampler policy
the distilled checkpoints rely on.
"""
import argparse
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
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import (
    apply_distilled_defaults,
    load_model,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
    SamplerConfig,
    ddim_sample,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.schedules import (
    build_lambda_t_schedule,
    make_schedule,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training import (
    TrainConfig,
    train,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.training.distill import (
    DistillConfig,
    _teacher_ladder,
    distill,
)


@pytest.fixture(scope="module")
def tiny_dataset():
    cfg = SynthConfig(n=256, fs=1024, f_lower=20.0)
    n = 24
    rng = np.random.default_rng(7)
    m1 = jnp.asarray(rng.uniform(25, 35, n))
    m2 = jnp.asarray(rng.uniform(20, 30, n))
    snr = jnp.asarray(rng.uniform(10, 30, n))
    out = generate_batch(jax.random.PRNGKey(7), m1, m2, snr, config=cfg)
    scale = float(np.std(np.asarray(out["noisy"])))
    clean = np.asarray(out["signal"]) / scale
    noisy = np.asarray(out["noisy"]) / scale
    meta = np.stack([np.asarray(m1) / 80.0, np.asarray(m2) / 80.0,
                     np.zeros(n), np.zeros(n)], axis=1)
    return dpipe.dataset_from_arrays(clean, noisy, fs=cfg.fs, meta=meta)


@pytest.fixture(scope="module")
def tiny_teacher(tiny_dataset, tmp_path_factory):
    d = tmp_path_factory.mktemp("teacher")
    cfg = TrainConfig(model_dir=str(d), epochs=2, batch_size=8, lr=1e-3,
                      T=100, base_ch=8, time_dim=16, depth=2, seed=0,
                      t_min_frac=0.0, bf16=False, data_parallel=False)
    return train(cfg, dataset=tiny_dataset)["checkpoint"]


def test_teacher_ladder_interleaves_student_ladder():
    s = make_schedule(100, "cosine")
    for n_stud in (4, 8):
        tl = _teacher_ladder(s, n_stud, "lambda", 99)
        stud = np.asarray(build_lambda_t_schedule(s, n_stud, 99), np.int64)
        # the builder collapses duplicate timesteps on coarse T grids, so the
        # contract is 2x the DEPLOYMENT ladder, not 2x the requested count
        assert len(tl) == 2 * len(stud)
        # even entries ARE the deployment student ladder
        np.testing.assert_array_equal(tl[0::2], stud)
        # midpoints lie within their segment (descending ladder)
        for i in range(len(stud) - 1):
            assert stud[i + 1] <= tl[2 * i + 1] <= stud[i]
        # final midpoint: halfway to t=0 on the integer grid
        assert 0 <= tl[-1] <= stud[-1] if stud[-1] > 0 else tl[-1] == 0


def test_distill_chain_e2e(tiny_dataset, tiny_teacher, tmp_path):
    cfg = DistillConfig(
        teacher=tiny_teacher, data="", model_dir=str(tmp_path),
        steps_schedule=[8, 4], epochs_per_stage=2, batch_size=8,
        lr=1e-4, cfg_scale=1.5, ladder="lambda", start_t=99, seed=1,
        device_data=True, log_jsonl=str(tmp_path / "distill.jsonl"))
    res = distill(cfg, dataset=tiny_dataset)
    assert len(res["checkpoints"]) == 1
    path = res["checkpoints"][0]
    assert os.path.exists(path)
    losses = [h["loss"] for h in res["history"]]
    assert all(np.isfinite(l) for l in losses)

    # deployment contract recorded in the student checkpoint
    model, params, schedule, ck = load_model(path)
    assert int(ck["distilled_steps"]) == 4
    assert ck["selfcond_mode"] == "zero"
    assert float(ck["distilled_cfg_scale"]) == 1.5
    assert ck["distilled_ladder"] == "lambda"

    # the student samples end-to-end at its deployment knobs
    bucket = tiny_dataset.buckets[tiny_dataset.bucket_lengths[0]]
    y = jnp.asarray(bucket["noisy"][:1] / bucket["sigma"][0])
    meta_bc = jnp.broadcast_to(
        jnp.asarray(bucket["meta"][:1])[:, :, None], (1, 4, y.shape[-1]))
    cond = jnp.concatenate([y, meta_bc], axis=1)
    scfg = SamplerConfig(steps=4, cfg_scale=1.0, use_selfcond=True,
                         selfcond_mode="zero", ladder="lambda",
                         start_t=99, init_mode="noise",
                         pred_type=str(ck.get("pred_type", "eps")))
    x0 = ddim_sample(lambda p, x, t: model.apply(p, x, t), params,
                     schedule, cond, jax.random.PRNGKey(0), scfg)
    assert x0.shape == (1, 1, y.shape[-1])
    assert np.all(np.isfinite(np.asarray(x0)))


def test_steps_schedule_must_halve(tiny_teacher, tiny_dataset):
    cfg = DistillConfig(teacher=tiny_teacher, data="", model_dir="/tmp/x",
                        steps_schedule=[8, 3])
    with pytest.raises(ValueError, match="halve"):
        distill(cfg, dataset=tiny_dataset)


def test_apply_distilled_defaults_resolution():
    def ns():
        return argparse.Namespace(steps=None, cfg_scale=None, ladder=None,
                                  start_t=None)

    # plain checkpoint -> reference defaults
    a = ns()
    apply_distilled_defaults(a, {})
    assert a.steps == 200 and a.cfg_scale == 1.5
    assert a.ladder is None and a.start_t is None

    # distilled checkpoint -> recorded deployment contract, CFG neutralised
    ck = {"distilled_steps": 4, "distilled_ladder": "lambda",
          "distilled_start_t": 999, "distilled_cfg_scale": 1.5}
    a = ns()
    apply_distilled_defaults(a, ck)
    assert a.steps == 4 and a.cfg_scale == 1.0
    assert a.ladder == "lambda" and a.start_t == 999

    # explicit CLI values always win
    a = argparse.Namespace(steps=16, cfg_scale=2.0, ladder="t", start_t=500)
    apply_distilled_defaults(a, ck)
    assert a.steps == 16 and a.cfg_scale == 2.0
    assert a.ladder == "t" and a.start_t == 500


def test_selfcond_mode_zero_keeps_channel_zero():
    """With selfcond_mode='zero' the self-cond input channel must stay zero
    through the whole scan (distilled students never saw a non-zero one).

    The probe model echoes (selfcond channel + 1) as its x0 prediction:
    in 'update' mode the estimate compounds step over step (>1), in 'zero'
    mode every step sees sc=0 so the final x0 is exactly 1.
    """
    schedule = make_schedule(100, "cosine")
    cond = jnp.zeros((1, 1, 32))

    def probe(params, net_in, t):
        return net_in[:, -1:] + 1.0

    common = dict(steps=6, cfg_scale=1.0, use_selfcond=True,
                  pred_type="x0", init_mode="noise", start_t=99)
    x_zero = ddim_sample(probe, {}, schedule, cond, jax.random.PRNGKey(0),
                         SamplerConfig(selfcond_mode="zero", **common))
    x_upd = ddim_sample(probe, {}, schedule, cond, jax.random.PRNGKey(0),
                        SamplerConfig(selfcond_mode="update", **common))
    np.testing.assert_allclose(np.asarray(x_zero), 1.0, rtol=1e-5)
    assert float(np.asarray(x_upd).mean()) > 1.5
