"""Sampler algebra tests with an analytically known 'oracle' model.

If the model returns the TRUE eps that generated x_t, DDIM with eta=0 must
recover x0 exactly in one step and stay on it — this checks the update
algebra independently of any learned network.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops import make_schedule
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
    SamplerConfig,
    ddim_sample,
    ddpm_sample,
    one_step_proxy,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule(100, "cosine")


def _oracle_model_for(x0):
    """model_fn returning the exact eps implied by (x_t, x0, t)."""

    def model_fn(params, net_in, t):
        x_t = net_in[:, :1, :]
        B = x_t.shape[0]
        x0b = jnp.broadcast_to(x0, x_t.shape)
        ab = params["ab"][t].reshape(-1, 1, 1)
        return (x_t - jnp.sqrt(ab) * x0b) / jnp.sqrt(jnp.clip(1 - ab, 1e-12))

    return model_fn


def test_ddim_oracle_recovers_x0(sched):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 64))
    cond = jnp.zeros((1, 1, 64))
    cfg = SamplerConfig(steps=20, eta=0.0, cfg_scale=1.0, use_selfcond=False,
                        init_mode="noise")
    model_fn = _oracle_model_for(x0)
    params = {"ab": sched.alpha_bar}
    out = ddim_sample(model_fn, params, sched, cond, key, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_ddpm_oracle_recovers_x0(sched):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 64))
    cond = jnp.zeros((1, 1, 64))
    cfg = SamplerConfig(steps=100, eta=0.0, cfg_scale=1.0, use_selfcond=False,
                        init_mode="noise")
    model_fn = _oracle_model_for(x0)
    out = ddpm_sample(model_fn, {"ab": sched.alpha_bar}, sched, cond, key, cfg)
    # ancestral noise perturbs intermediate steps, but the oracle re-aims at
    # x0 each step and the last step returns x0_hat exactly
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-2, atol=1e-2)


def test_ddim_batch_shapes(sched):
    model_fn = _oracle_model_for(jnp.zeros((1, 1, 32)))
    cond = jnp.zeros((5, 2, 32))  # with meta channel
    cfg = SamplerConfig(steps=5, cfg_scale=1.5, use_selfcond=True)
    out = ddim_sample(model_fn, {"ab": sched.alpha_bar}, sched, cond,
                      jax.random.PRNGKey(0), cfg)
    assert out.shape == (5, 1, 32)


def test_ddim_diagnostics(sched):
    model_fn = _oracle_model_for(jnp.zeros((1, 1, 32)))
    cond = jnp.ones((2, 1, 32))
    cfg = SamplerConfig(steps=8, cfg_scale=1.0, use_selfcond=False)
    out, diag = ddim_sample(model_fn, {"ab": sched.alpha_bar}, sched, cond,
                            jax.random.PRNGKey(0), cfg, collect_diagnostics=True)
    N = diag["t"].shape[0]
    assert diag["alpha_bar"].shape == (N,)
    assert diag["corr"].shape == (N, 2)
    assert int(diag["t"][-1]) == 0


def test_ddim_dc_weight_pulls_to_y(sched):
    """dc_weight=1 forces x0_hat = y each step -> output == y."""
    y = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 32))
    model_fn = _oracle_model_for(jnp.zeros((1, 1, 32)))
    cfg = SamplerConfig(steps=10, dc_weight=1.0, cfg_scale=1.0, use_selfcond=False)
    out = ddim_sample(model_fn, {"ab": sched.alpha_bar}, sched, y,
                      jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y), rtol=1e-4, atol=1e-5)


def test_ddim_eta_stochastic_differs(sched):
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 64))
    model_fn = _oracle_model_for(x0)
    cond = jnp.zeros((1, 1, 64))
    cfg0 = SamplerConfig(steps=20, eta=0.0, cfg_scale=1.0, use_selfcond=False)
    cfg1 = SamplerConfig(steps=20, eta=1.0, cfg_scale=1.0, use_selfcond=False)
    a = ddim_sample(model_fn, {"ab": sched.alpha_bar}, sched, cond,
                    jax.random.PRNGKey(0), cfg0)
    b = ddim_sample(model_fn, {"ab": sched.alpha_bar}, sched, cond,
                    jax.random.PRNGKey(0), cfg1)
    # with an oracle both still land on x0 at the end (last step uses
    # ab_prev=1 -> returns x0_hat), so check they agree on the target
    np.testing.assert_allclose(np.asarray(a), np.asarray(x0), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_oracle_init_and_y_blend_init(sched):
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 32))
    model_fn = _oracle_model_for(x0)
    cond = jnp.ones((1, 1, 32))
    for mode in ["scaled-noise", "y-blend"]:
        cfg = SamplerConfig(steps=5, init_mode=mode, cfg_scale=1.0,
                            use_selfcond=False, start_t=50)
        out = ddim_sample(model_fn, {"ab": sched.alpha_bar}, sched, cond,
                          jax.random.PRNGKey(0), cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3,
                                   atol=1e-4)
    cfg = SamplerConfig(steps=5, oracle_init=True, cfg_scale=1.0, use_selfcond=False,
                        start_t=50)
    out = ddim_sample(model_fn, {"ab": sched.alpha_bar}, sched, cond,
                      jax.random.PRNGKey(0), cfg, clean_norm=x0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_one_step_proxy_oracle(sched):
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 32))
    model_fn = _oracle_model_for(x0)
    cond = jnp.ones((1, 1, 32))
    cfg = SamplerConfig(cfg_scale=1.0, use_selfcond=False)
    out = one_step_proxy(model_fn, {"ab": sched.alpha_bar}, sched, x0, cond,
                         jax.random.PRNGKey(0), target_snr=5.0, cfg=cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_cfg_guided_combination(sched):
    """With cfg weight w, output = out_u + w (out_c - out_u): check against a
    model whose cond/uncond outputs differ deterministically."""

    def model_fn(params, net_in, t):
        # output = mean of cond channel, broadcast: uncond input (y zeroed)
        # returns 0, cond input returns 1
        y = net_in[:, 1:2, :]
        return jnp.broadcast_to(y.mean(axis=-1, keepdims=True), y.shape)

    cond = jnp.ones((1, 1, 16))
    w = 2.0
    cfg = SamplerConfig(steps=1, start_t=50, cfg_scale=w, cfg_mode="const",
                        use_selfcond=False, pred_type="x0", init_mode="noise")
    out = ddim_sample(model_fn, {}, sched, cond, jax.random.PRNGKey(0), cfg)
    # out_c = 1, out_u = 0 -> guided x0 = w = 2.0 everywhere
    np.testing.assert_allclose(np.asarray(out), w, rtol=1e-5)


def test_lagged_xcorr_matches_host_and_finds_shift():
    """On-device lag-corrected xcorr (the ddim_step JSONL diagnostic,
    ref inference.py:491-512) recovers a known integer shift and agrees with
    the host FFT lag search in evals.metrics."""
    import numpy as np
    import jax.numpy as jnp
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        lagged_xcorr,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.evals.metrics import (
        best_lag_xcorr,
    )

    rng = np.random.default_rng(0)
    L, shift = 512, 37
    base = rng.normal(size=L + 100)
    a = base[100:100 + L].copy()          # a[i] = base[100+i]
    b = base[100 - shift:100 - shift + L].copy()  # b[i+shift] ~ a[i]
    a -= a.mean(); b -= b.mean()

    xl, lag = lagged_xcorr(jnp.asarray(a[None]), jnp.asarray(b[None]), 64)
    lag = int(lag[0])
    assert lag == best_lag_xcorr(a, b, 64) == shift
    assert 0.7 < float(xl[0]) <= 1.0 + 1e-6
