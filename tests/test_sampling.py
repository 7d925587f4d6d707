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


# ---------------------------------------------------------------------------
# DPM-Solver++(2M)


def test_dpmpp_oracle_recovers_x0(sched):
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        dpmpp_sample,
    )

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 64))
    cond = jnp.zeros((1, 1, 64))
    cfg = SamplerConfig(steps=20, cfg_scale=1.0, use_selfcond=False,
                        init_mode="noise")
    out = dpmpp_sample(_oracle_model_for(x0), {"ab": sched.alpha_bar}, sched,
                       cond, key, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                               rtol=1e-3, atol=1e-4)


def test_dpmpp_shapes_with_cfg_selfcond_vpred(sched):
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        dpmpp_sample,
    )

    def model_fn(params, net_in, t):  # arbitrary bounded field
        return jnp.tanh(net_in[:, :1, :])

    cond = jnp.ones((3, 2, 32))
    for pred in ("eps", "v", "x0"):
        cfg = SamplerConfig(steps=7, cfg_scale=1.5, use_selfcond=True,
                            pred_type=pred)
        out = dpmpp_sample(model_fn, {}, sched, cond, jax.random.PRNGKey(0),
                           cfg)
        assert out.shape == (3, 1, 32)
        assert np.isfinite(np.asarray(out)).all()


def _lambda_field_model(sched, a=0.3, b=0.15, k=0.45):
    """x0-prediction field varying in lambda = log(alpha/sigma) AND in x_t.

    The x_t-dependence makes the probability-flow trajectory matter (an
    x-independent field would let any solver land exactly on the endpoint
    value); against the fine-ladder limit a 2nd-order multistep solver must
    then be strictly more accurate than DDIM at a coarse ladder.
    """
    ab = np.asarray(sched.alpha_bar, np.float64).clip(1e-12, 1 - 1e-12)
    lam = jnp.asarray(0.5 * (np.log(ab) - np.log1p(-ab)), jnp.float32)

    def model_fn(params, net_in, t):
        x_t = net_in[:, :1, :]
        ab_t = params["ab"][t].reshape(-1, 1, 1)
        x0 = a + b * lam[t].reshape(-1, 1, 1) + k * x_t
        # return the eps consistent with this x0 field
        return (x_t - jnp.sqrt(ab_t) * x0) / jnp.sqrt(jnp.clip(1 - ab_t, 1e-12))

    return model_fn


def test_dpmpp_second_order_beats_ddim_at_coarse_steps():
    """Both samplers discretize the probability-flow ODE; against an exact
    host RK4 solution of that ODE, DPM-Solver++(2M) at a coarse ladder must
    be strictly more accurate than (1st-order) DDIM."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        dpmpp_sample,
    )

    a, b, k = 0.3, 0.15, 0.45
    sched = make_schedule(1000, "cosine")
    model_fn = _lambda_field_model(sched, a, b, k)
    params = {"ab": sched.alpha_bar}
    cond = jnp.zeros((1, 1, 16))
    key = jax.random.PRNGKey(3)

    def run(fn, steps):
        cfg = SamplerConfig(steps=steps, eta=0.0, cfg_scale=1.0,
                            use_selfcond=False, clamp_inputs=0.0, x0_clip=0.0,
                            init_mode="noise")
        return np.asarray(fn(model_fn, params, sched, cond, key, cfg))

    # exact continuum solution: dx/dlam = -ab(lam) x + alpha(lam) x0(x, lam)
    # with ab = sigmoid(2 lam), integrated RK4 from lam(T-1) to lam(0), then
    # the samplers' shared final step x -> x0_hat(x, t=0).
    abn = np.asarray(sched.alpha_bar, np.float64).clip(1e-12, 1 - 1e-12)
    lam0, lam1 = [0.5 * (np.log(p) - np.log1p(-p)) for p in (abn[-1], abn[0])]
    k_init, _ = jax.random.split(key)
    x = np.asarray(
        jax.random.normal(k_init, (1, 1, 16)), np.float64)

    def f(lam, x):
        ab = 1.0 / (1.0 + np.exp(-2.0 * lam))
        al = np.sqrt(ab)
        return -ab * x + al * (a + b * lam + k * x)

    n, h = 40000, (lam1 - lam0) / 40000
    lam = lam0
    for _ in range(n):
        k1 = f(lam, x)
        k2 = f(lam + h / 2, x + h / 2 * k1)
        k3 = f(lam + h / 2, x + h / 2 * k2)
        k4 = f(lam + h, x + h * k3)
        x = x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        lam += h
    exact = a + b * lam1 + k * x

    err_d_10 = np.abs(run(ddim_sample, 10) - exact).max()
    err_p_10 = np.abs(run(dpmpp_sample, 10) - exact).max()
    err_p_100 = np.abs(run(dpmpp_sample, 100) - exact).max()
    assert err_p_10 < 0.5 * err_d_10, (err_p_10, err_d_10)
    assert err_p_100 < 0.1 * err_d_10, (err_p_100, err_d_10)


def test_dpmpp_deterministic(sched):
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        dpmpp_sample,
    )

    model_fn = _oracle_model_for(jnp.zeros((1, 1, 32)))
    cond = jnp.ones((2, 1, 32))
    cfg = SamplerConfig(steps=9, cfg_scale=1.0, use_selfcond=False)
    a = dpmpp_sample(model_fn, {"ab": sched.alpha_bar}, sched, cond,
                     jax.random.PRNGKey(5), cfg)
    b = dpmpp_sample(model_fn, {"ab": sched.alpha_bar}, sched, cond,
                     jax.random.PRNGKey(5), cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_one_step_proxy_vpred_recovers_x0(sched):
    """A v-prediction model's one-step proxy must convert v -> x0 (it used
    to return the raw v output as if it were x0)."""
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 64))

    def v_oracle(params, net_in, t):
        x_t = net_in[:, :1, :]
        ab = params["ab"][t].reshape(-1, 1, 1)
        sa, sb = jnp.sqrt(ab), jnp.sqrt(jnp.clip(1 - ab, 1e-12))
        # v = (sa x_t - x0) / sb  from x0 = sa x_t - sb v
        return (sa * x_t - jnp.broadcast_to(x0, x_t.shape)) / sb

    cond = jnp.zeros((1, 1, 64))
    cfg = SamplerConfig(cfg_scale=1.0, use_selfcond=False, pred_type="v")
    out = one_step_proxy(v_oracle, {"ab": sched.alpha_bar}, sched,
                         x0, cond, jax.random.PRNGKey(0), 20.0, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                               rtol=1e-3, atol=1e-4)


def test_reconstruct_batch_avg_seeds_variance_reduction():
    """avg_seeds=S averages S independent-noise trajectories: outputs across
    different master keys must vary LESS than single-seed outputs, and shape
    handling must keep the (S, B) row mapping straight."""
    import flax.linen as nn

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import (
        reconstruct_batch,
    )

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x, t):
            h = nn.Conv(4, (3,), padding="SAME")(
                jnp.moveaxis(x, 1, -1))
            h = nn.silu(h)
            h = nn.Conv(1, (3,), padding="SAME")(h)
            return jnp.moveaxis(h, -1, 1)

    sched = make_schedule(50, "cosine")
    model = TinyNet()
    B, L = 3, 64
    cond = np.random.default_rng(0).normal(size=(B, 1, L)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, L)), jnp.zeros((1,), jnp.int32))
    sigmas = np.ones((B,), np.float32)
    cfg = SamplerConfig(steps=6, eta=1.0, cfg_scale=1.0, use_selfcond=False)

    def run(key, S):
        return reconstruct_batch(model, params, sched, cond, sigmas, cfg,
                                 jax.random.PRNGKey(key), avg_seeds=S)

    a1, b1 = run(1, 1), run(2, 1)
    a16, b16 = run(1, 16), run(2, 16)
    assert a1.shape == a16.shape == (B, L)
    d1 = np.abs(a1 - b1).mean()
    d16 = np.abs(a16 - b16).mean()
    assert d16 < d1, (d16, d1)
    # averaged output stays centred on the per-seed family, not shifted
    assert np.abs(a16.mean() - a1.mean()) < 10 * np.abs(a1).mean()

    # avg_mode='median': elementwise median across the S seed rows — equals
    # the mean for S=1, differs for S>1 (stochastic eta=1 trajectories),
    # stays shape-correct, and also reduces master-key variance
    def run_med(key, S):
        return reconstruct_batch(model, params, sched, cond, sigmas, cfg,
                                 jax.random.PRNGKey(key), avg_seeds=S,
                                 avg_mode="median")

    m1 = run_med(1, 1)
    np.testing.assert_allclose(m1, a1, rtol=1e-6)
    m16, n16 = run_med(1, 16), run_med(2, 16)
    assert m16.shape == (B, L)
    assert np.abs(m16 - a16).mean() > 0  # a genuinely different aggregate
    assert np.abs(m16 - n16).mean() < d1


def test_reconstruct_batch_seed_std():
    """return_seed_std: (x0, std) with matching shapes, strictly positive
    scatter for stochastic trajectories, and the aggregate identical to the
    plain call (the std tap must not perturb sampling)."""
    import flax.linen as nn

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import (
        reconstruct_batch,
    )

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x, t):
            h = nn.Conv(4, (3,), padding="SAME")(jnp.moveaxis(x, 1, -1))
            h = nn.silu(h)
            h = nn.Conv(1, (3,), padding="SAME")(h)
            return jnp.moveaxis(h, -1, 1)

    sched = make_schedule(50, "cosine")
    model = TinyNet()
    B, L = 2, 64
    cond = np.random.default_rng(3).normal(size=(B, 1, L)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, L)), jnp.zeros((1,), jnp.int32))
    sigmas = np.array([1.0, 2.0], np.float32)
    cfg = SamplerConfig(steps=6, eta=1.0, cfg_scale=1.0, use_selfcond=False)
    key = jax.random.PRNGKey(7)

    plain = reconstruct_batch(model, params, sched, cond, sigmas, cfg, key,
                              avg_seeds=4)
    x0, std = reconstruct_batch(model, params, sched, cond, sigmas, cfg, key,
                                avg_seeds=4, return_seed_std=True)
    assert x0.shape == std.shape == (B, L)
    np.testing.assert_allclose(x0, plain, rtol=1e-6)
    assert std.min() >= 0 and std.mean() > 0

    # amp_calib rescales aggregate and std by the SAME per-row factor:
    # the relative scatter std/||x0|| is calibration-invariant
    x0c, stdc = reconstruct_batch(model, params, sched, cond, sigmas, cfg,
                                  key, avg_seeds=4, return_seed_std=True,
                                  amp_calib="mf")
    for i in range(B):
        r = np.sqrt((std[i] ** 2).mean()) / np.sqrt((x0[i] ** 2).mean())
        rc = np.sqrt((stdc[i] ** 2).mean()) / np.sqrt((x0c[i] ** 2).mean())
        np.testing.assert_allclose(r, rc, rtol=1e-5)


def test_reconstruct_batch_model_ensemble():
    """extra_models ensembling: members sample with the SAME key, so
    ensemble([A, A]) == single(A) exactly and ensemble([A, B]) equals the
    mean of the individual deterministic (eta=0) reconstructions."""
    import flax.linen as nn

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import (
        reconstruct_batch,
    )

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x, t):
            h = nn.Conv(4, (3,), padding="SAME")(jnp.moveaxis(x, 1, -1))
            h = nn.silu(h)
            h = nn.Conv(1, (3,), padding="SAME")(h)
            return jnp.moveaxis(h, -1, 1)

    sched = make_schedule(50, "cosine")
    model = TinyNet()
    B, L = 2, 64
    cond = np.random.default_rng(3).normal(size=(B, 1, L)).astype(np.float32)
    pa = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 2, L)), jnp.zeros((1,), jnp.int32))
    pb = model.init(jax.random.PRNGKey(9),
                    jnp.zeros((1, 2, L)), jnp.zeros((1,), jnp.int32))
    sigmas = np.ones((B,), np.float32)
    cfg = SamplerConfig(steps=6, eta=0.0, cfg_scale=1.0, use_selfcond=False)
    key = jax.random.PRNGKey(7)

    solo_a = reconstruct_batch(model, pa, sched, cond, sigmas, cfg, key)
    solo_b = reconstruct_batch(model, pb, sched, cond, sigmas, cfg, key)
    ens_aa = reconstruct_batch(model, pa, sched, cond, sigmas, cfg, key,
                               extra_models=[(model, pa)])
    ens_ab = reconstruct_batch(model, pa, sched, cond, sigmas, cfg, key,
                               extra_models=[(model, pb)])
    np.testing.assert_allclose(ens_aa, solo_a, rtol=1e-5, atol=1e-6)
    # each member runs its own full scan from the SAME key; the ensemble is
    # the mean of the final whitened reconstructions (linear in sigma
    # scaling), so with eta=0 it equals the member mean exactly
    np.testing.assert_allclose(ens_ab, 0.5 * (solo_a + solo_b),
                               rtol=1e-5, atol=1e-6)
    assert np.abs(ens_ab - solo_a).max() > 1e-7   # actually differs from A


# ---------------------------------------------------------------------------
# Iterative refinement (SDEdit-style re-noise -> re-denoise passes)
# ---------------------------------------------------------------------------

def test_refinement_off_is_bitwise_identical(sched):
    """refine_passes=0 must not change ANYTHING (no key split, same path)."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        sample_with_refinement)
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 64))
    cond = jnp.zeros((2, 1, 64))
    cfg = SamplerConfig(steps=10, cfg_scale=1.0, use_selfcond=False)
    model_fn = _oracle_model_for(x0)
    params = {"ab": sched.alpha_bar}
    a = ddim_sample(model_fn, params, sched, cond, key, cfg)
    b = sample_with_refinement(ddim_sample, model_fn, params, sched, cond,
                               key, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_refinement_fixed_point_on_oracle_model(sched):
    """A perfect model is a fixed point of the refinement operator: re-noising
    the exact x0 to refine_t and re-denoising returns the same x0 (the final
    DDIM step uses alpha_bar_prev=1, reducing to x0_hat exactly)."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        sample_with_refinement)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 64))
    cond = jnp.zeros((1, 1, 64))
    cfg = SamplerConfig(steps=20, cfg_scale=1.0, use_selfcond=False,
                        refine_passes=2, refine_t=60, refine_steps=8)
    model_fn = _oracle_model_for(x0)
    params = {"ab": sched.alpha_bar}
    out = sample_with_refinement(ddim_sample, model_fn, params, sched, cond,
                                 key, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                               rtol=1e-3, atol=1e-4)


def test_refine_only_ladder_and_determinism(sched):
    """refine_only: deterministic under a fixed key, changes the input of an
    imperfect model (the pass actually runs), respects refine_steps default
    (steps//2 when 0)."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        refine_only)
    key = jax.random.PRNGKey(7)

    def imperfect(params, net_in, t):   # biased eps model
        return 0.9 * net_in[:, :1, :]

    cond = jnp.zeros((2, 1, 64))
    start = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 64))
    cfg = SamplerConfig(steps=10, cfg_scale=1.0, use_selfcond=False,
                        refine_passes=1, refine_t=50, refine_steps=0)
    a = refine_only(ddim_sample, imperfect, {}, sched, cond, key, cfg, start)
    b = refine_only(ddim_sample, imperfect, {}, sched, cond, key, cfg, start)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(start))
    assert np.all(np.isfinite(np.asarray(a)))


def test_reconstruct_batch_refinement_runs(sched):
    """End-to-end through reconstruct_batch with refine_passes>0: shapes and
    finiteness, and the refined output differs from the unrefined one."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu import inference as inf

    class TinyModel:
        def apply(self, p, x, t):
            return 0.5 * x[:, :1, :]

    conds = np.random.default_rng(0).normal(
        size=(3, 1, 64)).astype(np.float32)
    sig = np.ones(3, np.float32)
    key = jax.random.PRNGKey(0)
    cfg0 = SamplerConfig(steps=8, cfg_scale=1.0, use_selfcond=False)
    cfg1 = SamplerConfig(steps=8, cfg_scale=1.0, use_selfcond=False,
                         refine_passes=1, refine_t=40)
    m = TinyModel()
    w0 = inf.reconstruct_batch(m, {}, sched, conds, sig, cfg0, key)
    w1 = inf.reconstruct_batch(m, {}, sched, conds, sig, cfg1, key)
    assert w0.shape == w1.shape == (3, 64)
    assert np.all(np.isfinite(w1))
    assert not np.allclose(w0, w1)


def test_aggregate_seeds_modes():
    """aggregate_seeds: mean/median reproduce the direct computations; 'mf'
    up-weights the data-consistent seed, degrades to the mean when seeds
    agree, and stays jit-traceable (it runs inside lowered serving fns)."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        aggregate_seeds,
    )

    rng = np.random.default_rng(7)
    S, B, L = 4, 3, 64
    per_seed = jnp.asarray(rng.normal(size=(S, B, 1, L)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))

    np.testing.assert_allclose(aggregate_seeds(per_seed, "mean"),
                               per_seed.mean(axis=0), rtol=1e-6)
    np.testing.assert_allclose(aggregate_seeds(per_seed, "median"),
                               jnp.median(per_seed, axis=0), rtol=1e-6)

    # identical seeds -> every mode is the common value (tau=0 fall-through)
    same = jnp.tile(per_seed[:1], (S, 1, 1, 1))
    for mode in ("mean", "median", "mf"):
        np.testing.assert_allclose(aggregate_seeds(same, mode, y_norm=y),
                                   per_seed[0], rtol=1e-5)

    # one seed IS the measurement's signal, the others are independent junk:
    # the mf aggregate must sit closer to the signal than the plain mean
    sig = jnp.asarray(rng.normal(size=(B, 1, L)).astype(np.float32))
    junk = jnp.asarray(rng.normal(size=(S - 1, B, 1, L)).astype(np.float32))
    seeds = jnp.concatenate([sig[None], junk], axis=0)
    y_meas = sig[:, 0, :] + 0.1 * jnp.asarray(
        rng.normal(size=(B, L)).astype(np.float32))
    agg_mf = aggregate_seeds(seeds, "mf", y_norm=y_meas)
    agg_mean = aggregate_seeds(seeds, "mean")
    err_mf = float(jnp.abs(agg_mf - sig).mean())
    err_mean = float(jnp.abs(agg_mean - sig).mean())
    assert err_mf < err_mean, (err_mf, err_mean)

    # jit-traceable (serving lowers it into the StableHLO artifact)
    jitted = jax.jit(lambda p, yy: aggregate_seeds(p, "mf", y_norm=yy))
    np.testing.assert_allclose(jitted(seeds, y_meas), agg_mf, rtol=1e-6)

    with pytest.raises(ValueError):
        aggregate_seeds(per_seed, "mf")  # y_norm is required


def test_reconstruct_batch_avg_mode_mf_end_to_end():
    """avg_mode='mf' through reconstruct_batch: shape-correct, finite, equals
    the plain mean at S=1, and is a genuinely different aggregate at S>1."""
    import flax.linen as nn

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import (
        reconstruct_batch,
    )

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x, t):
            return 0.5 * x[:, :1, :]

    B, L = 3, 128
    model = Toy()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, L)), jnp.zeros((1,), jnp.int32))
    sched = make_schedule(50, "cosine")
    cond = np.random.default_rng(1).normal(size=(B, 2, L)).astype(np.float32)
    sigmas = np.ones((B,), np.float32)
    cfg = SamplerConfig(steps=4, eta=1.0, start_t=49, init_mode="noise",
                        pred_type="eps", use_selfcond=False, cfg_scale=1.0)

    def run(S, mode):
        return reconstruct_batch(model, params, sched, cond, sigmas, cfg,
                                 jax.random.PRNGKey(3), avg_seeds=S,
                                 avg_mode=mode)

    np.testing.assert_allclose(run(1, "mf"), run(1, "mean"), rtol=1e-6)
    out = run(8, "mf")
    assert out.shape == (B, L) and np.isfinite(out).all()
    assert np.abs(out - run(8, "mean")).mean() > 0


def test_aggregate_seeds_rejects_unknown_mode():
    """ADVICE r4: a typo'd avg_mode must raise, not silently fall through
    to the plain mean (the old behavior hid --avg-mode misspellings)."""
    import pytest
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        aggregate_seeds,
    )

    per_seed = jnp.zeros((2, 1, 1, 8), jnp.float32)
    with pytest.raises(ValueError, match="avg_mode"):
        aggregate_seeds(per_seed, "meen")
