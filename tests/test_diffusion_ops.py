"""Property tests for forward-process math and losses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops import (
    element_loss,
    eps_to_x0,
    make_schedule,
    masked_loss,
    q_sample,
    q_sample_with_eps,
    sample_timesteps_stratified,
    sample_timesteps_uniform,
    x0_to_eps,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule(1000, "cosine")


def test_q_sample_t0_close_to_x0(sched):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 256))
    t = jnp.zeros(4, jnp.int32)
    x_t, eps = q_sample(sched, x0, t, key)
    # alpha_bar[0] ~ 1 for cosine -> x_t ~ x0
    ab0 = float(sched.alpha_bar[0])
    np.testing.assert_allclose(
        np.asarray(x_t),
        np.sqrt(ab0) * np.asarray(x0) + np.sqrt(1 - ab0) * np.asarray(eps),
        rtol=1e-5, atol=1e-6,
    )
    assert ab0 > 0.999


def test_q_sample_large_t_mostly_noise(sched):
    key = jax.random.PRNGKey(0)
    x0 = 5.0 * jnp.ones((2, 1, 4096))
    t = jnp.full(2, 999, jnp.int32)
    x_t, eps = q_sample(sched, x0, t, key)
    # at t=T-1 alpha_bar is tiny: x_t should be ~ standard normal
    assert abs(float(x_t.std()) - 1.0) < 0.1


def test_eps_x0_roundtrip(sched):
    key = jax.random.PRNGKey(2)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (3, 1, 128))
    t = jnp.array([10, 500, 900], jnp.int32)
    eps = jax.random.normal(key, x0.shape)
    x_t = q_sample_with_eps(sched, x0, t, eps)
    x0_rec = eps_to_x0(sched, x_t, eps, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-3, atol=1e-4)
    eps_rec = x0_to_eps(sched, x_t, x0, t)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps), rtol=1e-2, atol=1e-3)


def test_huber_loss_matches_torch_smooth_l1_formula():
    d = jnp.array([[[-2.0, -0.3, 0.0, 0.3, 2.0]]])
    zero = jnp.zeros_like(d)
    mask = jnp.ones_like(d)
    beta = 0.5
    el = np.asarray(element_loss(d, zero, mask, "huber", beta))[0, 0]
    want = np.array([2.0 - 0.25, 0.5 * 0.09 / 0.5, 0.0, 0.5 * 0.09 / 0.5, 2.0 - 0.25])
    np.testing.assert_allclose(el, want, rtol=1e-6)


def test_masked_loss_ignores_padding(sched):
    eps_hat = jnp.ones((2, 1, 8))
    eps = jnp.zeros((2, 1, 8))
    # mask out half the samples' positions; loss should be same as unmasked
    # (per-sample mean over valid positions only)
    mask_full = jnp.ones((2, 1, 8))
    mask_half = mask_full.at[:, :, :4].set(0.0)
    t = jnp.zeros(2, jnp.int32)
    l_full = float(masked_loss(eps_hat, eps, mask_full, t, sched, "mse"))
    l_half = float(masked_loss(eps_hat, eps, mask_half, t, sched, "mse"))
    assert l_full == pytest.approx(1.0)
    assert l_half == pytest.approx(1.0)


def test_loss_weight_power(sched):
    eps_hat = jnp.ones((1, 1, 4))
    eps = jnp.zeros((1, 1, 4))
    mask = jnp.ones((1, 1, 4))
    t = jnp.array([999], jnp.int32)
    base = float(masked_loss(eps_hat, eps, mask, t, sched, "mse", loss_weight_power=0.0))
    w1 = float(masked_loss(eps_hat, eps, mask, t, sched, "mse", loss_weight_power=1.0))
    ab = float(sched.alpha_bar[999])
    assert w1 == pytest.approx(base * (1 - ab), rel=1e-5)


def test_uniform_timesteps_in_range():
    t = sample_timesteps_uniform(jax.random.PRNGKey(0), 512, 500, 999)
    tn = np.asarray(t)
    assert tn.min() >= 500 and tn.max() <= 999


def test_stratified_timesteps_cover_range():
    t = sample_timesteps_stratified(jax.random.PRNGKey(0), 64, 0, 999, bins=8)
    tn = np.sort(np.asarray(t))
    assert len(tn) == 64
    assert tn.min() < 125 and tn.max() >= 875  # strata at both ends hit
    # each octile gets ~8 draws
    hist, _ = np.histogram(tn, bins=8, range=(0, 1000))
    assert hist.min() >= 4


def test_v_parametrisation_roundtrip(sched):
    """v = sa*eps - sb*x0 inverts exactly: (x0, eps) recovered from (x_t, v)."""
    import jax
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.diffusion import (
        q_sample_with_eps,
        v_target,
        v_to_x0_eps,
    )

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(3, 1, 64)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(3, 1, 64)).astype(np.float32))
    t = jnp.asarray([1, 25, 48])
    x_t = q_sample_with_eps(sched, x0, t, eps)
    v = v_target(sched, x0, eps, t)
    x0_r, eps_r = v_to_x0_eps(sched, x_t, v, t)
    np.testing.assert_allclose(np.asarray(x0_r), np.asarray(x0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_r), np.asarray(eps),
                               rtol=1e-4, atol=1e-5)
