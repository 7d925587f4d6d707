"""Golden-value and property tests for beta schedules and timestep utilities.

The golden values are computed in-test from the published formulas (Nichol &
Dhariwal cosine; DDPM linear), independently of the library code.
"""
import math

import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops import (
    build_t_schedule,
    cfg_combination_coeffs,
    cfg_weight,
    cfg_weight_schedule,
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
    snr_from_alpha_bar,
    t_for_target_snr,
)


def _reference_cosine(T, s=0.008):
    t = np.linspace(0, T, T + 1)
    ac = np.cos(((t / T) + s) / (1 + s) * (math.pi / 2)) ** 2
    ac = ac / ac[0]
    betas = 1 - ac[1:] / ac[:-1]
    return np.clip(betas, 0.0, 0.999)


def test_cosine_schedule_matches_formula():
    T = 1000
    got = np.asarray(cosine_beta_schedule(T))
    want = _reference_cosine(T)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_cosine_schedule_monotone_alpha_bar():
    sched = make_schedule(1000, "cosine")
    ab = np.asarray(sched.alpha_bar)
    assert np.all(np.diff(ab) < 0)
    assert 0 < ab[-1] < ab[0] <= 1.0


def test_linear_schedule_endpoints():
    betas = np.asarray(linear_beta_schedule(1000))
    assert betas[0] == pytest.approx(1e-4, rel=1e-5)
    assert betas[-1] == pytest.approx(0.02, rel=1e-5)
    assert np.all(np.diff(betas) > 0)


def test_snr_monotone_and_inversion():
    sched = make_schedule(1000, "cosine")
    snr = snr_from_alpha_bar(sched.alpha_bar)
    assert np.all(np.diff(snr) < 0)  # SNR decreases with t
    # round trip: t -> snr(t) -> t
    for t in [3, 100, 500, 990]:
        assert t_for_target_snr(sched, float(snr[t])) == t


def test_build_t_schedule_endpoints_and_dedup():
    ts = build_t_schedule(1000, steps=200, start_t=None)
    assert ts[0] == 999 and ts[-1] == 0
    assert np.all(np.diff(ts) < 0)  # strictly descending after dedup
    # few steps from small start: still valid ladder
    ts2 = build_t_schedule(1000, steps=50, start_t=10)
    assert ts2[0] == 10 and ts2[-1] == 0
    assert len(ts2) <= 11
    # steps clamped to start_t+1
    ts3 = build_t_schedule(1000, steps=5, start_t=2)
    assert list(ts3) == [2, 1, 0]


def test_cfg_weight_modes():
    assert cfg_weight(0, 10, "const", 1.5, 0.7, 0.12) == 1.5
    # tophat: inside window -> wmax, outside -> 1.0
    assert cfg_weight(7, 10, "tophat", 2.0, 0.75, 0.2) == 2.0
    assert cfg_weight(0, 10, "tophat", 2.0, 0.75, 0.2) == 1.0
    # gauss peaks at the center
    ws = cfg_weight_schedule(11, "gauss", 2.0, 0.5, 0.1)
    assert np.argmax(ws) == 5
    assert ws[5] == pytest.approx(2.0)


def test_cfg_combination_coeffs_cases():
    w = np.array([0.01, 1.0, 1.5])
    cu, cc = cfg_combination_coeffs(w, u_only_thresh=0.05)
    # uncond-only
    assert (cu[0], cc[0]) == (1.0, 0.0)
    # cond-only at w == 1
    assert (cu[1], cc[1]) == (0.0, 1.0)
    # guided
    assert cu[2] == pytest.approx(-0.5)
    assert cc[2] == pytest.approx(1.5)


def test_lambda_ladder_uniform_in_log_snr():
    """build_lambda_t_schedule: descending, endpoint-inclusive, and (up to
    integer-grid rounding) uniformly spaced in lambda = log(alpha/sigma) —
    unlike the reference linspace-in-t ladder whose lambda intervals vary by
    orders of magnitude on a cosine schedule."""
    import numpy as np

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.schedules import (
        build_lambda_t_schedule,
        build_t_schedule,
        make_schedule,
    )

    sched = make_schedule(1000, "cosine")
    ts = build_lambda_t_schedule(sched, 20)
    assert ts[0] == 999 and ts[-1] == 0
    assert np.all(np.diff(ts) < 0)

    ab = np.asarray(sched.alpha_bar, np.float64).clip(1e-12, 1 - 1e-12)
    lam = 0.5 * (np.log(ab) - np.log1p(-ab))

    def spread(tt, interior=False):
        h = np.diff(lam[tt])
        if interior:                    # first/last intervals are limited by
            h = h[1:-1]                 # the discrete t-grid's own lambda gaps
        return h.max() / max(h.min(), 1e-12)

    s_lam = spread(ts, interior=True)
    s_t = spread(build_t_schedule(1000, 20))
    assert s_lam < 1.5, s_lam          # near-uniform (integer rounding only)
    assert s_t > 4 * s_lam, (s_t, s_lam)  # t-ladder: wildly uneven in lambda

    # start_t restriction respected
    ts2 = build_lambda_t_schedule(sched, 10, start_t=500)
    assert ts2[0] == 500 and ts2[-1] == 0


def test_sampler_ladder_lambda_runs():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.sampling import (
        SamplerConfig,
        ddim_sample,
        dpmpp_sample,
    )
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.schedules import (
        make_schedule,
    )

    sched = make_schedule(100, "cosine")
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 32))

    def oracle(params, net_in, t):
        x_t = net_in[:, :1, :]
        ab = params["ab"][t].reshape(-1, 1, 1)
        return (x_t - jnp.sqrt(ab) * x0) / jnp.sqrt(jnp.clip(1 - ab, 1e-12))

    cond = jnp.zeros((1, 1, 32))
    for fn in (ddim_sample, dpmpp_sample):
        cfg = SamplerConfig(steps=12, cfg_scale=1.0, use_selfcond=False,
                            ladder="lambda")
        out = fn(oracle, {"ab": sched.alpha_bar}, sched, cond,
                 jax.random.PRNGKey(0), cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   rtol=1e-3, atol=1e-4)
