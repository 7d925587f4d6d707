"""Scoring/alignment metrics vs brute-force references."""
import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.evals.metrics import (
    apply_alignment,
    best_lag_xcorr,
    corr,
    matched_filter_snr,
    merger_window_scores,
    score_last_window,
    sweep_objective,
    window_indices,
)


def brute_force_lag(a, b, max_shift):
    """O(L * shift) reference identical to the reference's Python loop
    (``inference.py:247-278``)."""
    best, best_v = 0, -np.inf
    L = min(len(a), len(b))
    for k in range(-max_shift, max_shift + 1):
        if k >= 0:
            v = float(np.dot(a[: L - k], b[k:L]))
        else:
            v = float(np.dot(a[-k:L], b[: L + k]))
        if v > best_v:
            best_v, best = v, k
    return best


def test_best_lag_matches_brute_force(rng):
    a = rng.normal(size=500)
    for true_lag in [-37, 0, 12, 101]:
        b = np.roll(a, -true_lag) + 0.05 * rng.normal(size=500)
        k_fft = best_lag_xcorr(a, b, 128)
        k_bf = brute_force_lag(a, b, 128)
        assert k_fft == k_bf


def test_shifted_recovery(rng):
    clean = np.sin(2 * np.pi * 30 * np.arange(2048) / 4096) * np.hanning(2048)
    recon = np.roll(clean, 25)
    a_al, b_al = apply_alignment(clean, recon, 4096.0, "xcorr",
                                 max_shift_s=0.02)
    assert corr(a_al, b_al) > 0.999


def test_score_last_window_perfect():
    fs = 4096.0
    x = np.sin(np.arange(4096) * 0.1)
    m = score_last_window(x, x, fs, 0.5)
    assert m["corr_last"] == pytest.approx(1.0)
    assert m["mae_last"] == pytest.approx(0.0, abs=1e-12)


def test_window_indices_modes():
    fs = 4096.0
    clean = np.zeros(4096)
    clean[3000] = 1.0
    assert window_indices("full", clean, fs) == (0, 4096)
    lo, hi = window_indices("tail", clean, fs, tail_secs=0.5)
    assert (lo, hi) == (4096 - 2048, 4096)
    lo, hi = window_indices("merger", clean, fs, left_s=0.08, right_s=0.04)
    assert lo == int(3000 - 0.08 * fs) and hi == int(3000 + 0.04 * fs)


def test_sweep_objective_formula():
    J = sweep_objective({"corr_last": 0.8, "nmae_sigma": 0.5},
                        {"corr_last": 0.6})
    assert J == pytest.approx(0.8 + 0.5 * 0.6 - 0.1 * 0.5)


def test_matched_filter_snr_self_recovery():
    """A template scaled to SNR rho, matched against itself, recovers rho."""
    import jax
    jax_cfg_done = True
    import jax.numpy as jnp

    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.synth import (
        PSD_SCALE,
        SynthConfig,
        aligo_zdhp_psd,
        matched_filter_sigma,
        newtonian_chirp,
    )

    cfg = SynthConfig(n=8192, fs=4096)
    h = np.asarray(newtonian_chirp(jnp.array(35.0), jnp.array(30.0),
                                   n=cfg.n, fs=cfg.fs), np.float64)
    freqs = np.fft.rfftfreq(cfg.n, 1.0 / cfg.fs)
    psd_phys = np.asarray(aligo_zdhp_psd(jnp.asarray(freqs)),
                          np.float64) / PSD_SCALE
    sig = float(matched_filter_sigma(jnp.asarray(h, jnp.float32),
                                     jnp.asarray(psd_phys * PSD_SCALE),
                                     cfg.fs))
    target = 15.0
    h_scaled = h * (target / sig)
    rho = matched_filter_snr(h_scaled, h_scaled, psd_phys, cfg.fs)
    assert rho == pytest.approx(target, rel=2e-2)


def test_merger_window_scores_zero_for_identical():
    t = np.linspace(-0.2, 0.1, 1000)
    x = np.sin(t * 300)
    m = merger_window_scores(x, x, t, sigma=1.0)
    assert m["mae"] == pytest.approx(0.0, abs=1e-12)


def test_metrics_float32_physical_strain_safe():
    """Physical-strain float32 inputs must not zero out corr / mf-SNR
    (regression: absolute epsilons and complex64 FFTs underflow at 1e-22)."""
    rng = np.random.default_rng(0)
    n, fs = 4096, 4096.0
    c = (np.sin(2 * np.pi * 100 * np.arange(n) / fs)
         * np.hanning(n) * 1e-22).astype(np.float32)
    r = (c + 0.2e-22 * rng.normal(size=n)).astype(np.float32)
    assert corr(r, c) > 0.9
    m = score_last_window(r, c, fs, 0.5)
    assert m["corr_last"] > 0.9

    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    P = np.where(freqs >= 20.0, 1e-46 * (1 + (freqs / 200.0) ** 2), 0.0)
    rho_self = matched_filter_snr(c, c, P, fs)
    # self-match equals the template's matched-filter amplitude
    dt = 1.0 / fs
    hf = np.fft.rfft(c.astype(np.float64)) * dt
    valid = (freqs >= 20) & (P > 0)
    sig = np.sqrt(4 * (fs / n) * np.sum(np.abs(hf[valid]) ** 2 / P[valid]))
    assert rho_self == pytest.approx(sig, rel=2e-2)


def test_mf_amp_calibrate():
    """Least-squares MF amplitude calibration: recovers a suppressed
    amplitude against a noisy measurement, no-ops on degenerate recons."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.inference import (
        mf_amp_calibrate,
    )

    rng = np.random.default_rng(0)
    t = np.arange(4096) / 4096.0
    s_true = np.sin(2 * np.pi * 60 * t) * np.hanning(4096) * 20.0
    y = s_true + rng.normal(size=4096)          # whitened-domain SNR ~ 20
    recon = 0.6 * s_true                        # right shape, 40% low

    cal, s = mf_amp_calibrate(recon, y)
    # amplitude restored to within the ~1/SNR noise floor
    ratio = np.abs(cal).max() / np.abs(s_true).max()
    assert 0.9 < ratio < 1.1
    assert 1.5 < s < 1.9                        # ~1/0.6

    # degenerate recon: unchanged, scale 1
    cal0, s0 = mf_amp_calibrate(np.zeros(4096), y)
    assert s0 == 1.0 and np.all(cal0 == 0)

    # clip guard
    _, s_clip = mf_amp_calibrate(1e-6 * s_true, y)
    assert s_clip <= 4.0


def test_residual_diagnostics_perfect_and_failure_modes():
    """Residual whiteness: perfect recon -> std_ratio 1 / clean_corr 0 /
    flatness ~1; zero recon -> coherent residual signal; recon==y -> the
    noise was absorbed (std_ratio 0)."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.evals.metrics import (
        residual_diagnostics,
    )

    rng = np.random.default_rng(1)
    L = 4096
    t = np.arange(L) / 4096.0
    # low-band chirp-like signal (most power in the lower half-band)
    sig = np.sin(2 * np.pi * (40 + 200 * t) * t) * np.hanning(L) * 8.0
    noise = rng.normal(size=L)
    y = sig + noise

    d = residual_diagnostics(y, sig, clean_white=sig)
    assert d["res_std_ratio"] == pytest.approx(1.0, abs=1e-12)
    assert d["res_clean_corr"] < 0.05
    assert 0.8 < d["res_flatness"] < 1.25          # white residual

    d0 = residual_diagnostics(y, np.zeros(L), clean_white=sig)
    assert d0["res_std_ratio"] > 2.0               # signal left behind
    assert d0["res_clean_corr"] > 0.9
    assert d0["res_flatness"] < 0.5                # low-band excess

    dy = residual_diagnostics(y, y, clean_white=sig)
    assert dy["res_std_ratio"] == 0.0


def test_residual_diagnostics_band_mask():
    """Out-of-band (zero-weight) bins are excluded: band-limited white
    noise scores flat ONLY when the dead band is masked out."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.evals.metrics import (
        residual_diagnostics,
    )

    rng = np.random.default_rng(2)
    L = 4096
    nb = L // 2 + 1
    band = np.zeros(nb, bool)
    band[800:] = True                              # dead low band, live rest
    spec = np.zeros(nb, complex)
    live = np.flatnonzero(band)
    spec[live] = rng.normal(size=len(live)) + 1j * rng.normal(size=len(live))
    r = np.fft.irfft(spec, L)
    y = r                                          # residual IS the noise

    d_mask = residual_diagnostics(y, np.zeros(L), band_mask=band)
    assert 0.7 < d_mask["res_flatness"] < 1.4
    d_full = residual_diagnostics(y, np.zeros(L))
    assert d_full["res_flatness"] > 1.5            # dead low band fakes excess
