"""Whitening/PSD ops vs independent numpy/scipy references."""
import numpy as np
import jax.numpy as jnp
import pytest
from numpy.fft import irfft, rfft, rfftfreq

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.ops.whiten import (
    dewhiten_train_like,
    dewhiten_with_psd,
    interp_psd_to_length,
    mad_std,
    pick_sigma,
    train_psd,
    welch_psd,
    whiten_train_like,
    whiten_with_psd,
    whiten_with_welch,
)


def _np_train_whiten(y, x):
    """Independent numpy implementation of the documented 'train' whitening."""
    L = len(y)
    y64 = y.astype(np.float64) - np.mean(y, dtype=np.float64)
    Y = rfft(y64)
    P = np.abs(Y) ** 2
    if P.size > 9:
        P = np.convolve(P, np.ones(9) / 9.0, mode="same")
    P = np.maximum(P, 1e-20)
    y_w = irfft(Y / np.sqrt(P), n=L)
    X = rfft(x.astype(np.float64) - np.mean(x, dtype=np.float64))
    x_w = irfft(X / np.sqrt(P), n=L)
    return y_w, x_w, P


def test_train_whiten_matches_numpy(rng):
    y = rng.normal(size=512).astype(np.float32)
    x = rng.normal(size=512).astype(np.float32)
    yw_np, xw_np, P_np = _np_train_whiten(y, x)
    yw, xw, P = whiten_train_like(jnp.asarray(y), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(P), P_np, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(yw), yw_np, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(xw), xw_np, rtol=1e-3, atol=1e-4)


def test_train_whiten_batched(rng):
    y = rng.normal(size=(3, 256)).astype(np.float32)
    yw, _, P = whiten_train_like(jnp.asarray(y))
    assert yw.shape == (3, 256) and P.shape == (3, 129)
    # matches per-sample computation
    yw0, _, _ = whiten_train_like(jnp.asarray(y[0]))
    np.testing.assert_allclose(np.asarray(yw[0]), np.asarray(yw0), rtol=1e-5)


def test_whiten_dewhiten_roundtrip(rng):
    y = rng.normal(size=1024).astype(np.float32)
    x = rng.normal(size=1024).astype(np.float32)
    yw, xw, P = whiten_train_like(jnp.asarray(y), jnp.asarray(x))
    # dewhiten uses sqrt(P + 1e-12): with P >= 1e-20 from periodogram of a
    # normalised signal the roundtrip is near-exact
    y_rec = dewhiten_train_like(yw, P)
    y0 = y - y.mean()
    np.testing.assert_allclose(np.asarray(y_rec), y0, rtol=1e-2, atol=1e-4)


def test_whiten_with_flat_psd_identity(rng):
    """Whitening by a flat unit PSD is (numerically) the identity."""
    y = rng.normal(size=256).astype(np.float32)
    P = jnp.ones(129)
    yw, _ = whiten_with_psd(jnp.asarray(y), None, P)
    np.testing.assert_allclose(np.asarray(yw), y, rtol=1e-4, atol=1e-5)
    y_rec = dewhiten_with_psd(yw, P)
    np.testing.assert_allclose(np.asarray(y_rec), y, rtol=1e-4, atol=1e-5)


def test_whiten_with_psd_flattens_spectrum(rng):
    """Coloring noise by sqrt(P) then whitening by P recovers white noise."""
    L = 4096
    w = rng.normal(size=L)
    freqs = rfftfreq(L, 1.0 / 4096)
    P = 1.0 / (1.0 + (freqs / 100.0) ** 2)  # smooth colored spectrum
    colored = irfft(rfft(w) * np.sqrt(P), n=L).astype(np.float32)
    yw, _ = whiten_with_psd(jnp.asarray(colored), None, jnp.asarray(P))
    np.testing.assert_allclose(np.asarray(yw), w, rtol=1e-2, atol=1e-3)


def test_interp_psd_identity_when_matching():
    P = jnp.arange(65.0)
    out = interp_psd_to_length(P, 65, 128, 4096.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(P))


def test_interp_psd_resamples():
    P = jnp.linspace(1.0, 2.0, 33)  # grid of length-64 rfft
    out = interp_psd_to_length(P, 33, 128, 4096.0)
    assert out.shape == (65,)
    assert float(out[0]) == pytest.approx(1.0)
    assert float(out[-1]) == pytest.approx(2.0)


def test_welch_matches_scipy(rng):
    from scipy.signal import welch as scipy_welch

    y = rng.normal(size=8192).astype(np.float64)
    fs = 4096.0
    f_sp, P_sp = scipy_welch(y, fs=fs, nperseg=1024)
    f_j, P_j = welch_psd(jnp.asarray(y, jnp.float32), fs, nperseg=1024)
    np.testing.assert_allclose(np.asarray(f_j), f_sp, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(P_j), P_sp, rtol=2e-3, atol=1e-8)


def test_welch_detrend_none_matches_scipy(rng):
    from scipy.signal import welch as scipy_welch

    y = (rng.normal(size=4096) + 3.0).astype(np.float64)
    fs = 4096.0
    f_sp, P_sp = scipy_welch(y, fs=fs, nperseg=512, detrend=False)
    f_j, P_j = welch_psd(jnp.asarray(y, jnp.float32), fs, nperseg=512, detrend="none")
    np.testing.assert_allclose(np.asarray(P_j), P_sp, rtol=2e-3, atol=1e-8)


def test_whiten_with_welch_grid(rng):
    y = rng.normal(size=2048).astype(np.float32)
    f_w = jnp.linspace(0, 2048.0, 100)
    P_w = jnp.ones(100) * 2.0
    yw, _, P = whiten_with_welch(jnp.asarray(y), None, f_w, P_w, fs=4096.0)
    assert P.shape == (1025,)
    np.testing.assert_allclose(np.asarray(P), 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(yw), y / np.sqrt(2.0), rtol=1e-4, atol=1e-5)


def test_mad_std_and_pick_sigma(rng):
    x = rng.normal(size=20000).astype(np.float64) * 3.0
    m = float(mad_std(jnp.asarray(x)))
    assert m == pytest.approx(3.0, rel=0.05)
    s_std = np.asarray(pick_sigma(jnp.asarray(x[None, :]), "std"))
    assert s_std[0] == pytest.approx(3.0, rel=0.05)
    s_fix = np.asarray(pick_sigma(jnp.asarray(x[None, :]), "fixed", 7.0))
    assert s_fix[0] == 7.0
    # degenerate input falls back to 1.0
    z = jnp.zeros((1, 100))
    assert float(pick_sigma(z, "std")[0]) == 1.0


def test_model_whiten_band_limit_and_units(rng):
    """Physical-units model-PSD whitening: unit-PSD-consistent output scale
    and NO amplification of out-of-band (P==0) content.

    Regression for two reference defects this rebuild fixes deliberately:
    (a) absolute eps (1e-20/1e-12) >> physical PSD (~1e-46) degenerates
        whitening into a constant rescale (ref dataloader.py:133-140);
    (b) flooring P==0 bins below f_lower amplifies sub-cutoff spectral
        leakage instead of zeroing it.
    """
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.pipeline import (
        whiten_model_np,
    )

    L, fs = 8192, 4096.0
    freqs = rfftfreq(L, 1.0 / fs)
    # physical-scale PSD, zeroed below 20 Hz like the schema's model PSD
    P = np.where(freqs >= 20.0, 1e-46 * (1.0 + (freqs / 200.0) ** 2), 0.0)
    # colored noise at physical strain scale via the PSD itself
    wn = rng.normal(size=L)
    amp = np.sqrt(L * fs * P / 4.0)
    z = amp * (rng.normal(size=L // 2 + 1) + 1j * rng.normal(size=L // 2 + 1))
    y = irfft(z, n=L).astype(np.float32)
    x = (np.sin(2 * np.pi * 5.0 * np.arange(L) / fs) * 1e-21).astype(np.float32)

    y_w, x_w, P_out = whiten_model_np(y, x, P, fs)
    # (a) spectrally correct whitening -> std ~ sqrt(fs/2), not ~1e-11
    assert np.std(y_w) == pytest.approx(np.sqrt(fs / 2.0), rel=0.1)
    # (b) x is pure 5 Hz = out of band: whitened version must be ~zero,
    # not amplified by 1/sqrt(floored tiny P)
    assert np.abs(x_w).max() < 1e-3 * np.std(y_w)
