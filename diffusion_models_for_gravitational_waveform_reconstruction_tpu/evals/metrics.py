"""Reconstruction scoring and alignment.

Reference parity:
- tail-window MAE + Pearson correlation over the last ``secs`` seconds:
  ``inference.py:11-27`` (_tail_mask/_corr/_score_last_window)
- integer-lag cross-correlation alignment: ``inference.py:247-278`` — but
  computed via FFT cross-correlation (O(L log L)) instead of the reference's
  brute-force O(L * max_shift) Python loop (flagged as a hot spot in
  SURVEY.md §3.2)
- peak alignment and scoring windows full/tail/merger: ``grid_infer.py:22-49``
- the sweep objective J = corr_strain + 0.5 corr_white - 0.1 nmae_sigma:
  ``sweep_infer.py:8-13``
- merger-window [-80 ms, +40 ms] MAE/NMAE printout: ``inference.py:310-314``

Host-side numpy: these run on small 1-D arrays after sampling; device time
is spent in the samplers, not here.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def corr(a: np.ndarray, b: np.ndarray) -> float:
    """Pearson correlation, scale-invariant.

    NOTE: an additive epsilon in the denominator (the reference's +1e-12 at
    ``inference.py:16-19``) silently zeroes correlations of physical-strain
    series (~1e-22 scale, squared sums ~1e-41); degenerate inputs are
    handled by an explicit zero-denominator guard instead."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    a = a - a.mean()
    b = b - b.mean()
    den = np.sqrt((a * a).sum() * (b * b).sum())
    if den == 0.0 or not np.isfinite(den):
        return 0.0
    return float((a * b).sum() / den)


def tail_mask(L: int, fs: float, secs: float = 0.8) -> np.ndarray:
    t = np.arange(L) / fs
    return t >= (t.max() - secs)


def score_last_window(x: np.ndarray, c: np.ndarray, fs: float,
                      secs: float = 0.8) -> Dict[str, float]:
    """MAE + Pearson corr over the last ``secs`` seconds (where the merger
    lives, given the left-pad convention)."""
    L = min(len(x), len(c))
    x = np.asarray(x[:L], np.float64)
    c = np.asarray(c[:L], np.float64)
    m = tail_mask(L, fs, secs)
    return {"corr_last": corr(x[m], c[m]),
            "mae_last": float(np.mean(np.abs(x[m] - c[m])))}


def best_lag_xcorr(a: np.ndarray, b: np.ndarray, max_shift: int = 0) -> int:
    """argmax_k sum a[i] b[i+k] over |k| <= max_shift, via FFT correlation."""
    L = min(len(a), len(b))
    a = np.asarray(a[:L], np.float64)
    b = np.asarray(b[:L], np.float64)
    if max_shift <= 0:
        max_shift = L - 1
    n = 1 << int(2 * L - 1).bit_length()
    fa = np.fft.rfft(a, n)
    fb = np.fft.rfft(b, n)
    cc = np.fft.irfft(fa * np.conj(fb), n)          # cc[k] = sum a[i] b[i-k]
    # lags k in [-max_shift, max_shift]: convention v(k) = sum a[i] b[i+k]
    # = cc[-k mod n]
    lags = np.arange(-max_shift, max_shift + 1)
    vals = cc[(-lags) % n]
    return int(lags[np.argmax(vals)])


def align_xcorr(a: np.ndarray, b: np.ndarray, delta_t: float,
                max_shift: int = 0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shift b by the best lag against a; returns (a_al, b_al, t) with t=0 at
    a's |peak| (ref ``inference.py:264-278``)."""
    k = best_lag_xcorr(a, b, max_shift)
    start = max(0, -k)
    stop = min(len(a), len(b) - k)
    if stop <= start:
        L = min(len(a), len(b))
        a_al, b_al = a[:L], b[:L]
    else:
        a_al = a[start:stop]
        b_al = b[start + k:stop + k]
    t = np.arange(len(a_al), dtype=np.float64) * delta_t
    t -= t[int(np.argmax(np.abs(a_al)))]
    return a_al, b_al, t


def _shift_pair(a: np.ndarray, b: np.ndarray, k: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Pair a[i] with b[i+k] and trim to the common support — the single
    slicing convention shared by peak and xcorr alignment."""
    if k > 0:
        a_al, b_al = a[: len(a) - k], b[k:]
    elif k < 0:
        a_al, b_al = a[-k:], b[: len(b) + k]
    else:
        a_al, b_al = a, b
    L = min(len(a_al), len(b_al))
    return a_al[:L], b_al[:L]


def align_peak(a: np.ndarray, b: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Peak-to-peak alignment (ref ``grid_infer.py:36-42``)."""
    pa = int(np.argmax(np.abs(a)))
    pb = int(np.argmax(np.abs(b)))
    return _shift_pair(a, b, pb - pa)


def apply_alignment(a: np.ndarray, b: np.ndarray, fs: float, mode: str = "none",
                    max_shift_s: float = 0.02) -> Tuple[np.ndarray, np.ndarray]:
    """'none' | 'peak' | 'xcorr' alignment (ref ``grid_infer.py:33-49``)."""
    if mode == "none":
        return a, b
    if mode == "peak":
        return align_peak(a, b)
    max_shift = int(max(1, max_shift_s * fs))
    # best_lag convention: v(k) = sum a[i] b[i+k] -> pair a[i] with b[i+k]
    return _shift_pair(a, b, best_lag_xcorr(a, b, max_shift))


def window_indices(win: str, clean: np.ndarray, fs: float, tail_secs: float = 0.8,
                   left_s: float = 0.08, right_s: float = 0.04) -> Tuple[int, int]:
    """'full' | 'tail' | 'merger' scoring windows (ref ``grid_infer.py:22-31``)."""
    L = len(clean)
    if win == "full":
        return 0, L
    if win == "tail":
        W = int(max(1, tail_secs * fs))
        return max(0, L - W), L
    pk = int(np.argmax(np.abs(clean)))
    return (int(max(0, pk - left_s * fs)),
            int(min(L, pk + right_s * fs)))


def merger_window_scores(recon_al: np.ndarray, clean_al: np.ndarray,
                         t_al: np.ndarray, sigma: float) -> Dict[str, float]:
    """MAE / NMAE over the [-80 ms, +40 ms] merger window after alignment
    (ref ``inference.py:310-314``)."""
    m = (t_al >= -0.080) & (t_al <= 0.040)
    if not m.any():
        return {"mae": float("nan"), "nmae_clean": float("nan"),
                "nmae_sigma": float("nan")}
    mae = float(np.mean(np.abs(recon_al[m] - clean_al[m])))
    denom_c = float(np.mean(np.abs(clean_al[m])))
    # relative guards: absolute epsilons swamp physical-strain scales
    return {
        "mae": mae,
        "nmae_clean": mae / denom_c if denom_c > 0 else float("nan"),
        "nmae_sigma": mae / float(sigma) if sigma > 0 else float("nan"),
    }


def residual_diagnostics(
    y_white: np.ndarray,
    x0_white: np.ndarray,
    clean_white: Optional[np.ndarray] = None,
    band_mask: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Whiteness diagnostics of the residual r = y - x0 in the whitened
    domain (extension; no reference counterpart).

    A perfect reconstruction leaves r = the whitened NOISE realisation:
    flat in-band spectrum, zero coherence with the clean signal.  Unlike
    corr/mf_ratio these do not require the injected clean waveform, so
    ``res_flatness`` is the deployable quality signal for real
    measurements; the clean-referenced pair calibrates it on synthetic
    evals.

    - ``res_flatness``: mean in-band periodogram power of r in the upper
      half-band over the lower half-band.  White residual -> ~1 (up to
      the coloured-PSD x flat-weight ripple); missed signal piles up
      along the chirp track (low band) -> < 1.
    - ``res_std_ratio`` (needs clean): std(r) / std(y - clean).  Perfect
      recon -> 1; residual signal -> > 1; reconstruction absorbing the
      noise realisation (overfit to y) -> < 1.
    - ``res_clean_corr`` (needs clean): |corr(r, clean_white)| — coherent
      missed/excess signal in the residual.  Perfect recon -> ~0.

    ``band_mask`` selects the rfft bins where the whitening weight is
    nonzero (sub-``f_lower`` bins are band-limited to exactly zero by the
    model-domain whitener — including them would fake a low-band deficit).
    """
    y = np.asarray(y_white, np.float64).ravel()
    x0 = np.asarray(x0_white, np.float64).ravel()
    L = min(len(y), len(x0))
    r = y[:L] - x0[:L]
    out: Dict[str, float] = {}

    p = np.abs(np.fft.rfft(r)) ** 2
    if band_mask is not None and len(band_mask) == len(p):
        sel = np.asarray(band_mask, bool).copy()
    else:
        sel = np.ones(len(p), bool)
    sel[0] = False                                  # DC carries the mean
    idx = np.flatnonzero(sel)
    if len(idx) >= 8:
        half = len(idx) // 2
        lo = float(p[idx[:half]].mean())
        hi = float(p[idx[half:]].mean())
        out["res_flatness"] = hi / lo if lo > 0 else float("nan")
    else:
        out["res_flatness"] = float("nan")

    if clean_white is not None:
        c = np.asarray(clean_white, np.float64).ravel()[:L]
        n = y[:L] - c
        dn = float(n.std())
        out["res_std_ratio"] = (float(r.std()) / dn if dn > 0
                                else float("nan"))
        out["res_clean_corr"] = abs(corr(r, c))
    return out


def sweep_objective(m_strain: Optional[dict], m_white: Optional[dict]) -> float:
    """J = corr_strain + 0.5 corr_white - 0.1 nmae_sigma (ref
    ``sweep_infer.py:8-13``)."""
    r_s = m_strain.get("corr_last", 0.0) if m_strain else 0.0
    r_w = m_white.get("corr_last", 0.0) if m_white else 0.0
    nmae = m_strain.get("nmae_sigma", 0.0) if m_strain else 0.0
    return float(r_s + 0.5 * r_w - 0.1 * nmae)


def matched_filter_snr(recon: np.ndarray, template: np.ndarray, psd: np.ndarray,
                       fs: float, f_lower: float = 20.0) -> float:
    """Matched-filter SNR of ``recon`` against ``template`` under ``psd`` —
    the BASELINE.json quality metric ('matched-filter SNR recovery').

    rho = max_t |<recon, template>(t)| / sigma(template), with the
    noise-weighted inner product 4 Re int h1 h2* / S df evaluated at all lags
    via FFT.
    """
    # float64 throughout: f32 inputs would underflow |h~|^2 (~1e-53 for
    # physical strain) through a complex64 FFT
    template = np.asarray(template, np.float64)
    recon = np.asarray(recon, np.float64)
    psd = np.asarray(psd, np.float64)
    N = len(template)
    dt = 1.0 / fs
    df = fs / N
    freqs = np.fft.rfftfreq(N, dt)
    valid = (freqs >= f_lower) & (psd > 0)
    S = np.where(valid, psd, np.inf)
    hf = np.fft.rfft(template) * dt
    xf = np.fft.rfft(recon[:N], N) * dt
    sig2 = 4.0 * df * np.sum(np.where(valid, np.abs(hf) ** 2 / S, 0.0))
    if sig2 <= 0:
        return 0.0
    integrand = np.where(valid, xf * np.conj(hf) / S, 0.0)
    # z(t) = 4 Re int x~ h~*/S e^{2pi i f t} df; with one-sided bins,
    # irfft(A)[n] = (1/N)(A_0 + 2 sum Re(A_k e) + A_nyq) so
    # 4 df sum_onesided Re(...) ~= 2 df N irfft(A)[n]
    z = 2.0 * df * N * np.fft.irfft(integrand, N)
    rho_t = np.abs(z) / np.sqrt(sig2)
    return float(np.max(rho_t))
