"""Waveform-engine fidelity evidence: time-domain assembly vs closed-form SPA.

VERDICT r3 item 6 asks for a mismatch table of ``data/pn.py`` against an
SEOBNRv4 golden fixture.  That fixture is unobtainable in this environment:
pycbc is not installed, ``pip download pycbc`` fails (zero egress, no wheel
baked into the image), and the reference repo ships no data files (verified:
``find /root/reference -name '*.h5' ...`` is empty).  What CAN be measured
end-to-end is the other half of the fidelity question: does the time-domain
waveform ASSEMBLY (tau(v) Newton inversion, spin-dependent termination,
half-Hann turn-on, uniform-grid sampling, FFT conventions) faithfully
realise the analytic stationary-phase model it claims to implement?

Method: for each (m1, m2, chi1, chi2) the time-domain waveform from
``pn.pn_chirp`` (full assembly including the selected ``--ringdown``
attachment; the match band is cut BELOW termination, so the comparison
target is inspiral-only — SPA is not valid through merger — while the
attachment's in-band spectral leakage is correctly penalised) is FFT'd
and matched against the closed-form frequency-domain TaylorF2 waveform

    H(f) = sqrt(5/24) pi^(-2/3) Mc^(5/6) D^(-1) f^(-7/6) e^(i Psi(f)),
    Psi(f) = 2 pi f t_c - pi/4 + psi(v),   v = (pi M f)^(1/3)

with the SAME 3.5PN psi(v) series (whose coefficients are independently
sympy-verified in tests/test_pn.py).  The match is the standard
noise-weighted inner product (aLIGO-ZDHP PSD), maximised over coalescence
time (via the inverse FFT of the overlap integrand) and phase (modulus).

Mismatch = 1 - match.  Values ~<1e-2 demonstrate the assembly + SPA are
consistent at matched-filter precision across the trained parameter space;
the residual model-class gap to SEOBNRv4 (EOB plunge, NR-calibrated merger)
is a documented scope limitation, not a silent numerical error.

Usage: python tools/pn_fidelity.py [--out runs/flagship/pn_fidelity.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data import (  # noqa: E402
    pn,
)
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data.hdf5io import (  # noqa: E402
    aligo_zdhp_psd_np,
)

MSUN_S = pn.MSUN_S
MPC_S = pn.MPC_S


def taylorf2(freqs: np.ndarray, m1: float, m2: float, chi1: float,
             chi2: float, distance: float) -> np.ndarray:
    """Closed-form restricted-amplitude TaylorF2 H(f) (f64, physical)."""
    M_s, eta = pn.mass_params(m1, m2)
    beta, sigma = pn.spin_phasing_params(m1, m2, chi1, chi2)
    mc_s = float(M_s) * eta ** 0.6
    f = np.asarray(freqs, np.float64)
    v = (np.pi * float(M_s) * f) ** (1.0 / 3.0)
    psi = np.asarray(pn.psi_of_v(jnp.asarray(v), eta, beta, sigma))
    D_s = distance * MPC_S
    amp = (np.sqrt(5.0 / 24.0) * np.pi ** (-2.0 / 3.0)
           * mc_s ** (5.0 / 6.0) / D_s * f ** (-7.0 / 6.0))
    # e^{-i(psi - pi/4)}: t_c/phi_c are free (maximised over in the match)
    return amp * np.exp(-1j * (psi - np.pi / 4.0))


def weighted_match(h_td: np.ndarray, fs: float, m1, m2, chi1, chi2,
                   distance: float, f_lo: float, f_hi: float) -> float:
    """Noise-weighted match of a time-domain waveform vs TaylorF2,
    maximised over time (IFFT) and phase (modulus)."""
    n = len(h_td)
    H1 = np.fft.rfft(h_td.astype(np.float64)) / fs          # continuous-FT
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    band = (freqs >= f_lo) & (freqs <= f_hi)
    H2 = np.zeros_like(H1)
    H2[band] = taylorf2(freqs[band], m1, m2, chi1, chi2, distance)
    P = aligo_zdhp_psd_np(freqs, f_lower=max(10.0, f_lo - 5.0))
    w = np.zeros_like(P)
    ok = band & (P > 0)
    w[ok] = 1.0 / P[ok]
    df = fs / n
    s11 = 4.0 * df * np.sum(np.abs(H1) ** 2 * w)
    s22 = 4.0 * df * np.sum(np.abs(H2) ** 2 * w)
    integrand = H1 * np.conj(H2) * w
    # maximise over time AND phase: C(t_j) = sum_k z_k e^{2pi i k j / N},
    # phase max = |C| (positive-frequency sum only, so the modulus IS the
    # phase maximisation); x4 zero-padding for sub-sample peak resolution
    N4 = 4 * n
    z = np.zeros(N4, np.complex128)
    z[:len(integrand)] = integrand
    C = np.fft.ifft(z) * N4
    m = 4.0 * df * np.max(np.abs(C))
    return float(m / np.sqrt(s11 * s22))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/flagship/pn_fidelity.json")
    ap.add_argument("--fs", type=float, default=4096.0)
    ap.add_argument("--f-lower", type=float, default=20.0)
    ap.add_argument("--f-taper-frac", type=float, default=1.0,
                    help="< 1: half-Hann turn-on completes AT the f_lower "
                         "crossing (taper below band) instead of ramping "
                         "0.25 s into the band (pn.pn_chirp).")
    ap.add_argument("--ringdown", choices=["qnm", "qnm_c1", "isco"],
                    default="qnm",
                    help="Post-inspiral attachment: 'qnm_c1' is the C1 "
                         "(chirp-rate-matched) blend whose reduced spectral "
                         "leakage this harness quantifies.")
    args = ap.parse_args(argv)

    fs, fl = args.fs, args.f_lower
    masses = [(20, 20), (28, 24), (36, 30), (44, 36), (50, 42)]
    chis = [-0.6, 0.0, 0.6]
    rows = []
    for (m1, m2) in masses:
        for chi in chis:
            # inspiral-only termination: compare below 85% of the
            # (spin-dependent) ISCO so neither SPA breakdown nor the
            # ringdown attachment contaminates the match
            f_term = float(pn.kerr_isco_f_gw(
                m1, m2, pn.chi_eff(m1, m2, chi, chi)))
            f_hi = 0.85 * f_term
            # size the segment from the TAPER-START frequency so a
            # below-band turn-on (f_taper_frac < 1) is fully contained —
            # tau ~ f^{-8/3}, so it starts noticeably earlier
            dur = float(pn.pn_duration(
                m1, m2, chi, chi, f_lower=args.f_taper_frac * fl))
            n = 1 << int(np.ceil(np.log2((dur + 1.0) * fs)))
            h = np.asarray(pn.pn_chirp(
                jnp.asarray(float(m1)), jnp.asarray(float(m2)),
                jnp.asarray(float(chi)), jnp.asarray(float(chi)),
                n=n, fs=int(fs), distance=410.0, f_lower=fl,
                fplus=1.0, fcross=0.0, ringdown=args.ringdown,
                f_taper_frac=args.f_taper_frac), np.float64)
            match = weighted_match(h, fs, m1, m2, chi, chi, 410.0,
                                   fl + 2.0, f_hi)
            # inspiral-core band: away from both the half-Hann turn-on and
            # the merger's spectral leakage — isolates phasing fidelity
            core = (weighted_match(h, fs, m1, m2, chi, chi, 410.0,
                                   fl + 6.0, 0.7 * f_term)
                    if 0.7 * f_term > fl + 10.0 else None)
            rows.append({"m1": m1, "m2": m2, "chi": chi,
                         "f_hi_hz": round(f_hi, 1), "n": n,
                         "match": round(match, 6),
                         "mismatch": round(1.0 - match, 6),
                         "core_mismatch": (round(1.0 - core, 6)
                                           if core is not None else None)})
            print(f"m1={m1} m2={m2} chi={chi:+.1f}: match={match:.5f} "
                  f"(mismatch {1-match:.2e}, band [{fl+2:.0f},{f_hi:.0f}] Hz; "
                  f"core {(1-core) if core is not None else float('nan'):.2e})")

    mm = [r["mismatch"] for r in rows]
    out = {
        "method": "TD assembly vs closed-form TaylorF2 SPA, aLIGO-ZDHP-"
                  "weighted match, maximised over t_c/phi_c, inspiral band",
        "pycbc_status": "not installed; pip download fails (no egress); "
                        "reference repo ships no waveform fixtures — "
                        "SEOBNRv4 comparison impossible in this environment",
        "f_taper_frac": args.f_taper_frac,
        "ringdown": args.ringdown,
        "rows": rows,
        "mismatch_max": max(mm), "mismatch_median": float(np.median(mm)),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"[pn_fidelity] max mismatch {max(mm):.2e}, "
          f"median {np.median(mm):.2e} -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
