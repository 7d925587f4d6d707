"""Tests for the 3.5PN aligned-spin waveform engine (data/pn.py).

The load-bearing check is an INDEPENDENT derivation: the published TaylorF2
phasing is re-typed here from alternative published forms (the 20/9*(743/336
+ 11 eta/4) style 1PN coefficient, the per-body spin-orbit beta, etc.),
symbolically differentiated with sympy via the stationary-phase relations,
and compared against the module's hand-derived analytic tau/Phi.  A typo in
either copy of the coefficients breaks the match.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data import pn
from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data import synth


M1, M2 = 30.0, 25.0
CHI1, CHI2 = 0.5, -0.3


def _params(m1=M1, m2=M2, c1=CHI1, c2=CHI2):
    M_s, eta = pn.mass_params(m1, m2)
    beta, sig = pn.spin_phasing_params(m1, m2, c1, c2)
    return float(M_s), float(eta), float(beta), float(sig)


# ---------------------------------------------------------------------------
# Published-coefficient parity via an independent sympy derivation
# ---------------------------------------------------------------------------

def _sympy_tau_phase():
    """TaylorT2 tau(v), Phi(v) derived with sympy from independently-typed
    published TaylorF2 coefficients (Buonanno et al. 2009 Eq. 3.18 forms)."""
    import sympy as sp

    v, eta_s, beta_s, sigma_s, Ms = sp.symbols(
        "v eta beta sigma Ms", positive=True)
    gamma_e = sp.EulerGamma
    # alternative published typings (NOT the module's forms):
    a2 = sp.Rational(20, 9) * (sp.Rational(743, 336) + sp.Rational(11, 4) * eta_s)
    a3 = 4 * beta_s - 16 * sp.pi
    a4 = 10 * (sp.Rational(3058673, 1016064) + sp.Rational(5429, 1008) * eta_s
               + sp.Rational(617, 144) * eta_s ** 2) - 10 * sigma_s
    a5 = sp.pi * (sp.Rational(38645, 756) - sp.Rational(65, 9) * eta_s) \
        * (1 + 3 * sp.log(v))
    a6 = (sp.Rational(11583231236531, 4694215680) - 640 * sp.pi ** 2 / 3
          - sp.Rational(6848, 21) * (gamma_e + sp.log(4 * v))
          + (-sp.Rational(15737765635, 3048192) + 2255 * sp.pi ** 2 / 12) * eta_s
          + sp.Rational(76055, 1728) * eta_s ** 2
          - sp.Rational(127825, 1296) * eta_s ** 3)
    a7 = sp.pi * (sp.Rational(77096675, 254016)
                  + sp.Rational(378515, 1512) * eta_s
                  - sp.Rational(74045, 756) * eta_s ** 2)
    psi = 3 / (128 * eta_s * v ** 5) * (
        1 + a2 * v ** 2 + a3 * v ** 3 + a4 * v ** 4 + a5 * v ** 5
        + a6 * v ** 6 + a7 * v ** 7)
    # SPA relations: tau = -(M/(6 v^2)) dpsi/dv ; Phi - phi_c = -2 pi f tau - psi
    tau = -(Ms / (6 * v ** 2)) * sp.diff(psi, v)
    f = v ** 3 / (sp.pi * Ms)
    phase = -2 * sp.pi * f * tau - psi
    syms = (v, Ms, eta_s, beta_s, sigma_s)
    return (sp.lambdify(syms, tau, "numpy"),
            sp.lambdify(syms, phase, "numpy"),
            sp.lambdify((v, eta_s, beta_s, sigma_s), psi, "numpy"))


def test_tau_phase_match_published_series():
    tau_ref, phase_ref, psi_ref = _sympy_tau_phase()
    for (m1, m2, c1, c2) in [(30.0, 25.0, 0.5, -0.3),
                             (40.0, 10.0, 0.0, 0.0),
                             (20.0, 20.0, 0.9, 0.9)]:
        M_s, eta, beta, sig = _params(m1, m2, c1, c2)
        for v in (0.15, 0.25, 0.35, 0.45):
            t_mod = float(pn.tau_of_v(v, M_s, eta, beta, sig))
            p_mod = float(pn.phase_of_v(v, M_s, eta, beta, sig))
            s_mod = float(pn.psi_of_v(v, eta, beta, sig))
            t_ref = float(tau_ref(v, M_s, eta, beta, sig))
            p_ref = float(phase_ref(v, M_s, eta, beta, sig))
            s_ref = float(psi_ref(v, eta, beta, sig))
            assert abs(s_mod - s_ref) <= 2e-5 * abs(s_ref)
            assert abs(t_mod - t_ref) <= 2e-5 * max(abs(t_ref), 1e-6)
            assert abs(p_mod - p_ref) <= 2e-5 * max(abs(p_ref), 1e-6)


def test_tau_matches_autodiff_of_psi():
    """The analytic tau/dtau must equal jax.grad of psi (catches hand-
    differentiation typos independently of the sympy path)."""
    M_s, eta, beta, sig = _params()
    dpsi = jax.grad(lambda v: pn.psi_of_v(v, eta, beta, sig))
    dtau = jax.grad(lambda v: pn.tau_of_v(v, M_s, eta, beta, sig))
    for v in (0.15, 0.25, 0.35, 0.45):
        t_ad = -(M_s / (6 * v * v)) * float(dpsi(v))
        t_an = float(pn.tau_of_v(v, M_s, eta, beta, sig))
        assert abs(t_an - t_ad) <= 1e-5 * abs(t_ad)
        d_ad = float(dtau(v))
        d_an = float(pn._dtau_dv(v, M_s, eta, beta, sig))
        assert abs(d_an - d_ad) <= 1e-5 * abs(d_ad)


def test_newtonian_limit():
    """At tiny v the 0PN terms dominate: tau -> 5M/(256 eta v^8) and
    Phi -> -(1/(16 eta v^5))."""
    M_s, eta, _, _ = _params(c1=0.0, c2=0.0)
    v = 0.02
    t = float(pn.tau_of_v(v, M_s, eta, 0.0, 0.0))
    t0 = 5.0 * M_s / (256.0 * eta * v ** 8)
    assert abs(t - t0) / t0 < 5e-3          # 1PN correction ~ 1.5e-3 at v=0.02
    p = float(pn.phase_of_v(v, M_s, eta, 0.0, 0.0))
    p0 = -1.0 / (16.0 * eta * v ** 5)
    assert abs(p - p0) / abs(p0) < 5e-3


def test_dphase_dt_equals_2pi_f():
    """SPA consistency: dPhi/dt == 2 pi f identically (chain rule through
    dv/dt = -1/tau')."""
    M_s, eta, beta, sig = _params()
    dphase = jax.grad(lambda v: pn.phase_of_v(v, M_s, eta, beta, sig))
    for v in (0.2, 0.3, 0.4):
        dv_dt = -1.0 / float(pn._dtau_dv(v, M_s, eta, beta, sig))
        lhs = float(dphase(v)) * dv_dt
        f = v ** 3 / (np.pi * M_s)
        assert abs(lhs - 2 * np.pi * f) <= 1e-4 * 2 * np.pi * f


# ---------------------------------------------------------------------------
# Spin parameter combinations
# ---------------------------------------------------------------------------

def test_beta_symmetric_basis_identity():
    """beta per-body form == (113/12)[(1 - 76 eta/113) chi_s + delta chi_a]."""
    for (m1, m2, c1, c2) in [(30.0, 25.0, 0.5, -0.3), (40.0, 10.0, 0.8, 0.2)]:
        M = m1 + m2
        eta = m1 * m2 / M ** 2
        chi_s, chi_a = (c1 + c2) / 2, (c1 - c2) / 2
        delta = (m1 - m2) / M
        expect = (113.0 / 12.0) * ((1 - 76.0 * eta / 113.0) * chi_s
                                   + delta * chi_a)
        beta, _ = pn.spin_phasing_params(m1, m2, c1, c2)
        assert abs(float(beta) - expect) < 1e-10


def test_sigma_spin_spin():
    _, sig = pn.spin_phasing_params(30.0, 25.0, 0.4, 0.5)
    eta = 30.0 * 25.0 / 55.0 ** 2
    assert abs(float(sig) - (79.0 / 8.0) * eta * 0.4 * 0.5) < 1e-12


def test_kerr_isco_limits():
    # chi=0 reduces to the Schwarzschild ISCO used by the 0PN engine
    f0 = float(pn.kerr_isco_f_gw(30.0, 25.0, 0.0))
    fs_ref = float(synth.isco_frequency(jnp.asarray(30.0), jnp.asarray(25.0)))
    assert abs(f0 - fs_ref) / fs_ref < 1e-5
    # prograde spin raises f_isco, retrograde lowers it
    assert float(pn.kerr_isco_f_gw(30.0, 25.0, 0.9)) > f0
    assert float(pn.kerr_isco_f_gw(30.0, 25.0, -0.9)) < f0


# ---------------------------------------------------------------------------
# Inversion + assembled waveform
# ---------------------------------------------------------------------------

def test_invert_tau_roundtrip():
    M_s, eta, beta, sig = _params()
    v_min = float(np.cbrt(np.pi * M_s * 10.0))
    f_term = float(pn.kerr_isco_f_gw(M1, M2, pn.chi_eff(M1, M2, CHI1, CHI2)))
    v_cand = float(np.cbrt(np.pi * M_s * f_term))
    v_term = float(pn.monotone_v_term(v_min, v_cand, M_s, eta, beta, sig))
    tau_hi = float(pn.tau_of_v(v_min, M_s, eta, beta, sig))
    taus = jnp.linspace(0.01, 0.95 * tau_hi, 64)
    v_sol = pn.invert_tau(taus, M_s, eta, beta, sig, v_min, v_term)
    back = pn.tau_of_v(v_sol, M_s, eta, beta, sig)
    assert float(jnp.max(jnp.abs(back - taus) / taus)) < 1e-4


def test_waveform_is_spin_sensitive():
    """The conditioning channels must carry signal: same masses, different
    aligned spins -> decorrelated waveforms; tiny spin change -> nearly
    identical."""
    def wave(c1, c2):
        h = pn.pn_chirp(jnp.asarray(M1), jnp.asarray(M2), jnp.asarray(c1),
                        jnp.asarray(c2), n=8192, fs=4096)
        return np.asarray(h, np.float64) * 1e21

    def corr(a, b):
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))

    h0 = wave(0.0, 0.0)
    assert corr(h0, wave(0.8, 0.8)) < 0.3
    assert corr(h0, wave(-0.8, -0.8)) < 0.3
    assert corr(h0, wave(0.02, -0.02)) > 0.9


def test_duration_orderings():
    """1PN lengthening + spin-orbit: retrograde < zero-spin < prograde, and
    the chirp fits the synth segment conventions (finite, merger near end)."""
    d = [float(pn.pn_duration(30.0, 25.0, c, c)) for c in (-0.8, 0.0, 0.8)]
    assert d[0] < d[1] < d[2]
    h = np.asarray(pn.pn_chirp(jnp.asarray(30.0), jnp.asarray(25.0),
                               jnp.asarray(0.5), jnp.asarray(0.5),
                               n=8192, fs=4096), np.float64)
    assert np.isfinite(h).all()
    peak = int(np.argmax(np.abs(h)))
    assert 8192 - 600 < peak < 8192          # merger ~t_post before the end
    # early part windowed to zero
    assert np.abs(h[:100]).max() < 1e-3 * np.abs(h).max()


def test_generate_sample_pn_engine_snr_and_spin():
    """generate_sample with the default pn engine hits the target
    matched-filter SNR and responds to spins."""
    cfg = synth.SynthConfig(n=8192, fs=4096)
    assert cfg.engine == "pn"
    key = jax.random.PRNGKey(0)
    out = synth.generate_sample(key, jnp.asarray(30.0), jnp.asarray(25.0),
                                jnp.asarray(20.0), jnp.asarray(0.7),
                                jnp.asarray(0.7), config=cfg)
    got = synth.matched_filter_sigma(out["signal"], out["psd"], 4096.0, 20.0)
    assert abs(float(got) - 20.0) / 20.0 < 1e-3
    out0 = synth.generate_sample(key, jnp.asarray(30.0), jnp.asarray(25.0),
                                 jnp.asarray(20.0), jnp.asarray(0.0),
                                 jnp.asarray(0.0), config=cfg)
    s1 = np.asarray(out["signal"], np.float64)
    s0 = np.asarray(out0["signal"], np.float64)
    num = float((s1 * s0).sum())
    den = float(np.sqrt((s1 * s1).sum() * (s0 * s0).sum()))
    assert abs(num / den) < 0.5      # spins changed the waveform


def test_generate_batch_passes_spins():
    cfg = synth.SynthConfig(n=4096, fs=4096)
    key = jax.random.PRNGKey(1)
    out = synth.generate_batch(
        key, jnp.asarray([30.0, 30.0]), jnp.asarray([25.0, 25.0]),
        jnp.asarray([20.0, 20.0]), jnp.asarray([0.8, -0.8]),
        jnp.asarray([0.8, -0.8]), config=cfg)
    s = np.asarray(out["signal"], np.float64)
    num = float((s[0] * s[1]).sum())
    den = float(np.sqrt((s[0] ** 2).sum() * (s[1] ** 2).sum()))
    assert abs(num / den) < 0.5      # different spins -> different waveforms


# ---------------------------------------------------------------------------
# Kerr-remnant QNM merger-ringdown (round-3 upgrade)
# ---------------------------------------------------------------------------

def test_remnant_fit_anchor_values():
    """Equal-mass nonspinning remnant: a_f ~ 0.686, E_rad ~ 4.8% — the
    standard numerical-relativity anchors the Barausse-Rezzolla /
    Barausse-Morozova-Rezzolla fits were calibrated to."""
    m_f_s, a_f = pn.final_mass_spin(30.0, 30.0, 0.0, 0.0)
    M_s = 60.0 * pn.MSUN_S
    assert abs(float(a_f) - 0.686) < 0.02
    assert abs((1.0 - float(m_f_s) / M_s) - 0.048) < 0.005
    # aligned spin monotonicity: prograde spins spin the remnant up
    _, a_hi = pn.final_mass_spin(30.0, 30.0, 0.8, 0.8)
    _, a_lo = pn.final_mass_spin(30.0, 30.0, -0.8, -0.8)
    assert float(a_lo) < float(a_f) < float(a_hi)
    assert 0.0 < float(a_lo)          # retrograde 0.8 still ends prograde


def test_qnm_fit_anchor_values():
    """Berti-Cardoso-Will l=m=2 n=0 fit: Schwarzschild M*omega ~ 0.3737
    (fit within 2%), Q ~ 2.12; frequency and damping time both grow with
    remnant spin."""
    f0, tau0 = pn.qnm_f_tau(jnp.asarray(1.0), jnp.asarray(0.0))
    omega0 = 2.0 * np.pi * float(f0)
    assert abs(omega0 - 0.3737) / 0.3737 < 0.02
    q0 = omega0 * float(tau0) / 2.0
    assert abs(q0 - 2.118) < 0.05
    f9, tau9 = pn.qnm_f_tau(jnp.asarray(1.0), jnp.asarray(0.9))
    assert float(f9) > float(f0)
    assert float(tau9) > float(tau0)


def test_qnm_ringdown_frequency_above_termination():
    """The QNM ringdown of the remnant sits ABOVE the ISCO termination
    frequency for ordinary parameters (the merger chirps UP, as in NR)."""
    for c in (-0.5, 0.0, 0.5):
        m_f_s, a_f = pn.final_mass_spin(M1, M2, c, c)
        f_qnm, _ = pn.qnm_f_tau(m_f_s, a_f)
        f_term = pn.kerr_isco_f_gw(M1, M2, pn.chi_eff(M1, M2, c, c))
        assert float(f_qnm) > float(f_term)


def test_qnm_attachment_continuity():
    """Phase-continuous attachment: on an oversampled grid the waveform has
    no sample-to-sample jump beyond what the instantaneous frequency allows
    (a discontinuity at t_term would violate this by orders of magnitude)."""
    fs = 16384
    h = np.asarray(pn.pn_chirp(jnp.asarray(M1), jnp.asarray(M2),
                               jnp.asarray(0.5), jnp.asarray(0.5),
                               n=4 * fs, fs=fs), np.float64) * 1e21
    m_f_s, a_f = pn.final_mass_spin(M1, M2, 0.5, 0.5)
    f_qnm, _ = pn.qnm_f_tau(m_f_s, a_f)
    bound = 2.0 * np.pi * float(f_qnm) / fs * np.abs(h).max() * 1.5
    assert np.abs(np.diff(h)).max() < bound


def test_qnm_vs_isco_ringdown_differ_only_post_merger():
    """ringdown='isco' keeps the legacy waveform; the two modes agree
    exactly through the inspiral and differ after termination."""
    kw = dict(n=8192, fs=4096)
    args = (jnp.asarray(M1), jnp.asarray(M2), jnp.asarray(0.3),
            jnp.asarray(0.3))
    h_q = np.asarray(pn.pn_chirp(*args, ringdown="qnm", **kw), np.float64)
    h_i = np.asarray(pn.pn_chirp(*args, ringdown="isco", **kw), np.float64)
    d = np.abs(h_q - h_i)
    assert d.max() > 0.0                       # post-merger genuinely differs
    first_diff = int(np.argmax(d > 1e-12 * np.abs(h_i).max()))
    # inspiral (everything before the last ~0.1 s) is bit-identical
    assert first_diff > 8192 - int(0.1 * 4096) - 1
    assert np.allclose(h_q[:first_diff], h_i[:first_diff])


def test_generate_sample_qnm_config_plumbed():
    """SynthConfig.ringdown reaches pn_chirp through generate_sample."""
    key = jax.random.PRNGKey(0)
    out_q = synth.generate_sample(
        key, jnp.asarray(M1), jnp.asarray(M2), jnp.asarray(20.0),
        jnp.asarray(0.4), jnp.asarray(0.4),
        config=synth.SynthConfig(n=8192, fs=4096, ringdown="qnm"))
    out_i = synth.generate_sample(
        key, jnp.asarray(M1), jnp.asarray(M2), jnp.asarray(20.0),
        jnp.asarray(0.4), jnp.asarray(0.4),
        config=synth.SynthConfig(n=8192, fs=4096, ringdown="isco"))
    sq = np.asarray(out_q["signal"], np.float64)
    si = np.asarray(out_i["signal"], np.float64)
    assert np.isfinite(sq).all() and np.isfinite(si).all()
    assert np.abs(sq - si).max() > 0.0


def test_invert_tau_bracketed_f_lower_independence():
    """The waveform near merger must not depend on the f_lower used to
    generate it (regression: the clip-only Newton safeguard phase-glitched
    near the tau turnover, landing on a v that depended on v_min; r4 fix =
    bracketed Newton-bisection).  (20+20, chi=+0.6) reproduced it."""
    import numpy as np

    fs, n = 4096, 32768
    tails = {}
    for fl in (14.0, 20.0):
        h = np.asarray(pn.pn_chirp(
            jnp.asarray(20.0), jnp.asarray(20.0),
            jnp.asarray(0.6), jnp.asarray(0.6),
            n=n, fs=fs, distance=410.0, f_lower=fl,
            fplus=1.0, fcross=0.0), np.float64)
        pk = int(np.argmax(np.abs(h)))
        tails[fl] = h[pk - 2048:pk + 128]
    a, b = tails[14.0], tails[20.0]
    corr = float(np.dot(a, b) / np.sqrt(np.dot(a, a) * np.dot(b, b)))
    assert corr > 0.9999, corr


def test_invert_tau_matches_forward_tau():
    """invert_tau(tau_of_v(v)) == v across the branch (bracket correctness)."""
    import numpy as np

    M_s, eta = pn.mass_params(30.0, 25.0)
    beta, sigma = pn.spin_phasing_params(30.0, 25.0, 0.4, -0.3)
    v_min, v_max = 0.15, 0.45
    v_true = jnp.linspace(v_min + 1e-3, v_max - 1e-3, 257)
    tau = pn.tau_of_v(v_true, M_s, eta, beta, sigma)
    v_rec = pn.invert_tau(tau, M_s, eta, beta, sigma, v_min, v_max)
    assert float(jnp.max(jnp.abs(v_rec - v_true))) < 1e-5


def test_below_band_taper_preserves_in_band_signal():
    """f_taper_frac < 1 moves the half-Hann turn-on below the analysis band:
    the waveform is bit-identical to the legacy one once the legacy ramp has
    completed, is UNdistorted at the f_lower crossing (window already 1),
    and still starts from zero amplitude."""
    fs, n, fl = 4096, 1 << 16, 20.0
    kw = dict(n=n, fs=fs, distance=410.0, f_lower=fl, fplus=1.0, fcross=0.0)
    h_leg = np.asarray(pn.pn_chirp(
        jnp.asarray(M1), jnp.asarray(M2), jnp.asarray(CHI1),
        jnp.asarray(CHI2), **kw), np.float64)
    h_tap = np.asarray(pn.pn_chirp(
        jnp.asarray(M1), jnp.asarray(M2), jnp.asarray(CHI1),
        jnp.asarray(CHI2), f_taper_frac=0.85, **kw), np.float64)

    # locate the f_lower crossing time like the module does
    M_s, eta = pn.mass_params(M1, M2)
    beta, sigma = pn.spin_phasing_params(M1, M2, CHI1, CHI2)
    dt = 1.0 / fs
    t_c = (n - 1) * dt - 0.05
    v_low = float(jnp.cbrt(jnp.pi * M_s * fl))
    t_start = t_c - float(pn.tau_of_v(v_low, M_s, eta, beta, sigma))
    i_start = int(t_start / dt)

    # both windows are exactly 1 after the legacy 0.25 s ramp completes
    i_done = int((t_start + 0.25) / dt) + 2
    np.testing.assert_array_equal(h_tap[i_done:], h_leg[i_done:])

    # at the band edge the new taper is already done: the tapered waveform
    # matches the legacy waveform's UNwindowed envelope there, i.e. it is
    # strictly larger than the legacy half-suppressed samples just after
    # the crossing (legacy window < 0.1 in the first 10% of its ramp)
    seg = slice(i_start, i_start + int(0.02 / dt))
    rms_tap = np.sqrt(np.mean(h_tap[seg] ** 2))
    rms_leg = np.sqrt(np.mean(h_leg[seg] ** 2))
    assert rms_tap > 3.0 * rms_leg, (rms_tap, rms_leg)

    # the turn-on still reaches zero before the taper-start frequency
    v_tap = float(jnp.cbrt(jnp.pi * M_s * (0.85 * fl)))
    t_tap = t_c - float(pn.tau_of_v(v_tap, M_s, eta, beta, sigma))
    i_tap = int(t_tap / dt) - 2
    assert i_tap > 0, "segment must contain the taper start"
    assert np.all(h_tap[:i_tap] == 0.0)

    # default is the legacy ramp (corpus-domain no-op guarantee)
    h_def = np.asarray(pn.pn_chirp(
        jnp.asarray(M1), jnp.asarray(M2), jnp.asarray(CHI1),
        jnp.asarray(CHI2), **kw), np.float64)
    np.testing.assert_array_equal(h_def, h_leg)


def test_f_taper_frac_range_validated():
    """ADVICE r4: f_taper_frac <= 0.5 would pin the below-band frequency at
    invert_tau's bracket floor (silent distortion) and <= 0 diverges the
    segment-length estimate — pn_chirp must reject the whole range."""
    import pytest
    kw = dict(n=1 << 12, fs=4096, distance=410.0, f_lower=20.0)
    for bad in (0.5, 0.0, -0.1, 1.2):
        with pytest.raises(ValueError, match="f_taper_frac"):
            pn.pn_chirp(jnp.asarray(M1), jnp.asarray(M2),
                        jnp.asarray(CHI1), jnp.asarray(CHI2),
                        f_taper_frac=bad, **kw)


def test_qnm_c1_inspiral_identical_and_attachment_smoother():
    """ringdown='qnm_c1' (round-5, VERDICT r4 item 6): identical inspiral,
    but the attachment is C^1, so the kink's broadband spectral splatter
    must shrink decisively.  The discriminating observable is power ABOVE
    the QNM frequency — no physical content lives at > 1.3 f_QNM, so
    anything there is attachment leakage (measured: ~4.4x reduction for
    this cell; asserted at 2x for headroom)."""
    fs = 16384
    n = 4 * fs
    args = (jnp.asarray(M1), jnp.asarray(M2), jnp.asarray(0.6),
            jnp.asarray(0.6))
    kw = dict(n=n, fs=fs)
    h_q = np.asarray(pn.pn_chirp(*args, ringdown="qnm", **kw), np.float64)
    h_c = np.asarray(pn.pn_chirp(*args, ringdown="qnm_c1", **kw), np.float64)
    assert np.isfinite(h_c).all()

    # pre-termination samples are bit-identical (same inspiral code path)
    d = np.abs(h_q - h_c)
    first_diff = int(np.argmax(d > 1e-12 * np.abs(h_q).max()))
    assert first_diff > n - int(0.1 * fs)

    m_f_s, a_f = pn.final_mass_spin(M1, M2, 0.6, 0.6)
    f_qnm = float(pn.qnm_f_tau(m_f_s, a_f)[0])
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    above = (freqs > 1.3 * f_qnm) & (freqs < 4.0 * f_qnm)
    inband = (freqs > 20.0) & (freqs < 1.1 * f_qnm)

    def leak(h):
        P = np.abs(np.fft.rfft(h)) ** 2
        return P[above].sum() / P[inband].sum()

    l_q, l_c = leak(h_q), leak(h_c)
    assert l_c < 0.5 * l_q, (l_c, l_q)


def test_qnm_c1_config_plumbed():
    """SynthConfig.ringdown='qnm_c1' reaches pn_chirp via generate_sample
    and differs from 'qnm' only post-termination."""
    from diffusion_models_for_gravitational_waveform_reconstruction_tpu.data import (
        synth,
    )
    key = jax.random.PRNGKey(3)
    out_q = synth.generate_sample(
        key, m1=30.0, m2=25.0, spin1z=0.4, spin2z=0.4, target_snr=12.0,
        config=synth.SynthConfig(n=8192, fs=4096, ringdown="qnm"))
    out_c = synth.generate_sample(
        key, m1=30.0, m2=25.0, spin1z=0.4, spin2z=0.4, target_snr=12.0,
        config=synth.SynthConfig(n=8192, fs=4096, ringdown="qnm_c1"))
    c_q = np.asarray(out_q["signal"], np.float64)
    c_c = np.asarray(out_c["signal"], np.float64)
    assert np.abs(c_q - c_c).max() > 0.0
    # the target-SNR rescale is global and differs between modes (the C^1
    # merger carries different matched-filter weight), so UNDO it with the
    # returned raw_sigma: the physical waveforms then agree bit-for-bit
    # through the inspiral and differ only near the merger (last ~0.15 s)
    p_q = c_q * float(out_q["raw_sigma"])
    p_c = c_c * float(out_c["raw_sigma"])
    d = np.abs(p_q - p_c)
    first_diff = int(np.argmax(d > 1e-7 * np.abs(p_q).max()))
    assert first_diff > 8192 - int(0.15 * 4096)
