"""3.5PN spin-dependent inspiral waveforms (TaylorT2-style), pure JAX.

Upgrades the framework's waveform engine from the restricted 0PN chirp in
``data/synth.py`` to post-Newtonian phasing with aligned-spin effects, so the
``spin1z``/``spin2z`` conditioning channels carry real signal — the TPU-native
stand-in for the reference's SEOBNRv4 generation
(``/root/reference/src/snr_denoising/gen.py:70-79``, spins passed at 74-75).

Construction
------------
Start from the standard **TaylorF2 stationary-phase series** (Buonanno, Iyer,
Ochsner, Pan & Sathyaprakash 2009, PRD 80 084043, Eq. 3.18; LALSimulation
``XLALSimInspiralPNCoefficients``), with v = (pi M f)^(1/3):

    Psi(f) = 2 pi f t_c - phi_c - pi/4 + psi(v)
    psi(v) = 3/(128 eta v^5) * sum_k c_k v^k        (k = 0,2,3,4,5L,6L,7)

including the leading aligned-spin terms: spin-orbit ``beta`` at 1.5PN and
spin-spin ``sigma`` at 2PN (Poisson & Will 1995, PRD 52 848, Eqs. 3.3-3.8).
The time-domain phasing follows exactly from the stationary-phase relations

    t(f)   = (1/2pi) dPsi/df        =>  tau(v) = t_c - t = -(M/(6 v^2)) psi'(v)
    Phi(f) = 2 pi f t(f) - Psi(f) - pi/4
           = phi_c - 2 pi f tau(v) - psi(v)

which reproduce the classic TaylorT2 expansions (checked in tests against an
independent sympy derivation and against jax.grad of psi).  These relations
also make dPhi/dt = 2 pi f(t) hold *identically* at any truncation order, so
the instantaneous frequency is exactly consistent with the phase.

Waveform assembly (all static shapes, fully jit/vmap-able):

1. spin-dependent termination: Kerr ISCO of the aligned effective spin
   chi_eff = (m1 chi1 + m2 chi2)/M via the Bardeen-Press-Teukolsky r_isco
   formula, clipped to the band and to the largest v on which tau(v) is
   monotone (runtime grid check — the PN series turns over near merger);
2. per-sample Newton inversion of tau(v) on the uniform time grid (Newtonian
   closed form as the initial iterate; ~8 safeguarded iterations, pure
   elementwise math on the VPU — no data-dependent control flow);
3. restricted (0PN) amplitude A = (4/D) Mc^(5/3) (pi f)^(2/3) on both
   polarizations, matched exponentially-damped ringdown at the termination
   frequency, and the same half-Hann turn-on at the f_lower crossing as the
   Newtonian engine.

Scope: aligned spins only (beta, sigma), restricted amplitude, through 3.5PN
in phase.  This is TaylorT2-class physics, not an EOB merger model — but the
phasing now responds to masses AND spins the way matched-filter pipelines
expect, and termination/duration are spin-dependent.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# geometric unit conversions (same values as data/synth.py; duplicated to
# keep this module import-cycle-free — synth.py imports pn.py)
MSUN_S = 4.925490947641267e-06    # G * Msun / c^3  [seconds]
MPC_S = 1.02927125054339e14       # 1 Mpc / c       [seconds]

EULER_GAMMA = 0.5772156649015329

_LN4 = 1.3862943611198906


# ---------------------------------------------------------------------------
# Mass / spin parameter combinations
# ---------------------------------------------------------------------------

def mass_params(m1, m2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Total mass in seconds and symmetric mass ratio eta."""
    M = m1 + m2
    eta = (m1 * m2) / (M * M)
    return M * MSUN_S, eta


def spin_phasing_params(m1, m2, chi1, chi2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aligned-spin phasing parameters (beta, sigma).

    beta: 1.5PN spin-orbit, beta = (1/12) sum_i [113 (m_i/M)^2 + 75 eta] chi_i
    sigma: 2PN spin-spin (aligned), sigma = (79/8) eta chi1 chi2
    (Poisson & Will 1995; equivalently beta = (113/12)[(1-76 eta/113) chi_s
    + delta chi_a] in the symmetric/antisymmetric basis.)
    """
    M = m1 + m2
    eta = (m1 * m2) / (M * M)
    x1 = m1 / M
    x2 = m2 / M
    beta = ((113.0 * x1 * x1 + 75.0 * eta) * chi1
            + (113.0 * x2 * x2 + 75.0 * eta) * chi2) / 12.0
    sigma = (79.0 / 8.0) * eta * chi1 * chi2
    return beta, sigma


def chi_eff(m1, m2, chi1, chi2) -> jnp.ndarray:
    """Mass-weighted aligned effective spin."""
    M = m1 + m2
    return (m1 * chi1 + m2 * chi2) / M


def kerr_isco_f_gw(m1, m2, chi) -> jnp.ndarray:
    """GW frequency (= 2 x orbital) of the Kerr ISCO for spin chi.

    Bardeen-Press-Teukolsky: with Z1 = 1 + (1-chi^2)^(1/3)[(1+chi)^(1/3)
    + (1-chi)^(1/3)], Z2 = sqrt(3 chi^2 + Z1^2),
    r_isco/M = 3 + Z2 -+ sqrt((3-Z1)(3+Z1+2Z2))  (prograde: minus sign).
    Orbital frequency M Omega = 1/(r^(3/2) + chi);  f_gw = Omega/pi.
    chi=0 reduces to the Schwarzschild ISCO (r=6M), matching
    ``synth.isco_frequency``.
    """
    M_s = (m1 + m2) * MSUN_S
    a = jnp.clip(chi, -0.998, 0.998)
    one_m = jnp.maximum(1.0 - a * a, 1e-9)
    z1 = 1.0 + jnp.cbrt(one_m) * (jnp.cbrt(1.0 + a) + jnp.cbrt(1.0 - a))
    z2 = jnp.sqrt(3.0 * a * a + z1 * z1)
    root = jnp.sqrt(jnp.maximum((3.0 - z1) * (3.0 + z1 + 2.0 * z2), 0.0))
    r = 3.0 + z2 - jnp.sign(a) * root
    m_omega = 1.0 / (jnp.power(r, 1.5) + a)
    return m_omega / (jnp.pi * M_s)


# ---------------------------------------------------------------------------
# Remnant (final black hole) and quasi-normal-mode fits
# ---------------------------------------------------------------------------

def final_mass_spin(m1, m2, chi1, chi2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Remnant mass (seconds) and dimensionless spin of the merged hole.

    Final spin: Barausse & Rezzolla 2009 (ApJ 704 L40) aligned-spin fit,
        a_f = chi + s4 chi^2 nu + s5 chi nu^2 + t0 chi nu
              + 2 sqrt(3) nu + t2 nu^2 + t3 nu^3,
    with chi the mass-weighted aligned spin and (s4, s5, t0, t2, t3) =
    (-0.1229, 0.4537, -2.8904, -3.5171, 2.5763).  Equal-mass nonspinning
    gives a_f ~ 0.686, the standard numerical-relativity value.

    Final mass: 1 - E_rad/M with the nonspinning radiated-energy fit of
    Barausse, Morozova & Rezzolla 2012 (ApJ 758 63),
        E_rad/M = 0.0559745 nu + 0.580951 nu^2
                  - 0.960673 nu^3 + 3.35241 nu^4
    (4.8% for equal masses).  The spin dependence of E_rad (a further
    ~±2% of M at |chi|=0.8) is neglected — small against the restricted-
    amplitude approximation used for the inspiral.
    """
    M_s, eta = mass_params(m1, m2)
    chi = chi_eff(m1, m2, chi1, chi2)
    s4, s5, t0, t2, t3 = -0.1229, 0.4537, -2.8904, -3.5171, 2.5763
    a_f = (chi + s4 * chi * chi * eta + s5 * chi * eta * eta + t0 * chi * eta
           + 2.0 * jnp.sqrt(3.0) * eta + t2 * eta * eta
           + t3 * eta * eta * eta)
    a_f = jnp.clip(a_f, -0.998, 0.998)
    e_rad = eta * (0.0559745 + eta * (0.580951 + eta * (-0.960673
                                                        + 3.35241 * eta)))
    return M_s * (1.0 - e_rad), a_f


def qnm_f_tau(m_f_s, a_f) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frequency (Hz) and damping time (s) of the l=m=2, n=0 Kerr QNM.

    Berti, Cardoso & Will 2006 (PRD 73 064030, Table VIII) fits:
        M_f omega_R = 1.5251 - 1.1568 (1 - a_f)^0.1292
        Q           = 0.7000 + 1.4187 (1 - a_f)^-0.4990
    with tau = 2 Q / omega_R = Q / (pi f).  Schwarzschild limit:
    M omega ~ 0.368 (exact 0.3737, fit error ~1.4%), Q ~ 2.12.
    """
    one_m = jnp.maximum(1.0 - a_f, 1e-4)
    omega = (1.5251 - 1.1568 * jnp.power(one_m, 0.1292)) / m_f_s
    q = 0.7000 + 1.4187 * jnp.power(one_m, -0.4990)
    f_rd = omega / (2.0 * jnp.pi)
    tau_rd = 2.0 * q / omega
    return f_rd, tau_rd


# ---------------------------------------------------------------------------
# 3.5PN phasing series and its SPA-derived tau / Phi
# ---------------------------------------------------------------------------

def _coeffs(eta, beta, sigma):
    """TaylorF2 phasing coefficients c_k (k=2,3,4,5,6,7); c5/c6 carry ln v
    split into (constant, ln-v slope) parts."""
    pi = jnp.pi
    c2 = 3715.0 / 756.0 + 55.0 * eta / 9.0
    c3 = 4.0 * beta - 16.0 * pi
    c4 = (15293365.0 / 508032.0 + 27145.0 * eta / 504.0
          + 3085.0 * eta * eta / 72.0 - 10.0 * sigma)
    a5 = pi * (38645.0 / 756.0 - 65.0 * eta / 9.0)
    # c5(v) = a5 * (1 + 3 ln v)
    c6_const = (11583231236531.0 / 4694215680.0 - 640.0 * pi * pi / 3.0
                - 6848.0 * (EULER_GAMMA + _LN4) / 21.0
                + (-15737765635.0 / 3048192.0 + 2255.0 * pi * pi / 12.0) * eta
                + 76055.0 * eta * eta / 1728.0
                - 127825.0 * eta * eta * eta / 1296.0)
    c6_ln = -6848.0 / 21.0          # c6(v) = c6_const + c6_ln * ln v
    c7 = pi * (77096675.0 / 254016.0 + 378515.0 * eta / 1512.0
               - 74045.0 * eta * eta / 756.0)
    return c2, c3, c4, a5, c6_const, c6_ln, c7


def psi_of_v(v, eta, beta, sigma):
    """SPA phasing psi(v) = 3/(128 eta v^5) sum_k c_k v^k (3.5PN, aligned
    spin)."""
    c2, c3, c4, a5, c6c, c6l, c7 = _coeffs(eta, beta, sigma)
    lv = jnp.log(v)
    series = (1.0 + c2 * v ** 2 + c3 * v ** 3 + c4 * v ** 4
              + a5 * (1.0 + 3.0 * lv) * v ** 5
              + (c6c + c6l * lv) * v ** 6
              + c7 * v ** 7)
    return 3.0 / (128.0 * eta) * series / v ** 5


def tau_of_v(v, M_s, eta, beta, sigma):
    """Time to coalescence tau(v) = -(M/(6 v^2)) dpsi/dv (analytic).

    Newtonian limit: 5 M / (256 eta v^8).  The 1PN/2PN terms reproduce the
    published TaylorT2 coefficients (743/252 + 11 eta/3, etc.) — verified in
    tests against sympy differentiation of an independently-typed psi.
    """
    c2, c3, c4, a5, c6c, c6l, c7 = _coeffs(eta, beta, sigma)
    lv = jnp.log(v)
    bracket = (5.0 / v ** 8
               + 3.0 * c2 / v ** 6
               + 2.0 * c3 / v ** 5
               + c4 / v ** 4
               - 3.0 * a5 / v ** 3
               - (c6c + c6l * lv + c6l) / v ** 2
               - 2.0 * c7 / v)
    return (M_s / (256.0 * eta)) * bracket


def phase_of_v(v, M_s, eta, beta, sigma):
    """GW phase relative to coalescence: Phi(v) - phi_c = -2 pi f tau - psi.

    Together with ``tau_of_v`` this satisfies dPhi/dt = 2 pi f identically
    (SPA consistency), with f = v^3 / (pi M).
    """
    f = v ** 3 / (jnp.pi * M_s)
    return (-2.0 * jnp.pi * f * tau_of_v(v, M_s, eta, beta, sigma)
            - psi_of_v(v, eta, beta, sigma))


def _dtau_dv(v, M_s, eta, beta, sigma):
    """Analytic d tau / dv (for Newton inversion)."""
    c2, c3, c4, a5, c6c, c6l, c7 = _coeffs(eta, beta, sigma)
    lv = jnp.log(v)
    bracket = (-40.0 / v ** 9
               - 18.0 * c2 / v ** 7
               - 10.0 * c3 / v ** 6
               - 4.0 * c4 / v ** 5
               + 9.0 * a5 / v ** 4
               + (2.0 * (c6c + c6l * lv + c6l) - c6l) / v ** 3
               + 2.0 * c7 / v ** 2)
    return (M_s / (256.0 * eta)) * bracket


def monotone_v_term(v_min, v_cand, M_s, eta, beta, sigma, npts: int = 64):
    """Largest v <= v_cand with tau'(v) < 0 on [v_min, v], via a grid scan.

    The truncated PN tau(v) can turn over below the Kerr ISCO for extreme
    parameters; terminating at the turnover keeps the Newton inversion
    well-posed.  Grid scan is jit-safe (no data-dependent shapes).
    """
    frac = jnp.linspace(0.0, 1.0, npts)
    vg = v_min + (v_cand - v_min) * frac
    d = _dtau_dv(vg, M_s, eta, beta, sigma)
    bad = d >= 0.0
    any_bad = jnp.any(bad)
    first_bad = jnp.argmax(bad)          # index of first non-monotone point
    # step back one grid point from the turnover (with a tiny safety factor)
    idx = jnp.maximum(first_bad - 1, 1)
    v_safe = vg[idx] * 0.999
    return jnp.where(any_bad, v_safe, v_cand)


def invert_tau(tau_target, M_s, eta, beta, sigma, v_min, v_max,
               iters: int = 24):
    """Solve tau(v) = tau_target elementwise by BRACKETED Newton-bisection.

    ``tau_target`` may be any shape; v_min/v_max are scalars bounding the
    monotone (tau-decreasing) branch.  Each element keeps a [lo, hi]
    bracket: Newton steps that stay inside it are taken (quadratic
    convergence); steps that leave it fall back to the midpoint, so the
    iteration can never escape the branch or cycle between the clip bounds.

    The previous clip-only safeguard could PHASE-GLITCH near the tau
    turnover: with tau_target ~ 0 the Newtonian initial iterate clips to
    v_max where dtau/dv -> 0, the floored derivative produced a huge step
    to the opposite bound, and the landing point depended on v_min — the
    same (m1, m2, chi) sample got a different (wrong) v near merger when
    generated with a different f_lower.  Measured on (20+20, chi=+0.6):
    zero-crossing frequencies near the peak ran ...85, 93, 68(!), 137,
    205 Hz with f_lower=14 vs a clean monotone sweep with f_lower=20; the
    TaylorF2-match of the assembly dropped 0.989 -> 0.931.  Bracketed
    bisection is f_lower-independent by construction.
    """
    tau_floor = jnp.maximum(tau_target, 1e-8)
    shape = jnp.shape(tau_floor)
    lo = jnp.broadcast_to(jnp.asarray(v_min, tau_floor.dtype), shape)
    hi = jnp.broadcast_to(jnp.asarray(v_max, tau_floor.dtype), shape)
    v0 = jnp.power(5.0 * M_s / (256.0 * eta * tau_floor), 0.125)
    v0 = jnp.clip(v0, v_min, v_max)

    def body(_, state):
        lo, hi, v = state
        t = tau_of_v(v, M_s, eta, beta, sigma)
        # tau decreasing: t > target => root lies at larger v
        above = t > tau_target
        lo = jnp.where(above, jnp.maximum(lo, v), lo)
        hi = jnp.where(above, hi, jnp.minimum(hi, v))
        d = jnp.minimum(_dtau_dv(v, M_s, eta, beta, sigma), -1e-12)
        v_newton = v - (t - tau_target) / d
        mid = 0.5 * (lo + hi)
        use_mid = (~jnp.isfinite(v_newton)) | (v_newton <= lo) | (v_newton >= hi)
        return lo, hi, jnp.where(use_mid, mid, v_newton)

    _, _, v = jax.lax.fori_loop(0, iters, body, (lo, hi, v0))
    return v


# ---------------------------------------------------------------------------
# Duration (for bucketing) and the full chirp
# ---------------------------------------------------------------------------

def pn_duration(m1, m2, chi1, chi2, f_lower: float = 20.0):
    """tau at the f_lower crossing — PN chirp duration in seconds.

    Vectorized over leading dims; used by the gen CLI for length bucketing
    (PN tau differs from the Newtonian estimate by 10-35% and is
    spin-dependent, so buckets must use the engine's actual duration).
    """
    M_s, eta = mass_params(m1, m2)
    beta, sigma = spin_phasing_params(m1, m2, chi1, chi2)
    v_low = jnp.cbrt(jnp.pi * M_s * f_lower)
    f_term = kerr_isco_f_gw(m1, m2, chi_eff(m1, m2, chi1, chi2))
    v_cand = jnp.cbrt(jnp.pi * M_s * jnp.maximum(f_term, 1.2 * f_lower))
    v_low = jnp.minimum(v_low, 0.98 * v_cand)
    return tau_of_v(v_low, M_s, eta, beta, sigma)


@partial(jax.jit, static_argnames=("n", "fs", "ringdown", "f_taper_frac"))
def pn_chirp(
    m1: jnp.ndarray,
    m2: jnp.ndarray,
    chi1: jnp.ndarray = 0.0,
    chi2: jnp.ndarray = 0.0,
    *,
    n: int,
    fs: int,
    distance: float = 410.0,
    f_lower: float = 20.0,
    phi_c: float = 0.0,
    inclination: float = 0.0,
    fplus: float = 1.0,
    fcross: float = 0.0,
    t_post: float = 0.05,
    ringdown_damp: float = 12.0,
    ringdown: str = "qnm",
    f_taper_frac: float = 1.0,
) -> jnp.ndarray:
    """Fixed-length detector-frame 3.5PN aligned-spin chirp.

    Drop-in counterpart of ``synth.newtonian_chirp`` with identical segment
    conventions: coalescence ``t_post`` seconds before the segment end,
    half-Hann turn-on at the f_lower crossing, and a merger-ringdown
    attachment matched in amplitude and phase at the (spin-dependent)
    termination.  Returns h (n,) float32.

    ``ringdown`` selects the post-inspiral model:

    - ``"qnm"`` (default): physical Kerr remnant ringdown.  The final
      mass/spin come from NR-calibrated fits (``final_mass_spin``) and the
      fundamental l=m=2 quasi-normal mode sets the ringdown frequency and
      damping time (``qnm_f_tau``).  The GW frequency blends exponentially
      from the termination frequency up to f_QNM over a ~10 M_f merger
      timescale (phase integrated in closed form, so phase and frequency
      stay continuous), while the amplitude tracks (f/f_term)^(2/3) through
      the blend — a brief merger bump — times the QNM exponential decay.
      This is the TPU-native analogue of the calibrated merger-ringdown the
      reference gets from SEOBNRv4 (ref ``gen.py:70-79``).
    - ``"qnm_c1"``: same physics with a C^1 (once-differentiable)
      attachment.  ``"qnm"`` is only C^0: the instantaneous frequency
      jumps from the inspiral chirp rate df/dt|_term to the fixed-
      timescale blend slope (f_QNM - f_term)/(10 M_f), and the QNM decay
      switches on at full rate — two envelope/frequency kinks whose
      spectral leakage lands IN BAND and dominates the chi=+0.6 cells of
      the TaylorF2 mismatch table (RESULTS.md).  Here the blend timescale
      is set so the frequency slope is continuous,
      tau_blend = (f_QNM - f_term) / (df/dt|_term), and the decay RATE
      ramps in with the same blend, exp(-(dt - tau_blend (1-e^-dt/tb))
      / tau_QNM), which starts at zero slope and approaches the exact QNM
      rate once the mode rings at f_QNM — so both frequency and the full
      amplitude envelope are C^1 at the attachment.  Opt-in: existing
      corpora (trained with "qnm") must stay generation-consistent.
    - ``"isco"``: legacy constant-frequency damped sinusoid at the
      termination frequency with ad-hoc decay ``ringdown_damp`` e-folds per
      angular cycle (round-3 behavior, kept for reproducibility).
    """
    # <= 0.5 would put the taper start below invert_tau's bracket floor
    # (v_min at 0.5*f_lower), silently pinning the below-band frequency;
    # <= 0 makes the segment-length estimate diverge (tau ~ f^{-8/3}).
    if not 0.5 < f_taper_frac <= 1.0:
        raise ValueError(
            f"f_taper_frac must be in (0.5, 1.0], got {f_taper_frac}")
    dt = 1.0 / fs
    M_s, eta = mass_params(m1, m2)
    mc_s = jnp.power(eta, 0.6) * M_s
    d_s = distance * MPC_S
    beta, sigma = spin_phasing_params(m1, m2, chi1, chi2)

    # spin-dependent termination, kept in band and on the monotone branch
    f_term = kerr_isco_f_gw(m1, m2, chi_eff(m1, m2, chi1, chi2))
    f_term = jnp.clip(f_term, 1.2 * f_lower, 0.45 * fs)
    v_cand = jnp.cbrt(jnp.pi * M_s * f_term)
    v_min = jnp.cbrt(jnp.pi * M_s * (0.5 * f_lower))
    v_term = monotone_v_term(v_min, v_cand, M_s, eta, beta, sigma)
    tau_term = tau_of_v(v_term, M_s, eta, beta, sigma)
    f_term = v_term ** 3 / (jnp.pi * M_s)

    t = jnp.arange(n) * dt
    t_c = (n - 1) * dt - t_post
    tau = t_c - t
    tau_eff = jnp.maximum(tau, tau_term)

    v = invert_tau(tau_eff, M_s, eta, beta, sigma, v_min, v_term)
    f_t = v ** 3 / (jnp.pi * M_s)
    phase = phi_c + phase_of_v(v, M_s, eta, beta, sigma)
    amp = (4.0 / d_s) * jnp.power(mc_s, 5.0 / 3.0) * jnp.power(
        jnp.pi * f_t, 2.0 / 3.0)

    ci = jnp.cos(inclination)
    hp = amp * (1.0 + ci * ci) / 2.0 * jnp.cos(phase)
    hc = amp * ci * jnp.sin(phase)
    h_insp = fplus * hp + fcross * hc

    # merger-ringdown attachment, matched in amplitude and phase at v_term
    t_term = t_c - tau_term
    phase_term = phi_c + phase_of_v(v_term, M_s, eta, beta, sigma)
    amp_term = (4.0 / d_s) * jnp.power(mc_s, 5.0 / 3.0) * jnp.power(
        jnp.pi * f_term, 2.0 / 3.0)
    dt_rd = jnp.maximum(t - t_term, 0.0)
    if ringdown in ("qnm", "qnm_c1"):
        m_f_s, a_f = final_mass_spin(m1, m2, chi1, chi2)
        f_qnm, tau_rd = qnm_f_tau(m_f_s, a_f)
        # QNM of a subsolar-band remnant can undershoot an extreme ISCO
        # termination after clipping; keep the blend target above f_term so
        # the frequency never runs backwards through the merger.
        f_qnm = jnp.maximum(f_qnm, 1.05 * f_term)
        if ringdown == "qnm_c1":
            # frequency-C^1 blend timescale: df/dt at the termination is
            # (df/dv)(dv/dt) = -3 v^2 / (pi M dtau/dv) (dtau/dv < 0 on the
            # monotone branch); matching the blend's initial slope
            # (f_QNM - f_term)/tau_blend to it removes the chirp-rate kink.
            # Clamped to [2, 100] M_f: turnover-terminated cells have
            # dtau/dv -> 0 (infinite chirp rate), and the clamp keeps the
            # merger sweep on a physical few-M_f timescale.
            dtau = jnp.minimum(
                _dtau_dv(v_term, M_s, eta, beta, sigma), -1e-30)
            fdot_term = -3.0 * v_term ** 2 / (jnp.pi * M_s * dtau)
            tau_blend = jnp.clip((f_qnm - f_term) / fdot_term,
                                 2.0 * m_f_s, 100.0 * m_f_s)
        else:
            tau_blend = 10.0 * m_f_s             # ~10 M_f merger timescale
        blend = jnp.exp(-dt_rd / tau_blend)
        f_rd_t = f_qnm - (f_qnm - f_term) * blend
        # closed-form integral of 2 pi f_rd_t dt -> continuous phase
        ph_rd = phase_term + 2.0 * jnp.pi * (
            f_qnm * dt_rd - (f_qnm - f_term) * tau_blend * (1.0 - blend))
        if ringdown == "qnm_c1":
            # decay rate ramps in with the same blend: the exponent is
            # -integral_0^dt (1 - e^{-s/tb}) ds / tau_QNM, zero slope at the
            # attachment, asymptotically the exact QNM rate (time-shifted
            # by tau_blend) — amplitude-C^1 given the frequency-C^1 blend,
            # since the (f/f_term)^(2/3) factor then matches the inspiral
            # amplitude slope at dt=0.
            decay_exp = -(dt_rd - tau_blend * (1.0 - blend)) / tau_rd
        else:
            decay_exp = -dt_rd / tau_rd
        decay = (amp_term * jnp.power(f_rd_t / f_term, 2.0 / 3.0)
                 * jnp.exp(decay_exp))
    else:
        tau_rd = ringdown_damp / (2.0 * jnp.pi * f_term)
        ph_rd = phase_term + 2.0 * jnp.pi * f_term * dt_rd
        decay = amp_term * jnp.exp(-dt_rd / tau_rd)
    h_rd = (fplus * decay * (1.0 + ci * ci) / 2.0 * jnp.cos(ph_rd)
            + fcross * decay * ci * jnp.sin(ph_rd))

    h = jnp.where(tau > tau_term, h_insp, h_rd)

    # half-Hann turn-on.  Legacy (f_taper_frac=1.0, corpus-domain default):
    # the ramp STARTS at the f_lower crossing and rises over 0.25 s, so the
    # first quarter-second of IN-BAND signal is amplitude-distorted — the
    # dominant term in the measured full-band TaylorF2 mismatch
    # (RESULTS.md fidelity table).  With f_taper_frac < 1 the ramp spans
    # [t(f_taper_frac*f_lower), t(f_lower)] and COMPLETES at the band edge:
    # the distortion sits where the whitening weight is ~0 and the in-band
    # waveform is untouched.  Kept opt-in so already-generated corpora stay
    # domain-consistent (train and eval must share the turn-on).
    v_low = jnp.minimum(jnp.cbrt(jnp.pi * M_s * f_lower), 0.98 * v_term)
    tau_start = tau_of_v(v_low, M_s, eta, beta, sigma)
    t_start = t_c - tau_start
    if f_taper_frac < 1.0:
        v_tap = jnp.minimum(
            jnp.cbrt(jnp.pi * M_s * (f_taper_frac * f_lower)), 0.98 * v_term)
        tau_tap = tau_of_v(v_tap, M_s, eta, beta, sigma)
        t_tap = t_c - tau_tap                       # earlier than t_start
        ramp = jnp.clip(
            (t - t_tap) / jnp.maximum(t_start - t_tap, dt), 0.0, 1.0)
    else:
        ramp = jnp.clip((t - t_start) / 0.25, 0.0, 1.0)
    window = 0.5 - 0.5 * jnp.cos(jnp.pi * ramp)
    return (h * window).astype(jnp.float32)
