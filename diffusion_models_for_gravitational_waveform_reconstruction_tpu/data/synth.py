"""Pure-JAX gravitational-waveform + detector-noise synthesis.

TPU-native replacement for the reference's PyCBC generation path
(``/root/reference/src/snr_denoising/gen.py:48-138``): SEOBNRv4 via
``get_td_waveform`` + ``Detector.project_wave`` + ``aLIGOZeroDetHighPower``
PSD + matched-filter ``sigma`` scaling + ``noise_from_psd`` become jit-able,
vmappable JAX functions (PyCBC is not a dependency of this framework; the
host generator CLI uses it only if it happens to be installed, see
``data/gen.py``).

Physics model: the default engine is the 3.5PN aligned-spin TaylorT2-class
waveform in ``data/pn.py`` (spin-orbit + spin-spin phasing, Kerr-ISCO
termination — so ``spin1z``/``spin2z`` shape the waveform the way they do in
the reference's SEOBNRv4 call).  ``SynthConfig(engine="newtonian")`` keeps
the original restricted 0PN chirp described below; the PSD / matched-filter
/ colored-noise machinery is shared by both engines.

Legacy 0PN model (``engine="newtonian"``):

- restricted quadrupole (Newtonian / 0PN) inspiral chirp in closed form:
    f(tau)   = (1/pi) * (5/(256 tau))^(3/8) * Mc^(-5/8)
    phi(tau) = phi_c - 2 * (tau / (5 Mc))^(5/8) * ... (closed-form integral)
    A(tau)   = (4/D) * Mc^(5/3) * (pi f)^(2/3)
  with Mc, D in geometric (seconds) units, terminated at the Schwarzschild
  ISCO and smoothly matched to an exponentially damped ringdown;
- constant antenna response h = F+ h+ + Fx hx for the given (ra, dec, psi)
  (the reference's ``project_wave`` with static sky location);
- the analytic aLIGO zero-detuning/high-power design PSD fit
  (Ajith 2011 class of fits), zeroed below f_lower exactly as PyCBC's
  ``aLIGOZeroDetHighPower`` zeroes bins below the cutoff;
- matched-filter amplitude ``sigma = sqrt(4 df sum |h~|^2 / S)`` matching
  ``pycbc.filter.sigma`` (ref ``gen.py:96-97``), used to scale the signal to
  a target SNR;
- colored Gaussian noise with the exact one-sided-PSD convention of
  ``pycbc.noise.noise_from_psd`` (ref ``gen.py:100-102``).

Everything is fixed-length (static shapes): the caller picks the segment
length; the chirp is placed so the merger sits near the end of the segment,
which is what the reference's left-padding convention preserves
(``dataloader.py:254-256``).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# geometric unit conversions
MSUN_S = 4.925490947641267e-06    # G * Msun / c^3  [seconds]
MPC_S = 1.02927125054339e14       # 1 Mpc / c       [seconds]

# Internal scaled-units convention for float32/TPU safety.
#
# Physical one-sided LIGO PSDs sit at ~1e-46 strain^2/Hz — BELOW the float32
# subnormal minimum (~1.4e-45), so any on-device f32 PSD math silently
# flushes the detector sweet spot to zero.  The reference avoids this by
# doing all PSD work in host float64 (``dataloader.py:112-123``); a
# TPU-native pipeline instead carries strain x 1e21 and PSD x 1e42
# internally (both ~O(1) in f32), converting to physical units only at the
# float64 HDF5 boundary.  Matched-filter SNR is invariant under this joint
# scaling, so all sigma/SNR numbers remain physical.
STRAIN_SCALE = 1e21
PSD_SCALE = STRAIN_SCALE * STRAIN_SCALE


# ---------------------------------------------------------------------------
# Design-curve PSD
# ---------------------------------------------------------------------------

def aligo_zdhp_psd(
    freqs: jnp.ndarray, f_lower: float = 20.0, *, scale: float = PSD_SCALE
) -> jnp.ndarray:
    """Analytic fit to the aLIGO zero-detuning high-power design PSD.

    Uses the widely cited analytical approximation (Ajith 2011 family):
      S(f) = 1e-49 * (x^-4.14 - 5 x^-2 + 111 (1 - x^2 + x^4/2)/(1 + x^2/2)),
      x = f / 215 Hz.
    Bins below ``f_lower`` are zeroed to mirror PyCBC's
    ``aLIGOZeroDetHighPower(..., low_freq_cutoff)`` behaviour
    (ref ``gen.py:92``).

    Returns S * ``scale``.  The default ``scale=PSD_SCALE`` keeps values in
    f32-representable range (physical values ~1e-46 underflow f32); pass
    ``scale=1.0`` only under float64 (host side).
    """
    f = jnp.asarray(freqs, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    x = jnp.maximum(f, 1e-3) / 215.0
    s = (1e-49 * scale) * (
        jnp.power(x, -4.14)
        - 5.0 * jnp.power(x, -2.0)
        + 111.0 * (1.0 - x ** 2 + 0.5 * x ** 4) / (1.0 + 0.5 * x ** 2)
    )
    return jnp.where(f >= f_lower, s, 0.0)


# ---------------------------------------------------------------------------
# Chirp waveform
# ---------------------------------------------------------------------------

def chirp_mass(m1: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    M = m1 + m2
    eta = (m1 * m2) / (M * M)
    return jnp.power(eta, 3.0 / 5.0) * M


def isco_frequency(m1: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """Schwarzschild ISCO GW frequency for total mass M (Hz)."""
    M_s = (m1 + m2) * MSUN_S
    return 1.0 / (6.0 ** 1.5 * jnp.pi * M_s)


def tau_of_f(mc_s: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Time-to-coalescence at GW frequency f (Newtonian)."""
    return (5.0 / 256.0) * jnp.power(mc_s, -5.0 / 3.0) * jnp.power(jnp.pi * f, -8.0 / 3.0)


def antenna_pattern(ra: float, dec: float, psi: float) -> Tuple[float, float]:
    """Static long-wavelength antenna response (F+, Fx) — pure formula.

    A fixed-orientation single-detector response evaluated at GMST=0; the
    reference's ``Detector.project_wave`` with constant (ra, dec, psi)
    likewise collapses to constant F+, Fx for these short segments.
    """
    # standard interferometer response with arms along x/y
    cth = np.sin(dec)                       # theta = pi/2 - dec
    c2ps, s2ps = np.cos(2 * psi), np.sin(2 * psi)
    fp0 = 0.5 * (1 + cth ** 2) * np.cos(2 * ra)
    fx0 = cth * np.sin(2 * ra)
    fp = fp0 * c2ps - fx0 * s2ps
    fx = fp0 * s2ps + fx0 * c2ps
    return float(fp), float(fx)


# The SynthConfig default sky (ra=dec=psi=0) is the documented
# OPTIMALLY-ORIENTED convention: F+=1, Fx=0 — an overhead, face-on source.
# (The raw pattern at that exact sky is the degenerate node of THIS
# detector parametrisation; rather than silently patching it inside
# antenna_pattern — the round-2 magic fallback — the convention is explicit
# here and any *explicitly chosen* degenerate sky is rejected.)
_OPTIMAL_SKY = (0.0, 0.0, 0.0)


def resolve_antenna(ra: float, dec: float, psi: float) -> Tuple[float, float]:
    """(F+, Fx) for a SynthConfig sky, with the optimal-sky convention."""
    if (ra, dec, psi) == _OPTIMAL_SKY:
        return 1.0, 0.0
    fp, fx = antenna_pattern(ra, dec, psi)
    if abs(fp) < 1e-6 and abs(fx) < 1e-6:
        raise ValueError(
            f"sky (ra={ra}, dec={dec}, psi={psi}) has zero antenna "
            f"response for this detector orientation; pick another sky or "
            f"use the default optimal orientation")
    return fp, fx


@partial(jax.jit, static_argnames=("n", "fs"))
def newtonian_chirp(
    m1: jnp.ndarray,
    m2: jnp.ndarray,
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
) -> jnp.ndarray:
    """Fixed-length detector-frame chirp with merger near the segment end.

    Returns h (n,) float32.  The coalescence time sits ``t_post`` seconds
    before the end of the segment; samples before the f_lower crossing are
    smoothly tapered to zero; past ISCO an exponentially damped ringdown at
    f_isco is attached with amplitude/phase matched at the transition.
    """
    dt = 1.0 / fs
    mc_s = chirp_mass(m1, m2) * MSUN_S
    d_s = distance * MPC_S
    t = jnp.arange(n) * dt
    t_c = (n - 1) * dt - t_post
    tau = t_c - t

    f_isco = isco_frequency(m1, m2)
    tau_isco = tau_of_f(mc_s, f_isco)
    tau_eff = jnp.maximum(tau, tau_isco)

    # instantaneous frequency / phase / amplitude on the inspiral branch
    f_t = (1.0 / jnp.pi) * jnp.power(5.0 / (256.0 * tau_eff), 3.0 / 8.0) * jnp.power(
        mc_s, -5.0 / 8.0)
    # phi = phi_c - 2 * (tau / (5 mc))^(5/8)  [closed form of int 2 pi f dt]
    phase = phi_c - 2.0 * jnp.power(tau_eff / (5.0 * mc_s), 5.0 / 8.0)
    amp = (4.0 / d_s) * jnp.power(mc_s, 5.0 / 3.0) * jnp.power(jnp.pi * f_t, 2.0 / 3.0)

    ci = jnp.cos(inclination)
    hp = amp * (1.0 + ci * ci) / 2.0 * jnp.cos(phase)
    hc = amp * ci * jnp.sin(phase)
    h_insp = fplus * hp + fcross * hc

    # ringdown branch: damped oscillation at f_isco, matched at tau == tau_isco
    t_isco = t_c - tau_isco
    phase_isco = phi_c - 2.0 * jnp.power(tau_isco / (5.0 * mc_s), 5.0 / 8.0)
    amp_isco = (4.0 / d_s) * jnp.power(mc_s, 5.0 / 3.0) * jnp.power(
        jnp.pi * f_isco, 2.0 / 3.0)
    tau_rd = ringdown_damp / (2.0 * jnp.pi * f_isco)   # few-cycle decay
    dt_rd = jnp.maximum(t - t_isco, 0.0)
    ph_rd = phase_isco + 2.0 * jnp.pi * f_isco * dt_rd
    hp_rd = amp_isco * jnp.exp(-dt_rd / tau_rd) * (1.0 + ci * ci) / 2.0 * jnp.cos(ph_rd)
    hc_rd = amp_isco * jnp.exp(-dt_rd / tau_rd) * ci * jnp.sin(ph_rd)
    h_rd = fplus * hp_rd + fcross * hc_rd

    h = jnp.where(tau > tau_isco, h_insp, h_rd)

    # taper below f_lower: smooth half-Hann turn-on over ~0.25 s
    tau_start = tau_of_f(mc_s, f_lower)
    t_start = t_c - tau_start
    ramp = jnp.clip((t - t_start) / 0.25, 0.0, 1.0)
    window = 0.5 - 0.5 * jnp.cos(jnp.pi * ramp)
    return (h * window).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Matched-filter sigma and SNR scaling  (ref gen.py:96-97)
# ---------------------------------------------------------------------------

def matched_filter_sigma(
    signal: jnp.ndarray,
    psd: jnp.ndarray,
    fs: float,
    f_lower: float = 20.0,
    *,
    signal_scale: float = 1.0,
    psd_scale: float = PSD_SCALE,
) -> jnp.ndarray:
    """sqrt(4 df sum_{f>=f_lower} |h~|^2 / S(f)) — pycbc.filter.sigma parity.

    ``signal``: (..., N) time series in physical strain x ``signal_scale``;
    ``psd``: one-sided PSD on the rfft grid of N (length N//2+1), in physical
    units x ``psd_scale``.  The continuous-FT normalisation h~ = dt * rfft(h).
    The returned sigma is always in PHYSICAL units (the joint rescaling
    cancels), but the internal arithmetic stays f32-safe as long as
    signal*sqrt(psd_scale)/signal_scale is O(1)-ish.
    """
    N = signal.shape[-1]
    dt = 1.0 / fs
    df = fs / N
    # bring the signal into the same scaled universe as the PSD: h_eff =
    # h_phys * sqrt(psd_scale), so |h_eff|^2 / S_scaled == |h|^2 / S exactly.
    factor = (psd_scale ** 0.5) / signal_scale
    hf = jnp.fft.rfft(signal * factor) * dt
    freqs = jnp.fft.rfftfreq(N, dt)
    valid = (freqs >= f_lower) & (psd > 0)
    integrand = jnp.where(valid, (jnp.abs(hf) ** 2) / jnp.where(psd > 0, psd, 1.0), 0.0)
    return jnp.sqrt(4.0 * df * integrand.sum(axis=-1))


# ---------------------------------------------------------------------------
# Colored noise  (ref gen.py:100-102, pycbc.noise.noise_from_psd parity)
# ---------------------------------------------------------------------------

def colored_noise(
    key: jax.Array, psd: jnp.ndarray, n: int, fs: float, *,
    psd_scale: float = PSD_SCALE, out_scale: float = STRAIN_SCALE,
) -> jnp.ndarray:
    """Gaussian noise time series with the given one-sided PSD.

    ``psd`` is in physical units x ``psd_scale``; the output time series is
    physical strain x ``out_scale`` (defaults keep both f32-safe).
    Convention: E[|X_k|^2] = N * fs * S_k / 2 for interior rfft bins, which
    makes a Welch estimate of the output reproduce S (density scaling).
    """
    nf = n // 2 + 1
    k_re, k_im = jax.random.split(key)
    a = jax.random.normal(k_re, (nf,))
    b = jax.random.normal(k_im, (nf,))
    # sqrt(S_phys)*out_scale = sqrt(S_scaled) * (out_scale/sqrt(psd_scale))
    unit = out_scale / (psd_scale ** 0.5)
    amp = jnp.sqrt(n * fs * psd / 4.0) * unit
    z = amp * (a + 1j * b)
    # DC and (for even n) Nyquist must be real with doubled variance
    z = z.at[0].set(jnp.sqrt(n * fs * psd[0] / 2.0) * unit * a[0])
    if n % 2 == 0:
        z = z.at[-1].set(jnp.sqrt(n * fs * psd[-1] / 2.0) * unit * a[-1])
    return jnp.fft.irfft(z, n=n).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Full sample generation  (ref gen.py:48-138 generate_ligo_waveform)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SynthConfig:
    """Static generation parameters (hashable -> jit static arg)."""

    n: int = 16384                 # segment length in samples
    fs: int = 4096
    f_lower: float = 20.0
    distance: float = 410.0
    detector: str = "H1"
    ra: float = 0.0
    dec: float = 0.0
    polarization: float = 0.0
    # waveform engine: "pn" = 3.5PN aligned-spin phasing (data/pn.py, the
    # default — spins shape the waveform as in the reference's SEOBNRv4
    # path); "newtonian" = the legacy 0PN chirp (spin-degenerate).
    engine: str = "pn"
    # post-inspiral model for the pn engine: "qnm" = Kerr-remnant
    # quasi-normal-mode ringdown with NR-fit final mass/spin (pn.pn_chirp);
    # "qnm_c1" = same physics with a C^1 attachment (lowest TaylorF2
    # mismatch; opt-in so existing "qnm" corpora stay consistent);
    # "isco" = legacy constant-frequency damped sinusoid.
    ringdown: str = "qnm"
    # < 1: the half-Hann turn-on completes AT the f_lower crossing instead
    # of ramping 0.25 s into the band (pn engine only; see pn.pn_chirp —
    # halves the worst-case TaylorF2 mismatch).  Train and eval corpora
    # must share this value: it is part of the data domain.
    f_taper_frac: float = 1.0


def generate_sample(
    key: jax.Array,
    m1: jnp.ndarray,
    m2: jnp.ndarray,
    target_snr: jnp.ndarray,
    spin1z: jnp.ndarray = 0.0,
    spin2z: jnp.ndarray = 0.0,
    *,
    config: SynthConfig = SynthConfig(),
):
    """Generate one (signal, noise, noisy) triple scaled to target SNR.

    Mirrors ``generate_ligo_waveform`` (ref ``gen.py:48-138``): waveform ->
    detector projection -> design PSD -> sigma-scale to target SNR -> add
    colored noise.  With the default ``engine="pn"`` the aligned spins
    ``spin1z``/``spin2z`` shape the phasing, duration and termination
    frequency (3.5PN + spin-orbit/spin-spin, ``data/pn.py``), matching the
    role spins play in the reference's SEOBNRv4 call (ref ``gen.py:70-79``);
    ``engine="newtonian"`` keeps the legacy spin-degenerate 0PN chirp.

    Returns dict with float32 arrays 'signal', 'noise', 'noisy' of length n
    in PHYSICAL strain, 'psd' on the rfft grid in physical units x
    'psd_scale' (f32 cannot represent ~1e-46 physical PSDs — divide by
    'psd_scale' in float64 at the HDF5 boundary), and scalar 'raw_sigma'.
    """
    c = config
    fp, fx = resolve_antenna(c.ra, c.dec, c.polarization)
    if c.engine == "pn":
        from . import pn as _pn
        h = _pn.pn_chirp(
            m1, m2, spin1z, spin2z, n=c.n, fs=c.fs, distance=c.distance,
            f_lower=c.f_lower, fplus=fp, fcross=fx, ringdown=c.ringdown,
            f_taper_frac=c.f_taper_frac,
        )
    elif c.engine == "newtonian":
        h = newtonian_chirp(
            m1, m2, n=c.n, fs=c.fs, distance=c.distance, f_lower=c.f_lower,
            fplus=fp, fcross=fx,
        )
    else:
        raise ValueError(f"unknown SynthConfig.engine {c.engine!r}")
    freqs = jnp.fft.rfftfreq(c.n, 1.0 / c.fs)
    psd = aligo_zdhp_psd(freqs, c.f_lower)          # physical x PSD_SCALE
    current = matched_filter_sigma(h, psd, c.fs, c.f_lower)   # physical sigma
    scale = target_snr / jnp.maximum(current, 1e-30)
    signal = (h * scale).astype(jnp.float32)
    noise = colored_noise(key, psd, c.n, c.fs, out_scale=1.0)
    return {
        "signal": signal,
        "noise": noise,
        "noisy": signal + noise,
        "psd": psd.astype(jnp.float32),   # physical x PSD_SCALE (module const)
        "raw_sigma": current,
    }


def generate_batch(
    key: jax.Array,
    m1: jnp.ndarray,          # (B,)
    m2: jnp.ndarray,          # (B,)
    target_snr: jnp.ndarray,  # (B,)
    spin1z: Optional[jnp.ndarray] = None,
    spin2z: Optional[jnp.ndarray] = None,
    *,
    config: SynthConfig = SynthConfig(),
):
    """vmapped batch generation — the TPU answer to the reference's serial
    per-sample Python loop (``gen.py:190-303``)."""
    B = m1.shape[0]
    # broadcast_to accepts scalars and rank-0 arrays (a bare jnp.asarray of
    # a scalar spin has no axis 0 for vmap)
    spin1z = jnp.broadcast_to(
        jnp.asarray(0.0 if spin1z is None else spin1z), (B,))
    spin2z = jnp.broadcast_to(
        jnp.asarray(0.0 if spin2z is None else spin2z), (B,))
    keys = jax.random.split(key, B)
    fn = lambda k, a, b, s, s1, s2: generate_sample(
        k, a, b, s, s1, s2, config=config)
    return jax.vmap(fn)(keys, m1, m2, target_snr, spin1z, spin2z)
