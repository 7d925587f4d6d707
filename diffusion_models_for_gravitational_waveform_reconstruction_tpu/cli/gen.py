"""Dataset generation CLI — fixed / random / grid modes.

Flag and schema parity with the reference generator
(``/root/reference/src/snr_denoising/gen.py:420-827``), rebuilt TPU-native:

- the waveform engine is the pure-JAX generator (``data/synth.py``) — chirp,
  PSD, matched-filter SNR scaling and colored noise are jit+vmap'd and run in
  BATCHES on the accelerator, instead of the reference's serial per-sample
  PyCBC calls (its hot loop, SURVEY.md §3.3);
- samples are grouped into power-of-two LENGTH BUCKETS (duration follows the
  Newtonian chirp time at f_lower, so light systems get longer segments);
  each bucket is one static-shape XLA program;
- ``--engine pycbc`` keeps a host-side SEOBNRv4 path for environments where
  PyCBC is installed (it is NOT a dependency of this framework);
- probe-and-retry, balanced grid combos, ``--require-complete-grid``,
  symmetric label augmentation, over-generate+trim and shuffling reproduce
  the reference semantics (``gen.py:581-649``, ``gen.py:651-797``).

Probing here checks physics rather than PyCBC convergence: a config fails if
its ISCO frequency is not above f_lower (no in-band inspiral) or its chirp
duration exceeds ``--max-seconds``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List, Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    class _HelpFmt(argparse.ArgumentDefaultsHelpFormatter,
                   argparse.RawDescriptionHelpFormatter):
        pass

    p = argparse.ArgumentParser(
        prog="gw-gen",
        description=(
            "Generate LIGO-like time-domain GW waveforms and write an HDF5 "
            "dataset.\n\nMODES\n"
            "  fixed  : repeat a single (m1, m2, snr, spins) config N times\n"
            "  random : sample (m1, m2, snr, spins) uniformly within ranges\n"
            "  grid   : even grid over (m1, m2); balanced #samples per "
            "unordered pair (m2 <= m1)\n"
        ),
        formatter_class=_HelpFmt,
    )
    g = p.add_argument_group("General")
    g.add_argument("--mode", choices=["fixed", "random", "grid"], default="fixed")
    g.add_argument("--num-samples", type=int, required=True)
    g.add_argument("--output-path", type=str, required=True)
    g.add_argument("--seed", type=int, default=123)
    g.add_argument("--device", type=str, default="cpu",
                   help="JAX platform for synthesis (cpu/tpu). Defaults to "
                        "cpu: on-device rfft at L>=8192 is known to wedge "
                        "the TPU tunnel on this rig.")
    g.add_argument("--engine", choices=["jax", "pycbc"], default="jax",
                   help="Waveform engine: batched on-device JAX chirps, or "
                        "host-side PyCBC SEOBNRv4 (requires pycbc installed).")
    g.add_argument("--ringdown", choices=["qnm", "qnm_c1", "isco"],
                   default="qnm",
                   help="PN-engine post-inspiral model: 'qnm' = Kerr-remnant "
                        "quasi-normal-mode ringdown (NR-fit final mass/spin); "
                        "'qnm_c1' = same physics, C1 attachment (chirp-rate-"
                        "matched blend + ramped decay — lowest TaylorF2 "
                        "mismatch; opt-in for corpus consistency); "
                        "'isco' = legacy damped sinusoid at termination.")
    g.add_argument("--f-taper-frac", type=float, default=None,
                   help="< 1: half-Hann turn-on spans [f_taper_frac*f_lower, "
                        "f_lower] — completes at the band edge instead of "
                        "ramping 0.25 s into the band (PN engine; halves the "
                        "worst-case TaylorF2 mismatch AND wins the end-to-end "
                        "reconstruction A/B, RESULTS.md round-5b). Part of "
                        "the data domain: train and eval must match. "
                        "Default: 0.85 for the PN engine, 1.0 otherwise.")
    g.add_argument("--approximant", choices=["pn", "newtonian"], default="pn",
                   help="JAX-engine waveform model: 'pn' = 3.5PN aligned-"
                        "spin phasing with Kerr-ISCO termination (spins "
                        "shape the waveform, like the reference's SEOBNRv4); "
                        "'newtonian' = legacy 0PN chirp.")

    gf = p.add_argument_group("Fixed mode")
    gf.add_argument("--mass1", type=float, default=20.0)
    gf.add_argument("--mass2", type=float, default=20.0)
    gf.add_argument("--snr", type=float, default=8000.0)

    gr = p.add_argument_group("Ranges (random / grid)")
    gr.add_argument("--mass1-min", type=float, default=20.0)
    gr.add_argument("--mass1-max", type=float, default=20.0)
    gr.add_argument("--mass2-min", type=float, default=20.0)
    gr.add_argument("--mass2-max", type=float, default=20.0)
    gr.add_argument("--snr-min", type=float, default=8000.0)
    gr.add_argument("--snr-max", type=float, default=8000.0)
    gr.add_argument("--spin1-min", type=float, default=0.0)
    gr.add_argument("--spin1-max", type=float, default=0.0)
    gr.add_argument("--spin2-min", type=float, default=0.0)
    gr.add_argument("--spin2-max", type=float, default=0.0)

    gg = p.add_argument_group("Grid mode")
    gg.add_argument("--grid-steps", type=int, default=5)
    gg.add_argument("--augment-symmetric", action="store_true")
    gg.add_argument("--shuffle", action="store_true")
    gg.add_argument("--overgen-factor", type=float, default=1.05)
    gg.add_argument("--require-complete-grid", action="store_true")

    gm = p.add_argument_group("Misc")
    gm.add_argument("--plot", action="store_true")
    gm.add_argument("--progress-every", type=int, default=0)
    gm.add_argument("--use-tqdm", action="store_true")
    gm.add_argument("--f-lower", type=float, default=20.0)
    gm.add_argument("--sampling-rate", type=int, default=4096)
    gm.add_argument("--distance", type=float, default=410.0)
    gm.add_argument("--max-seconds", type=float, default=32.0,
                    help="Probe failure threshold on chirp duration.")
    gm.add_argument("--chunk", type=int, default=256,
                    help="On-device generation batch size per bucket chunk.")

    gp = p.add_argument_group("PSD options")
    gp.add_argument("--save-psd", action="store_true")
    gp.add_argument("--psd-source", choices=["model", "welch", "both"],
                    default="both")
    gp.add_argument("--psd-nperseg", type=int, default=4096)
    gp.add_argument("--psd-noverlap", type=int, default=None)
    gp.add_argument("--psd-window", type=str, default="hann")
    gp.add_argument("--psd-preview", type=int, default=0)
    gp.add_argument("--psd-preview-dir", type=str, default=None)
    return p


# ---------------------------------------------------------------------------
# Spec building (host side, tiny)
# ---------------------------------------------------------------------------

def chirp_duration_s(m1: float, m2: float, f_lower: float) -> float:
    """Newtonian time-to-coalescence from f_lower, in seconds."""
    from ..data.synth import MSUN_S, chirp_mass, tau_of_f
    import jax.numpy as jnp

    mc_s = float(chirp_mass(jnp.asarray(m1), jnp.asarray(m2))) * MSUN_S
    return float(tau_of_f(jnp.asarray(mc_s), jnp.asarray(f_lower)))


def config_duration_s(m1: float, m2: float, f_lower: float,
                      approximant: str = "newtonian",
                      s1: float = 0.0, s2: float = 0.0) -> float:
    """Engine-matched chirp duration: PN tau (spin-dependent; ~20%+ longer
    than Newtonian on heavy systems) when the PN engine will generate the
    waveform, Newtonian otherwise — so ``--max-seconds`` gates the ACTUAL
    segment the engine produces."""
    if approximant == "pn":
        from ..data.pn import pn_duration
        import jax.numpy as jnp
        return float(pn_duration(jnp.asarray(m1), jnp.asarray(m2),
                                 jnp.asarray(s1), jnp.asarray(s2), f_lower))
    return chirp_duration_s(m1, m2, f_lower)


def probe_config(m1: float, m2: float, f_lower: float, max_seconds: float,
                 approximant: str = "newtonian",
                 s1: float = 0.0, s2: float = 0.0) -> bool:
    """Physics probe standing in for the reference's try-generate probe
    (``gen.py:601-606``, ``gen.py:669-688``)."""
    from ..data.synth import isco_frequency
    import jax.numpy as jnp

    f_isco = float(isco_frequency(jnp.asarray(m1), jnp.asarray(m2)))
    if f_isco <= 1.05 * f_lower:
        return False           # merger at/below the band edge: nothing in band
    if config_duration_s(m1, m2, f_lower, approximant, s1, s2) > max_seconds:
        return False
    return True


def next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def padded_pow2_len(dur_s: float, fs: int,
                    t_post: float = 0.05, lead: float = 0.35) -> int:
    """duration -> static segment length: + taper lead + ringdown tail,
    rounded up to a power of two (min 1024).  Single source of truth for
    the padding convention (shared by the Newtonian and PN bucket paths)."""
    return max(1024, next_pow2(int(np.ceil((dur_s + lead + t_post) * fs))))


def bucket_length(m1: float, m2: float, f_lower: float, fs: int,
                  t_post: float = 0.05, lead: float = 0.35) -> int:
    """Static segment length for a Newtonian chirp."""
    return padded_pow2_len(chirp_duration_s(m1, m2, f_lower), fs,
                           t_post=t_post, lead=lead)


def build_specs(args, rng: np.random.Generator) -> List[dict]:
    """Per-sample generation specs for all three modes."""
    specs: List[dict] = []

    approximant = getattr(args, "approximant", "newtonian")

    if args.mode == "fixed":
        m1, m2 = max(args.mass1, args.mass2), min(args.mass1, args.mass2)
        if not probe_config(m1, m2, args.f_lower, args.max_seconds,
                            approximant):
            raise SystemExit(f"fixed config (m1={m1}, m2={m2}) fails the probe "
                             f"(ISCO vs f_lower or > --max-seconds)")
        for _ in range(args.num_samples):
            specs.append(dict(m1=m1, m2=m2, s1=0.0, s2=0.0, snr=args.snr,
                              label_m1=m1, label_m2=m2,
                              label_s1=0.0, label_s2=0.0))
        return specs

    if args.mode == "random":
        # probe-and-retry with a 10x attempt cap (ref gen.py:581-617)
        attempts_cap = 10 * args.num_samples
        attempts = 0
        while len(specs) < args.num_samples and attempts < attempts_cap:
            attempts += 1
            a = rng.uniform(args.mass1_min, args.mass1_max)
            b = rng.uniform(args.mass2_min, args.mass2_max)
            m1, m2 = max(a, b), min(a, b)          # sorted m1 >= m2 (gen.py:201)
            s1 = rng.uniform(args.spin1_min, args.spin1_max)
            s2 = rng.uniform(args.spin2_min, args.spin2_max)
            # probe with the DRAWN spins: aligned spin lengthens the PN
            # chirp, so a spinless probe would let --max-seconds be exceeded
            if not probe_config(m1, m2, args.f_lower, args.max_seconds,
                                approximant, s1, s2):
                continue
            specs.append(dict(
                m1=m1, m2=m2, s1=s1, s2=s2,
                snr=rng.uniform(args.snr_min, args.snr_max),
                label_m1=m1, label_m2=m2, label_s1=s1, label_s2=s2,
            ))
        if len(specs) < args.num_samples:
            raise SystemExit(
                f"random mode: only {len(specs)}/{args.num_samples} valid "
                f"configs after {attempts} attempts")
        return specs

    # grid mode (ref gen.py:651-797)
    m1_axis = np.linspace(args.mass1_min, args.mass1_max, args.grid_steps)
    m2_axis = np.linspace(args.mass2_min, args.mass2_max, args.grid_steps)
    combos = [(float(a), float(b)) for a in m1_axis for b in m2_axis if b <= a]
    ok_combos, failed = [], []
    # spins are drawn per-sample AFTER the combo probe, so probe each combo
    # at the longest-duration spin corner (aligned positive spin lengthens
    # the PN chirp) — every later draw then satisfies --max-seconds
    probe_corners = [(0.0, 0.0)] if approximant != "pn" else [
        (args.spin1_min, args.spin2_min), (args.spin1_max, args.spin2_max)]
    for (a, b) in combos:
        ok = all(probe_config(a, b, args.f_lower, args.max_seconds,
                              approximant, s1c, s2c)
                 for (s1c, s2c) in probe_corners)
        (ok_combos if ok else failed).append((a, b))
    if failed:
        msg = f"[gen] {len(failed)}/{len(combos)} grid combos failed probe: " \
              f"{failed[:8]}{'...' if len(failed) > 8 else ''}"
        if args.require_complete_grid:
            raise SystemExit(msg + "  (--require-complete-grid)")
        print(msg)
    if not ok_combos:
        raise SystemExit("grid mode: no valid (m1, m2) combos")

    # balanced counts with the remainder spread over the first combos
    # (ref gen.py:702-717)
    total = int(np.ceil(args.num_samples * args.overgen_factor))
    base, rem = divmod(total, len(ok_combos))
    for ci, (a, b) in enumerate(ok_combos):
        count = base + (1 if ci < rem else 0)
        # symmetric label augmentation: a DETERMINISTIC half of each combo's
        # samples carries swapped (m1, m2) AND (s1, s2) labels; generation
        # always uses the sorted masses (ref gen.py:721-747 + gen.py:201-202)
        n_swap = count // 2 if (args.augment_symmetric and a != b) else 0
        for j in range(count):
            s1 = rng.uniform(args.spin1_min, args.spin1_max)
            s2 = rng.uniform(args.spin2_min, args.spin2_max)
            spec = dict(
                m1=a, m2=b, s1=s1, s2=s2,
                snr=rng.uniform(args.snr_min, args.snr_max),
                label_m1=a, label_m2=b, label_s1=s1, label_s2=s2,
            )
            if j >= count - n_swap:
                spec.update(label_m1=b, label_m2=a, label_s1=s2, label_s2=s1)
            specs.append(spec)
    if args.shuffle:
        rng.shuffle(specs)
    return specs


# ---------------------------------------------------------------------------
# Batched on-device generation
# ---------------------------------------------------------------------------

def generate_jax(specs: List[dict], args) -> Dict[int, dict]:
    """Generate all specs, bucketed by static length, chunked vmap on device.

    Returns {spec_index: sample dict} with physical-unit float32/float64
    arrays on host.
    """
    import jax
    import jax.numpy as jnp

    from ..data.synth import PSD_SCALE, SynthConfig, generate_batch

    fs = int(args.sampling_rate)
    approximant = getattr(args, "approximant", "pn")
    by_len: Dict[int, List[int]] = {}
    if approximant == "pn":
        # PN durations are spin- and PN-order-dependent (spinless PN is
        # ~10-35% SHORTER than the Newtonian to-coalescence estimate at
        # 25-48 Msun; aligned +0.8 spin lengthens back past it) — bucket on
        # the actual tau, one vectorized call
        from ..data.pn import pn_duration
        # with a below-band turn-on the segment must also contain the taper
        # region [f_taper_frac*f_lower, f_lower) — size buckets from the
        # taper-start frequency (tau ~ f^{-8/3})
        taper_frac = float(getattr(args, "f_taper_frac", 1.0))
        f_size = min(taper_frac, 1.0) * args.f_lower
        durs = np.asarray(pn_duration(
            jnp.asarray([s["m1"] for s in specs]),
            jnp.asarray([s["m2"] for s in specs]),
            jnp.asarray([s["s1"] for s in specs]),
            jnp.asarray([s["s2"] for s in specs]),
            f_size))
        for i, d in enumerate(durs):
            by_len.setdefault(padded_pow2_len(float(d), fs), []).append(i)
    else:
        for i, s in enumerate(specs):
            n = bucket_length(s["m1"], s["m2"], args.f_lower, fs)
            by_len.setdefault(n, []).append(i)

    key = jax.random.PRNGKey(args.seed)
    out: Dict[int, dict] = {}
    for n, idxs in sorted(by_len.items()):
        cfg = SynthConfig(n=n, fs=fs, f_lower=args.f_lower,
                          distance=args.distance, engine=approximant,
                          ringdown=getattr(args, "ringdown", "qnm"),
                          f_taper_frac=float(
                              getattr(args, "f_taper_frac", 1.0)))
        print(f"[gen] bucket n={n} ({n / fs:.2f}s): {len(idxs)} samples")
        for c0 in range(0, len(idxs), args.chunk):
            chunk = idxs[c0:c0 + args.chunk]
            key, k = jax.random.split(key)
            m1 = jnp.asarray([specs[i]["m1"] for i in chunk])
            m2 = jnp.asarray([specs[i]["m2"] for i in chunk])
            snr = jnp.asarray([specs[i]["snr"] for i in chunk])
            s1 = jnp.asarray([specs[i]["s1"] for i in chunk])
            s2 = jnp.asarray([specs[i]["s2"] for i in chunk])
            res = generate_batch(k, m1, m2, snr, s1, s2, config=cfg)
            sig = np.asarray(res["signal"])
            noi = np.asarray(res["noise"])
            nsy = np.asarray(res["noisy"])
            psd = np.asarray(res["psd"], np.float64) / PSD_SCALE   # physical
            for j, i in enumerate(chunk):
                out[i] = dict(signal=sig[j], noise=noi[j], noisy=nsy[j],
                              psd=psd[j], n=n)
    return out


def generate_pycbc(specs: List[dict], args) -> Dict[int, dict]:
    """Host-side PyCBC SEOBNRv4 path (optional; gated on pycbc availability).

    Mirrors ``generate_ligo_waveform`` (ref ``gen.py:48-138``).
    """
    try:
        from pycbc.detector import Detector
        from pycbc.filter import sigma as mf_sigma
        from pycbc.noise import noise_from_psd
        from pycbc.psd import aLIGOZeroDetHighPower
        from pycbc.waveform import get_td_waveform
    except ImportError as e:
        raise SystemExit(
            "--engine pycbc requires the 'pycbc' package, which is not "
            "installed in this environment; use --engine jax") from e

    fs = int(args.sampling_rate)
    dt = 1.0 / fs
    det = Detector("H1")
    rng = np.random.default_rng(args.seed)
    out: Dict[int, dict] = {}
    psd_cache: Dict[int, object] = {}
    for i, s in enumerate(specs):
        hp, hc = get_td_waveform(approximant="SEOBNRv4",
                                 mass1=s["m1"], mass2=s["m2"],
                                 spin1z=s["s1"], spin2z=s["s2"],
                                 delta_t=dt, f_lower=args.f_lower,
                                 distance=args.distance)
        h = det.project_wave(hp, hc, 0.0, 0.0, 0.0)
        N = len(h)
        flen = N // 2 + 1
        if flen not in psd_cache:
            psd_cache[flen] = aLIGOZeroDetHighPower(flen, 1.0 / (N * dt),
                                                    args.f_lower)
        psd = psd_cache[flen]
        amp = mf_sigma(h, psd=psd, low_frequency_cutoff=args.f_lower)
        h = h * (s["snr"] / max(float(amp), 1e-30))
        noise = noise_from_psd(N, dt, psd, seed=int(rng.integers(0, 2**31)))
        out[i] = dict(signal=np.asarray(h, np.float32),
                      noise=np.asarray(noise, np.float32),
                      noisy=np.asarray(h, np.float32) + np.asarray(noise, np.float32),
                      psd=np.asarray(psd, np.float64), n=N)
    return out


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def main(argv: Optional[List[str]] = None) -> None:
    args = build_parser().parse_args(argv)
    taper_explicit = getattr(args, "f_taper_frac", None) is not None
    if not taper_explicit:
        # Round-5b A/B (RESULTS.md): the below-band taper wins BOTH waveform
        # fidelity (worst-case TaylorF2 mismatch halved) and end-to-end
        # reconstruction quality (corr_macro 0.6715 vs 0.6500 on matched
        # 20k corpora), so it is the PN-engine default.  Non-PN engines
        # don't consume it; they keep the neutral 1.0.
        args.f_taper_frac = (0.85 if args.engine == "jax"
                             and args.approximant == "pn" else 1.0)
    taper = float(args.f_taper_frac)
    if taper_explicit and taper != 1.0 and not (args.engine == "jax"
                                                and args.approximant == "pn"):
        # only the PN engine consumes SynthConfig.f_taper_frac — erroring
        # beats a corpus the user believes carries the band-edge taper
        raise SystemExit(
            "--f-taper-frac < 1 is only honoured by --engine jax "
            f"--approximant pn (got engine={args.engine}, "
            f"approximant={args.approximant})")
    if taper != 1.0 and not 0.5 < taper <= 1.0:
        raise SystemExit(
            f"--f-taper-frac must be in (0.5, 1.0], got {taper}")
    rd = getattr(args, "ringdown", "qnm")
    if rd != "qnm" and not (args.engine == "jax"
                            and args.approximant == "pn"):
        # same contract as --f-taper-frac: only the PN engine consumes
        # SynthConfig.ringdown — a silently-ignored flag would let the user
        # believe a newtonian/pycbc corpus carries the requested attachment
        raise SystemExit(
            "--ringdown is only honoured by --engine jax --approximant pn "
            f"(got engine={args.engine}, approximant={args.approximant})")
    from ..utils.platform import maybe_force_platform
    maybe_force_platform(args.device)
    rng = np.random.default_rng(args.seed)
    specs = build_specs(args, rng)

    # over-generate happens in grid mode; trim back (ref gen.py:783-797)
    if len(specs) > args.num_samples and args.mode == "grid":
        # head-trim after the (optional) shuffle, ref gen.py:783-797
        specs = specs[: args.num_samples]

    gen = generate_pycbc if args.engine == "pycbc" else generate_jax
    samples = gen(specs, args)

    fs = float(args.sampling_rate)
    sig_l, noi_l, nsy_l, times_l, dets = [], [], [], [], []
    psd_model_l: Optional[list] = [] if (args.save_psd and args.psd_source
                                         in ("model", "both")) else None
    psd_w_l: Optional[list] = [] if (args.save_psd and args.psd_source
                                     in ("welch", "both")) else None
    psd_wf_l: Optional[list] = [] if psd_w_l is not None else None
    meta: Dict[str, list] = {k: [] for k in [
        "mass1", "mass2", "spin1z", "spin2z", "snr",
        "label_m1", "label_m2", "label_s1", "label_s2",
        "q", "chirp_mass", "epoch", "psd_len", "psd_df", "psd_f_lower"]}

    from scipy.signal import welch as scipy_welch

    # Batched Welch PSDs: the reference (and round-2 build) estimate Welch
    # PSDs serially per sample through scipy — the host bottleneck that
    # forced --psd-source model on the 50k set.  With the JAX engine and the
    # default hann window, compute them in per-bucket BATCHES through
    # ops.whiten.welch_psd (scaled units: physical |strain|^2 ~ 1e-42
    # underflows f32, so feed strain x 1e21 and undo x 1e-42 in f64).
    psd_w_pre: Dict[int, tuple] = {}
    if psd_w_l is not None and args.engine != "pycbc" \
            and args.psd_window == "hann":
        import jax.numpy as jnp

        from ..data.synth import STRAIN_SCALE
        from ..ops.whiten import welch_psd

        by_n: Dict[int, List[int]] = {}
        for i in range(len(specs)):
            by_n.setdefault(samples[i]["n"], []).append(i)
        for n, idxs in sorted(by_n.items()):
            for c0 in range(0, len(idxs), 256):
                chunk = idxs[c0:c0 + 256]
                arr = np.stack([samples[i]["noisy"] for i in chunk])
                arr = (arr * STRAIN_SCALE).astype(np.float32)
                f_w, P = welch_psd(jnp.asarray(arr), fs,
                                   nperseg=min(args.psd_nperseg, n),
                                   noverlap=args.psd_noverlap)
                f_w = np.asarray(f_w, np.float64)
                P = np.asarray(P, np.float64) / (STRAIN_SCALE ** 2)
                for j, i in enumerate(chunk):
                    psd_w_pre[i] = (f_w, P[j])

    for i, s in enumerate(specs):
        smp = samples[i]
        n = smp["n"]
        sig_l.append(smp["signal"])
        noi_l.append(smp["noise"])
        nsy_l.append(smp["noisy"])
        times_l.append(np.arange(n, dtype=np.float64) / fs)
        dets.append("H1")
        if psd_model_l is not None:
            psd_model_l.append(smp["psd"])
        if psd_w_l is not None:
            if i in psd_w_pre:
                f_w, P_w = psd_w_pre[i]
            else:
                f_w, P_w = scipy_welch(smp["noisy"].astype(np.float64), fs=fs,
                                       nperseg=min(args.psd_nperseg, n),
                                       noverlap=args.psd_noverlap,
                                       window=args.psd_window)
            psd_w_l.append(P_w)
            psd_wf_l.append(f_w)
        M = s["m1"] + s["m2"]
        eta = s["m1"] * s["m2"] / (M * M)
        meta["mass1"].append(s["m1"])
        meta["mass2"].append(s["m2"])
        meta["spin1z"].append(s["s1"])
        meta["spin2z"].append(s["s2"])
        meta["snr"].append(s["snr"])
        meta["label_m1"].append(s["label_m1"])
        meta["label_m2"].append(s["label_m2"])
        meta["label_s1"].append(s.get("label_s1", s["s1"]))
        meta["label_s2"].append(s.get("label_s2", s["s2"]))
        meta["q"].append(s["m1"] / max(s["m2"], 1e-9))
        meta["chirp_mass"].append(eta ** 0.6 * M)
        meta["epoch"].append(0.0)
        meta["psd_len"].append(len(smp["psd"]))
        meta["psd_df"].append(fs / n)
        meta["psd_f_lower"].append(args.f_lower)

        if args.progress_every and (i + 1) % args.progress_every == 0:
            print(f"[gen] {i + 1}/{len(specs)}")

    from ..data.hdf5io import write_dataset

    write_dataset(
        args.output_path,
        signal=sig_l, noise=noi_l, noisy=nsy_l, times=times_l, meta=meta,
        sampling_rate=fs, detectors=dets,
        psd_model=psd_model_l, psd_welch=psd_w_l, psd_welch_freqs=psd_wf_l,
        psd_params=dict(source=args.psd_source, nperseg=args.psd_nperseg,
                        noverlap=args.psd_noverlap, window=args.psd_window),
        attrs_extra={
            "mode": args.mode,
            "engine": args.engine,
            "config_args": json.dumps(vars(args), sort_keys=True),
        },
    )
    print(f"[gen] wrote {len(specs)} samples -> {args.output_path}")

    if args.psd_preview and psd_model_l:
        _psd_previews(args, psd_model_l, fs)
    if args.plot:
        _plot_examples(args, sig_l, nsy_l, fs)


def _psd_previews(args, psd_model_l, fs):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = args.psd_preview_dir or os.path.join(
        os.path.dirname(args.output_path) or ".", "psd_plots")
    os.makedirs(out_dir, exist_ok=True)
    for i, P in enumerate(psd_model_l[: args.psd_preview]):
        n = (len(P) - 1) * 2
        f = np.fft.rfftfreq(n, 1.0 / fs)
        fig, ax = plt.subplots(figsize=(7, 4))
        valid = P > 0
        ax.loglog(f[valid], np.sqrt(P[valid]))
        ax.set_xlabel("f [Hz]")
        ax.set_ylabel("ASD [1/sqrt(Hz)]")
        ax.set_title(f"sample {i} model ASD")
        fig.savefig(os.path.join(out_dir, f"asd_{i:04d}.png"), dpi=110)
        plt.close(fig)
    print(f"[gen] PSD previews -> {out_dir}")


def _plot_examples(args, sig_l, nsy_l, fs, k: int = 4):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = os.path.join(os.path.dirname(args.output_path) or ".", "gen_plots")
    os.makedirs(out_dir, exist_ok=True)
    for i in range(min(k, len(sig_l))):
        t = np.arange(len(sig_l[i])) / fs
        fig, ax = plt.subplots(figsize=(9, 4))
        ax.plot(t, nsy_l[i], lw=0.4, alpha=0.6, label="noisy")
        ax.plot(t, sig_l[i], lw=0.8, label="signal")
        ax.legend()
        ax.set_xlabel("t [s]")
        fig.savefig(os.path.join(out_dir, f"example_{i}.png"), dpi=110)
        plt.close(fig)
    print(f"[gen] example plots -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
