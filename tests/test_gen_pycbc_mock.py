"""Mock-pycbc test of the host-side SEOBNRv4 generation path.

``--engine pycbc`` (cli/gen.py::generate_pycbc, mirroring the reference's
``generate_ligo_waveform``, ref gen.py:48-138) cannot run here — pycbc is not
installed — so this injects a minimal fake ``pycbc`` package and checks the
spec->arrays plumbing: approximant/spin arguments, SNR scaling via the
matched-filter sigma, PSD caching per rfft length, and the output dict
schema (VERDICT r2 item 9: the branch must not bit-rot untested).
"""
import sys
import types

import numpy as np
import pytest

from diffusion_models_for_gravitational_waveform_reconstruction_tpu.cli import gen as gen_cli


class _FakeSeries(np.ndarray):
    """Minimal stand-in for pycbc.types.TimeSeries (ndarray is enough)."""


def _series(arr):
    return np.asarray(arr, np.float64).view(_FakeSeries)


@pytest.fixture
def fake_pycbc(monkeypatch):
    calls = {"td": [], "psd": [], "noise": [], "sigma": [], "project": []}

    def get_td_waveform(**kw):
        calls["td"].append(kw)
        n = 3000  # deliberately not a power of two: vlen output
        t = np.arange(n) / kw["delta_t"] ** -1
        hp = _series(1e-21 * np.sin(200.0 * t))
        hc = _series(1e-21 * np.cos(200.0 * t))
        return hp, hc

    class Detector:
        def __init__(self, name):
            self.name = name

        def project_wave(self, hp, hc, ra, dec, psi):
            calls["project"].append((ra, dec, psi))
            return _series(0.5 * hp + 0.5 * hc)

    def aLIGOZeroDetHighPower(flen, df, f_low):
        calls["psd"].append((flen, df, f_low))
        f = np.arange(flen) * df
        psd = np.full(flen, 1e-46)
        psd[f < f_low] = 0.0
        return _series(psd)

    def sigma(h, psd=None, low_frequency_cutoff=None):
        calls["sigma"].append(low_frequency_cutoff)
        return 4.0  # current MF amplitude -> scale = snr/4

    def noise_from_psd(N, dt, psd, seed=None):
        calls["noise"].append((N, seed))
        rng = np.random.default_rng(seed)
        return _series(1e-23 * rng.standard_normal(N))

    mods = {
        "pycbc": types.ModuleType("pycbc"),
        "pycbc.detector": types.ModuleType("pycbc.detector"),
        "pycbc.filter": types.ModuleType("pycbc.filter"),
        "pycbc.noise": types.ModuleType("pycbc.noise"),
        "pycbc.psd": types.ModuleType("pycbc.psd"),
        "pycbc.waveform": types.ModuleType("pycbc.waveform"),
    }
    mods["pycbc.detector"].Detector = Detector
    mods["pycbc.filter"].sigma = sigma
    mods["pycbc.noise"].noise_from_psd = noise_from_psd
    mods["pycbc.psd"].aLIGOZeroDetHighPower = aLIGOZeroDetHighPower
    mods["pycbc.waveform"].get_td_waveform = get_td_waveform
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return calls


def _args(**kw):
    ns = gen_cli.build_parser().parse_args(
        ["--mode", "fixed", "--num-samples", "2",
         "--output-path", "/tmp/unused.h5", "--engine", "pycbc"])
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_generate_pycbc_spec_plumbing(fake_pycbc):
    specs = [
        dict(m1=30.0, m2=25.0, s1=0.5, s2=-0.3, snr=12.0,
             label_m1=30.0, label_m2=25.0, label_s1=0.5, label_s2=-0.3),
        dict(m1=30.0, m2=25.0, s1=0.1, s2=0.2, snr=8.0,
             label_m1=30.0, label_m2=25.0, label_s1=0.1, label_s2=0.2),
    ]
    out = gen_cli.generate_pycbc(specs, _args())

    # SEOBNRv4 called once per spec with masses AND spins threaded through
    assert len(fake_pycbc["td"]) == 2
    for kw, s in zip(fake_pycbc["td"], specs):
        assert kw["approximant"] == "SEOBNRv4"
        assert kw["mass1"] == s["m1"] and kw["mass2"] == s["m2"]
        assert kw["spin1z"] == s["s1"] and kw["spin2z"] == s["s2"]
        assert kw["f_lower"] == 20.0 and kw["distance"] == 410.0

    # PSD cache: both samples share one rfft length -> ONE psd construction
    # (ref gen.py:45 _PSD_CACHE semantics)
    assert len(fake_pycbc["psd"]) == 1

    # per-sample colored noise with distinct seeds
    assert len(fake_pycbc["noise"]) == 2
    assert fake_pycbc["noise"][0][1] != fake_pycbc["noise"][1][1]

    # output dict schema + SNR scaling (sigma mock returns 4 -> x snr/4)
    for i, s in enumerate(specs):
        smp = out[i]
        assert set(smp) == {"signal", "noise", "noisy", "psd", "n"}
        assert smp["n"] == 3000 and len(smp["signal"]) == 3000
        assert smp["signal"].dtype == np.float32
        assert smp["psd"].dtype == np.float64
        np.testing.assert_allclose(
            smp["noisy"], smp["signal"] + smp["noise"], rtol=1e-6)
        # amplitude scaled by snr/sigma = snr/4 relative to the raw 1e-21
        peak = np.abs(smp["signal"]).max()
        assert peak == pytest.approx(1e-21 * (s["snr"] / 4.0), rel=1e-3)


def test_generate_pycbc_missing_dependency_message(monkeypatch):
    for name in list(sys.modules):
        if name.startswith("pycbc"):
            monkeypatch.delitem(sys.modules, name, raising=False)
    monkeypatch.setitem(sys.modules, "pycbc", None)  # force ImportError
    with pytest.raises(SystemExit, match="pycbc"):
        gen_cli.generate_pycbc([], _args())
