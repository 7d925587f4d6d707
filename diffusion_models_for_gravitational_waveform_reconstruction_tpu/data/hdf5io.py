"""HDF5 dataset schema reader/writer — the cross-layer file contract.

Implements the exact schema of the reference so datasets are interchangeable
(SURVEY.md §1 contract 1):

- variable-length float32 datasets ``signal``/``noise``/``noisy``, float64
  ``times`` (t=0 at the |signal| peak), ``t_merger``, int ``lengths``
  (ref ``gen.py:308-417`` writer; ``dataloader.py:73-101`` /
  ``inference.py:59-89`` readers)
- per-sample scalar metadata: mass1/mass2/spin1z/spin2z/snr, label_m1/m2/s1/s2,
  q, chirp_mass, epoch, psd_len/psd_df/psd_f_lower (ref ``gen.py:170-177``)
- optional per-sample PSDs: ``psd_model`` (+ legacy alias ``psd``) on the
  rfft grid, ``psd_welch``+``psd_welch_freqs``, ``psd_detector`` vlen str
  (ref ``gen.py:361-382``)
- file attrs: padding='none', sampling_rate, delta_t,
  time_axis='seconds-rel-peak', psd_saved, psd_model_kind, psd_source,
  Welch params, mode extras, full ``config_args`` JSON (ref ``gen.py:384-404``)

This module is host-side (h5py); arrays cross to the device in
``data/pipeline.py``.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import h5py
import numpy as np

META_SCALAR_KEYS = [
    "mass1", "mass2", "snr", "spin1z", "spin2z",
    "label_m1", "label_m2", "label_s1", "label_s2",
    "q", "chirp_mass", "epoch",
    "psd_len", "psd_df", "psd_f_lower",
]

INFERENCE_META_KEYS = [
    "mass1", "mass2", "spin1z", "spin2z", "q", "chirp_mass", "snr", "epoch",
    "label_m1", "label_m2", "label_s1", "label_s2",
]


def aligo_zdhp_psd_np(freqs: np.ndarray, f_lower: float = 20.0) -> np.ndarray:
    """Host-float64 analytic aLIGO zero-detuning high-power design PSD.

    Same formula as ``data.synth.aligo_zdhp_psd`` but pure numpy float64 in
    PHYSICAL units (~1e-46; fine in f64, would underflow f32).  Bins below
    ``f_lower`` are zero, mirroring PyCBC's low_freq_cutoff behaviour
    (ref ``gen.py:92``).
    """
    f = np.asarray(freqs, np.float64)
    x = np.maximum(f, 1e-3) / 215.0
    s = 1e-49 * (
        np.power(x, -4.14)
        - 5.0 * np.power(x, -2.0)
        + 111.0 * (1.0 - x ** 2 + 0.5 * x ** 4) / (1.0 + 0.5 * x ** 2)
    )
    return np.where(f >= f_lower, s, 0.0)


_DERIVED_PSD_CACHE: Dict[tuple, np.ndarray] = {}


def derive_model_psd_np(psd_len: int, psd_df: float,
                        psd_f_lower: float) -> np.ndarray:
    """Re-derive the per-sample model PSD from its stored grid scalars.

    Every dataset (ours and the reference's, ``gen.py:170-177``) stores the
    rfft-grid descriptors ``psd_len/psd_df/psd_f_lower`` even when the PSD
    arrays themselves were not saved (``--save-psd`` off).  The noise in
    those files was coloured by the analytic aLIGOZeroDetHighPower curve on
    exactly that grid, so the model PSD is fully reconstructible — verified
    vs a ``--save-psd`` file to f32 storage precision (4e-7 rel).

    Results are cached by grid tuple and SHARED (do not mutate): a 130k-row
    corpus with one sample length costs one 2049-float64 array, not 2 GB.
    """
    key = (int(psd_len), round(float(psd_df), 12), round(float(psd_f_lower), 9))
    P = _DERIVED_PSD_CACHE.get(key)
    if P is None:
        freqs = np.arange(key[0], dtype=np.float64) * key[1]
        P = aligo_zdhp_psd_np(freqs, key[2])
        P.setflags(write=False)
        _DERIVED_PSD_CACHE[key] = P
    return P


def resolve_h5_path(path: str) -> str:
    """Directory -> most recently modified .h5/.hdf5 inside (ref
    ``dataloader.py:14-24``)."""
    if os.path.isdir(path):
        cands = [
            os.path.join(path, f) for f in os.listdir(path)
            if f.lower().endswith((".h5", ".hdf5"))
        ]
        if not cands:
            raise FileNotFoundError(f"no .h5/.hdf5 files in directory: {path}")
        cands.sort(key=os.path.getmtime, reverse=True)
        return cands[0]
    if not os.path.exists(path):
        raise FileNotFoundError(f"HDF5 path not found: {path}")
    return path


def _vlen(arr_list: Sequence[np.ndarray], dtype) -> np.ndarray:
    obj = np.empty(len(arr_list), dtype=object)
    for i, a in enumerate(arr_list):
        a = np.asarray(a, dtype=dtype).reshape(-1)
        obj[i] = a
    return obj


def write_dataset(
    output_path: str,
    signal: Sequence[np.ndarray],
    noise: Sequence[np.ndarray],
    noisy: Sequence[np.ndarray],
    times: Sequence[np.ndarray],
    meta: Dict[str, Sequence[float]],
    sampling_rate: float,
    *,
    detectors: Optional[Sequence[str]] = None,
    psd_model: Optional[Sequence[np.ndarray]] = None,
    psd_welch: Optional[Sequence[np.ndarray]] = None,
    psd_welch_freqs: Optional[Sequence[np.ndarray]] = None,
    psd_params: Optional[dict] = None,
    psd_model_kind: str = "aLIGOZeroDetHighPower",
    attrs_extra: Optional[dict] = None,
) -> None:
    """Write a schema-conformant dataset file.

    ``times`` are absolute per-sample time axes; they are re-centered here so
    t=0 falls at the |signal| peak (merger), and ``t_merger`` records the
    removed offset — mirroring ``gen.py:337-351``.
    """
    parent = os.path.dirname(output_path)
    if parent:
        os.makedirs(parent, exist_ok=True)

    times_rel, t_mergers = [], []
    for s, t_abs in zip(signal, times):
        s = np.asarray(s)
        t_abs = np.asarray(t_abs, np.float64)
        pk = int(np.argmax(np.abs(s))) if s.ndim else 0
        t0 = float(t_abs[pk])
        times_rel.append(t_abs - t0)
        t_mergers.append(t0)

    lengths = np.array([len(np.asarray(s).reshape(-1)) for s in signal], np.int32)
    vlen_f32 = h5py.vlen_dtype(np.dtype("float32"))
    vlen_f64 = h5py.vlen_dtype(np.dtype("float64"))
    vlen_str = h5py.vlen_dtype(bytes)

    with h5py.File(output_path, "w") as f:
        f.create_dataset("signal", data=_vlen(signal, np.float32), dtype=vlen_f32)
        f.create_dataset("noise", data=_vlen(noise, np.float32), dtype=vlen_f32)
        f.create_dataset("noisy", data=_vlen(noisy, np.float32), dtype=vlen_f32)
        f.create_dataset("times", data=_vlen(times_rel, np.float64), dtype=vlen_f64)
        f.create_dataset("t_merger", data=np.array(t_mergers, np.float64))
        f.create_dataset("lengths", data=lengths)

        for k, arr in meta.items():
            if len(arr):
                f.create_dataset(k, data=np.asarray(arr, np.float32))

        if detectors is not None:
            f.create_dataset(
                "psd_detector",
                data=np.array([d.encode("utf-8") for d in detectors], dtype=object),
                dtype=vlen_str,
            )
        # Deliberate deviation from the reference's vlen-f32 PSD storage
        # (ref ``gen.py:372-382``): physical aLIGO PSDs (~1e-46 strain^2/Hz)
        # sit BELOW the float32 subnormal minimum (~1.4e-45), so f32 storage
        # silently zeroes the detector sweet spot.  float64 on disk preserves
        # the values; all readers (including the reference's) cast on load.
        if psd_model is not None:
            obj = _vlen(psd_model, np.float64)
            f.create_dataset("psd", data=obj, dtype=vlen_f64)        # legacy alias
            f.create_dataset("psd_model", data=obj, dtype=vlen_f64)
        if psd_welch is not None and psd_welch_freqs is not None:
            f.create_dataset("psd_welch", data=_vlen(psd_welch, np.float64),
                             dtype=vlen_f64)
            f.create_dataset("psd_welch_freqs",
                             data=_vlen(psd_welch_freqs, np.float64), dtype=vlen_f64)

        f.attrs["padding"] = "none"
        f.attrs["sampling_rate"] = float(sampling_rate)
        f.attrs["delta_t"] = 1.0 / float(sampling_rate)
        f.attrs["time_axis"] = "seconds-rel-peak"
        # mirror what was actually WRITTEN above (welch needs both arrays)
        f.attrs["psd_saved"] = bool("psd_model" in f or "psd_welch" in f)
        f.attrs["psd_model_kind"] = psd_model_kind if psd_model is not None else ""
        if psd_params is not None:
            f.attrs["psd_source"] = str(psd_params.get("source", "both"))
            f.attrs["psd_welch_nperseg"] = int(psd_params.get("nperseg", -1))
            nov = psd_params.get("noverlap")
            f.attrs["psd_welch_noverlap"] = int(nov if nov is not None else -1)
            f.attrs["psd_welch_window"] = str(psd_params.get("window", ""))
        if attrs_extra:
            for k, v in attrs_extra.items():
                f.attrs[k] = v


def read_sampling_rate(f: h5py.File) -> float:
    fs_attr = float(f.attrs.get("sampling_rate", 0.0))
    if fs_attr > 0:
        return fs_attr
    return 1.0 / float(f.attrs.get("delta_t", 1.0 / 4096.0))


def load_measurement(h5_path: str, index: int):
    """Single-sample loader for inference (ref ``inference.py:59-89``).

    Returns (y, clean, fs, P_model, (f_welch, P_welch), meta_dict).
    """
    meta = {}
    with h5py.File(h5_path, "r") as f:
        y = np.array(f["noisy"][index], np.float32)
        clean = np.array(f["signal"][index], np.float32) if "signal" in f else None
        fs = read_sampling_rate(f)
        P_model = None
        if "psd_model" in f:
            P_model = np.array(f["psd_model"][index], np.float64)
        elif "psd" in f:
            P_model = np.array(f["psd"][index], np.float64)
        elif all(k in f for k in ("psd_len", "psd_df", "psd_f_lower")):
            # --save-psd was off: reconstruct the analytic model PSD from the
            # stored grid scalars (see derive_model_psd_np)
            P_model = derive_model_psd_np(
                f["psd_len"][index], f["psd_df"][index],
                f["psd_f_lower"][index])
            meta["psd_model_source"] = "derived:aLIGOZeroDetHighPower"
        fw = Pw = None
        if "psd_welch" in f and "psd_welch_freqs" in f:
            Pw = np.array(f["psd_welch"][index], np.float64)
            fw = np.array(f["psd_welch_freqs"][index], np.float64)
        for k in INFERENCE_META_KEYS:
            if k in f:
                try:
                    meta[k] = float(np.asarray(f[k][index]).reshape(()))
                except Exception:
                    pass
    return y, clean, fs, P_model, (fw, Pw), meta


def load_measurement_npy(npy_path: str, fs: float):
    """Raw .npy measurement loader (ref ``inference.py:91-93``)."""
    y = np.load(npy_path).astype(np.float32).ravel()
    return y, None, fs, None, (None, None), {}


def load_full(h5_path: str, allow_no_signal: bool = False) -> dict:
    """Bulk-load an entire dataset into host memory (ragged lists).

    The TPU pipeline loads everything once and whitens/pads on device in
    batches, instead of re-reading + re-whitening every epoch in dataloader
    worker processes (the reference's CPU hot path, ``dataloader.py:153-229``).
    """
    path = resolve_h5_path(h5_path)
    out = {"path": path}
    with h5py.File(path, "r") as f:
        if "noisy" not in f:
            raise KeyError("HDF5 must have 'noisy' dataset")
        out["noisy"] = [np.asarray(a, np.float32) for a in f["noisy"][:]]
        if "signal" in f:
            out["signal"] = [np.asarray(a, np.float32) for a in f["signal"][:]]
        elif not allow_no_signal:
            raise KeyError("missing 'signal' dataset (allow_no_signal=False)")
        else:
            out["signal"] = None
        out["fs"] = read_sampling_rate(f)
        pm = f.get("psd_model", f.get("psd", None))
        out["psd_model_source"] = "saved" if pm is not None else None
        if pm is not None:
            out["psd_model"] = [np.asarray(a, np.float64) for a in pm[:]]
        elif all(k in f for k in ("psd_len", "psd_df", "psd_f_lower")):
            # --save-psd was off: reconstruct the analytic model PSD from the
            # stored grid scalars.  derive_model_psd_np caches by grid tuple,
            # so the list below shares one array per unique sample length.
            pl = np.asarray(f["psd_len"][:], np.float64)
            pdf = np.asarray(f["psd_df"][:], np.float64)
            pfl = np.asarray(f["psd_f_lower"][:], np.float64)
            out["psd_model"] = [derive_model_psd_np(pl[i], pdf[i], pfl[i])
                                for i in range(len(pl))]
            out["psd_model_source"] = "derived:aLIGOZeroDetHighPower"
        else:
            out["psd_model"] = None
        out["psd_welch"] = ([np.asarray(a, np.float64) for a in f["psd_welch"][:]]
                            if "psd_welch" in f else None)
        out["psd_welch_freqs"] = (
            [np.asarray(a, np.float64) for a in f["psd_welch_freqs"][:]]
            if "psd_welch_freqs" in f else None)
        for k in ["mass1", "mass2", "spin1z", "spin2z", "q", "chirp_mass", "snr",
                  "label_m1", "label_m2", "label_s1", "label_s2"]:
            out[k] = np.asarray(f[k][:], np.float64) if k in f else None
        out["attrs"] = dict(f.attrs)
    out["n"] = len(out["noisy"])
    return out


def compute_meta_scale(h5_path: str) -> dict:
    """Dataset-adaptive label scales via 95th percentiles
    (ref ``train.py:105-130``): M = max p95(mass1, mass2, chirp_mass),
    q = p95(q); defaults {M: 80, q: 10}."""
    scale = {"M": 80.0, "q": 10.0}
    try:
        with h5py.File(resolve_h5_path(h5_path), "r") as f:
            def p95(name):
                if name in f:
                    arr = np.asarray(f[name][:], np.float64)
                    if arr.size:
                        return float(np.nanpercentile(arr, 95))
                return None

            cands = [p95("mass1"), p95("mass2"), p95("chirp_mass")]
            cands = [x for x in cands if x is not None and np.isfinite(x) and x > 0]
            if cands:
                scale["M"] = float(max(cands))
            qp = p95("q")
            if qp is not None and np.isfinite(qp) and qp > 0:
                scale["q"] = float(qp)
    except Exception as e:  # pragma: no cover - diagnostic path
        print(f"[data] meta_scale computation failed; defaults {scale} ({e})")
    return scale
