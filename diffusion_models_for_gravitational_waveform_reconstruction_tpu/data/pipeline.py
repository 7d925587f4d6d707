"""Host-side data pipeline: whitening, sigma, metadata, static-shape batching.

TPU-first redesign of the reference's torch ``Dataset``/``DataLoader`` path
(``/root/reference/src/snr_denoising/dataloader.py``):

- the reference re-reads HDF5 and re-whitens EVERY sample EVERY epoch inside
  dataloader worker processes (its CPU hot path, ``dataloader.py:153-229``,
  SURVEY.md §3.1).  Here whitening/sigma/metadata are computed ONCE, ahead of
  time, in float64 numpy (preserving the reference's f64 whitening precision,
  ``dataloader.py:112-123``), and cached as dense arrays.
- the reference left-pads each batch to its dynamic max length
  (``dataloader.py:248-268``), which would retrace XLA per batch.  Here
  samples are bucketed to STATIC lengths (next power of two by default),
  left-padded (mergers stay near the end) with validity masks.
- metadata is kept as per-sample scalars (B, 4) = [m1/M, m2/M, s1, s2]
  (ref ``dataloader.py:207-224``) and broadcast to (B, 4, L) channels on
  device, instead of materialising tiled (4, L) arrays on the host.

Whitening modes and their 'auto' preference order (model -> welch -> train)
mirror ``dataloader.py:168-188``.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
from numpy.fft import irfft, rfft, rfftfreq

from . import hdf5io


# ---------------------------------------------------------------------------
# float64 numpy whitening (exact parity with the reference's host math)
# ---------------------------------------------------------------------------

def whiten_train_like_np(y: np.ndarray, x: np.ndarray
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    L = len(y)
    y64 = y.astype(np.float64) - np.mean(y, dtype=np.float64)
    Y = rfft(y64)
    P = np.abs(Y) ** 2
    if P.size > 9:
        P = np.convolve(P, np.ones(9) / 9.0, mode="same")
    # relative floor, not the reference's absolute max(P, 1e-20)
    # (dataloader.py:118): physical-strain periodograms are ~1e-38, so the
    # absolute floor would swamp every bin and disable whitening entirely.
    P = psd_floor_np(P, 1e-12)
    y_w = irfft(Y / np.sqrt(P), n=L).astype(np.float32)
    X = rfft(x.astype(np.float64) - np.mean(x, dtype=np.float64))
    x_w = irfft(X / np.sqrt(P), n=L).astype(np.float32)
    return y_w, x_w, P


def psd_floor_np(P: np.ndarray, rel: float = 1e-12) -> np.ndarray:
    """Regularise a PSD with a floor RELATIVE to its maximum.

    The reference adds an absolute eps (1e-20 at ``dataloader.py:133-140``,
    1e-12 at ``inference.py:190-200``) before sqrt — but physical LIGO PSDs
    are ~1e-46, so the eps dominates every bin and 'whitening' degenerates to
    a frequency-independent rescale.  A relative floor preserves the spectral
    shape at any units scale; de-whitening uses the same floored PSD so the
    round trip stays exact.
    """
    mx = float(np.max(P)) if P.size else 0.0
    if mx <= 0:
        return np.full_like(np.asarray(P, np.float64), 1.0)
    return np.maximum(np.asarray(P, np.float64), rel * mx)


def whiten_weight_np(P: np.ndarray, rel: float = 1e-12) -> np.ndarray:
    """Per-bin whitening weight 1/sqrt(P) with band-limit semantics.

    Bins with P == 0 mark OUT-OF-BAND frequencies (the schema zeroes the
    model PSD below f_lower, ref ``gen.py:92``): they carry infinite noise
    weight, so the whitened content there must be ZERO — flooring them to a
    tiny value instead would amplify sub-cutoff spectral leakage by ~1e26.
    In-band bins are floored relatively (``psd_floor_np``).
    """
    P = np.asarray(P, np.float64)
    Pf = psd_floor_np(P, rel)
    return np.where(P > 0, 1.0 / np.sqrt(Pf), 0.0)


def dewhiten_weight_np(P: np.ndarray, rel: float = 1e-12) -> np.ndarray:
    """Exact inverse of ``whiten_weight_np`` on the in-band support."""
    P = np.asarray(P, np.float64)
    Pf = psd_floor_np(P, rel)
    return np.where(P > 0, np.sqrt(Pf), 0.0)


def interp_psd_np(P: np.ndarray, L_src: int, L_tgt: int, fs: float) -> np.ndarray:
    if L_src == (L_tgt // 2 + 1):
        return P.astype(np.float64)
    f_src = rfftfreq(L_src * 2 - 2, 1.0 / fs)
    f_tgt = rfftfreq(L_tgt, 1.0 / fs)
    return np.interp(f_tgt, f_src, P, left=P[0], right=P[-1]).astype(np.float64)


def whiten_model_np(y: np.ndarray, x: np.ndarray, P_model: np.ndarray, fs: float,
                    eps: float = 1e-12) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Model-PSD whitening with band-limit semantics (``whiten_weight_np``).

    Returns (y_w, x_w, P_interp) — de-whitening must use the returned P via
    ``dewhiten_weight_np`` for an exact in-band inverse.
    """
    L = len(y)
    P = interp_psd_np(np.asarray(P_model, np.float64), len(P_model), L, fs)
    w = whiten_weight_np(P, eps)
    y_w = irfft(rfft(y.astype(np.float64)) * w, n=L).astype(np.float32)
    x_w = irfft(rfft(x.astype(np.float64)) * w, n=L).astype(np.float32)
    return y_w, x_w, P


def whiten_welch_np(y: np.ndarray, x: np.ndarray, f_w: np.ndarray, P_w: np.ndarray,
                    fs: float, eps: float = 1e-12
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Welch-PSD whitening with band-limit semantics (``whiten_weight_np``)."""
    L = len(y)
    f_tgt = rfftfreq(L, 1.0 / fs)
    P = np.interp(f_tgt, np.asarray(f_w, np.float64), np.asarray(P_w, np.float64),
                  left=P_w[0], right=P_w[-1])
    w = whiten_weight_np(P, eps)
    y_w = irfft(rfft(y.astype(np.float64)) * w, n=L).astype(np.float32)
    x_w = irfft(rfft(x.astype(np.float64)) * w, n=L).astype(np.float32)
    return y_w, x_w, P


def mad_std_np(x: np.ndarray) -> float:
    x64 = np.asarray(x, np.float64)
    return 1.4826 * float(np.median(np.abs(x64 - np.median(x64)))) + 1e-24


def pick_sigma_np(y: np.ndarray, mode: str, fixed: float) -> float:
    if mode == "std":
        s = float(np.std(y.astype(np.float64)))
    elif mode == "mad":
        s = mad_std_np(y)
    elif mode == "fixed":
        s = float(fixed)
    else:
        raise ValueError(f"unknown sigma_mode: {mode!r}")
    if not np.isfinite(s) or s <= 0:
        s = 1.0
    return s


# ---------------------------------------------------------------------------
# Bucketed, static-shape batching
# ---------------------------------------------------------------------------

def next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


@dataclasses.dataclass
class PreparedDataset:
    """Whitened, padded, mask-carrying dense arrays, grouped by bucket length.

    buckets: {L: dict(clean (Nb,1,L) f32, noisy (Nb,1,L) f32, mask (Nb,1,L) f32,
                      sigma (Nb,) f32, meta (Nb,4) f32, index (Nb,) i64)}
    """

    buckets: Dict[int, Dict[str, np.ndarray]]
    fs: float
    meta_scale: dict
    whiten: bool
    whiten_mode: str
    sigma_mode: str
    n: int

    @property
    def bucket_lengths(self) -> List[int]:
        return sorted(self.buckets.keys())


def prepare_dataset(
    h5_path: str,
    *,
    whiten: bool = False,
    whiten_mode: str = "auto",
    sigma_mode: str = "std",
    sigma_fixed: float = 1.0,
    include_metadata: bool = True,
    mass_scale: Optional[float] = None,
    bucket_lengths: Optional[List[int]] = None,
    allow_no_signal: bool = False,
    max_samples: Optional[int] = None,
) -> PreparedDataset:
    """Load + whiten + sigma + bucket a dataset once (see module docstring).

    ``bucket_lengths``: explicit static lengths; by default each sample goes
    to the next power of two >= its length (so a fixed-config dataset lands
    in a single bucket -> one XLA compilation).
    ``max_samples``: cap for quick experiments on large datasets.
    """
    raw = hdf5io.load_full(h5_path, allow_no_signal=allow_no_signal)
    fs = raw["fs"]
    meta_scale = hdf5io.compute_meta_scale(raw["path"])
    M = float(mass_scale if mass_scale is not None else meta_scale.get("M", 80.0))

    per_bucket: Dict[int, Dict[str, list]] = {}
    n = raw["n"] if max_samples is None else min(raw["n"], int(max_samples))
    for i in range(n):
        y = raw["noisy"][i]
        x = raw["signal"][i] if raw["signal"] is not None else np.zeros_like(y)
        # NaN/Inf guard (ref dataloader.py:162-165)
        if not np.isfinite(y).all():
            y = np.nan_to_num(y, nan=0.0, posinf=0.0, neginf=0.0)
        if not np.isfinite(x).all():
            x = np.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)

        if whiten:
            mode = whiten_mode
            if mode == "auto":
                if raw["psd_model"] is not None:
                    mode = "model"
                elif raw["psd_welch"] is not None and raw["psd_welch_freqs"] is not None:
                    mode = "welch"
                else:
                    mode = "train"
            if mode == "model" and raw["psd_model"] is not None:
                y, x, _ = whiten_model_np(y, x, raw["psd_model"][i], fs)
            elif (mode == "welch" and raw["psd_welch"] is not None
                  and raw["psd_welch_freqs"] is not None):
                y, x, _ = whiten_welch_np(y, x, raw["psd_welch_freqs"][i],
                                          raw["psd_welch"][i], fs)
            else:
                y, x, _ = whiten_train_like_np(y, x)

        sigma = pick_sigma_np(y, sigma_mode, sigma_fixed)

        if include_metadata:
            def _get(name):
                arr = raw.get(name)
                return float(arr[i]) if arr is not None else 0.0

            meta = np.array([
                _get("mass1") / max(M, 1e-9),
                _get("mass2") / max(M, 1e-9),
                _get("spin1z"),
                _get("spin2z"),
            ], np.float32)
        else:
            meta = np.zeros(0, np.float32)

        L = len(y)
        if bucket_lengths is not None:
            fits = [bl for bl in bucket_lengths if bl >= L]
            if not fits:
                raise ValueError(f"sample length {L} exceeds all bucket lengths")
            Lb = min(fits)
        else:
            Lb = next_pow2(L)
        b = per_bucket.setdefault(Lb, {"clean": [], "noisy": [], "mask": [],
                                       "sigma": [], "meta": [], "index": []})
        pad = Lb - L
        # LEFT pad: mergers stay near the end (ref dataloader.py:254-256)
        b["clean"].append(np.pad(x.astype(np.float32), (pad, 0)))
        b["noisy"].append(np.pad(y.astype(np.float32), (pad, 0)))
        b["mask"].append(np.pad(np.ones(L, np.float32), (pad, 0)))
        b["sigma"].append(sigma)
        b["meta"].append(meta)
        b["index"].append(i)

    buckets = {}
    for Lb, cols in per_bucket.items():
        buckets[Lb] = {
            "clean": np.stack(cols["clean"])[:, None, :],
            "noisy": np.stack(cols["noisy"])[:, None, :],
            "mask": np.stack(cols["mask"])[:, None, :],
            "sigma": np.asarray(cols["sigma"], np.float32),
            "meta": np.stack(cols["meta"]) if include_metadata
                    else np.zeros((len(cols["sigma"]), 0), np.float32),
            "index": np.asarray(cols["index"], np.int64),
        }

    return PreparedDataset(
        buckets=buckets, fs=fs, meta_scale=meta_scale, whiten=whiten,
        whiten_mode=whiten_mode, sigma_mode=sigma_mode, n=n,
    )


def dataset_from_arrays(
    clean: np.ndarray,              # (N, L)
    noisy: np.ndarray,              # (N, L)
    fs: float,
    *,
    meta: Optional[np.ndarray] = None,   # (N, 4) already scaled
    sigma_mode: str = "std",
    sigma_fixed: float = 1.0,
    whiten: bool = False,
    meta_scale: Optional[dict] = None,
) -> PreparedDataset:
    """Build a single-bucket PreparedDataset directly from dense arrays —
    the path for on-device synthetic generation (``data/synth.py``) where no
    HDF5 round-trip is needed."""
    clean = np.asarray(clean, np.float32)
    noisy = np.asarray(noisy, np.float32)
    N, L = noisy.shape
    sigmas = np.array([pick_sigma_np(noisy[i], sigma_mode, sigma_fixed)
                       for i in range(N)], np.float32)
    if meta is None:
        meta = np.zeros((N, 4), np.float32)
    bucket = {
        "clean": clean[:, None, :],
        "noisy": noisy[:, None, :],
        "mask": np.ones((N, 1, L), np.float32),
        "sigma": sigmas,
        "meta": np.asarray(meta, np.float32),
        "index": np.arange(N, dtype=np.int64),
    }
    return PreparedDataset(
        buckets={L: bucket}, fs=fs,
        meta_scale=meta_scale or {"M": 80.0, "q": 10.0},
        whiten=whiten, whiten_mode="raw", sigma_mode=sigma_mode, n=N,
    )


def iterate_batches(
    ds: PreparedDataset,
    batch_size: int,
    rng: np.random.Generator,
    shuffle: bool = True,
    drop_remainder: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield static-shape batches across buckets for one epoch.

    To keep batch shapes static (one compile per bucket length), a trailing
    partial batch is filled by wrapping around within its bucket unless
    ``drop_remainder``.
    """
    order = []
    for Lb in ds.bucket_lengths:
        N = ds.buckets[Lb]["sigma"].shape[0]
        idx = rng.permutation(N) if shuffle else np.arange(N)
        n_batches = N // batch_size if drop_remainder else -(-N // batch_size)
        for bi in range(n_batches):
            sel = idx[bi * batch_size:(bi + 1) * batch_size]
            if len(sel) < batch_size:
                fill = idx[: batch_size - len(sel)]
                sel = np.concatenate([sel, fill])
            order.append((Lb, sel))
    if shuffle:
        rng.shuffle(order)
    for Lb, sel in order:
        b = ds.buckets[Lb]
        yield {k: v[sel] for k, v in b.items()}


def synthetic_dataset(
    n: int,
    *,
    seed: int = 0,
    segment_len: int = 8192,
    fs: int = 4096,
    mass_min: float = 20.0,
    mass_max: float = 50.0,
    snr_min: float = 8.0,
    snr_max: float = 30.0,
    whiten: bool = True,
    sigma_mode: str = "std",
    chunk: int = 256,
) -> PreparedDataset:
    """Fully self-contained dataset: on-device synthesis -> model-PSD
    whitening -> PreparedDataset, no HDF5/PyCBC round trip.

    This is the ``gw-train --data synth:N`` path — the TPU-native answer to
    'give me training data now'.  Whitening uses the known generation PSD
    (scaled units end to end; see ``data/synth.py``).
    """
    import jax
    import jax.numpy as jnp

    from . import synth
    from ..ops.whiten import whiten_weight

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    cfg = synth.SynthConfig(n=segment_len, fs=fs)

    a = rng.uniform(mass_min, mass_max, size=n)
    b = rng.uniform(mass_min, mass_max, size=n)
    m1 = np.maximum(a, b)
    m2 = np.minimum(a, b)
    snr = rng.uniform(snr_min, snr_max, size=n)

    clean_l, noisy_l = [], []
    w = None
    for c0 in range(0, n, chunk):
        key, k = jax.random.split(key)
        sl = slice(c0, min(n, c0 + chunk))
        out = synth.generate_batch(k, jnp.asarray(m1[sl]), jnp.asarray(m2[sl]),
                                   jnp.asarray(snr[sl]), config=cfg)
        if whiten:
            # whiten with the scaled generation PSD on device (the joint
            # strain/PSD scaling cancels inside the whitening ratio up to
            # the global 1e-21 factor, which sigma-normalisation removes)
            if w is None:
                w = whiten_weight(out["psd"][0])
            C = jnp.fft.rfft(out["signal"], axis=-1) * w
            Y = jnp.fft.rfft(out["noisy"], axis=-1) * w
            clean_l.append(np.asarray(jnp.fft.irfft(C, n=segment_len)))
            noisy_l.append(np.asarray(jnp.fft.irfft(Y, n=segment_len)))
        else:
            clean_l.append(np.asarray(out["signal"]))
            noisy_l.append(np.asarray(out["noisy"]))

    clean = np.concatenate(clean_l).astype(np.float32)
    noisy = np.concatenate(noisy_l).astype(np.float32)
    M = max(float(np.percentile(np.concatenate([m1, m2]), 95)), 1e-9)
    meta = np.stack([m1 / M, m2 / M, np.zeros(n), np.zeros(n)],
                    axis=1).astype(np.float32)
    ds = dataset_from_arrays(clean, noisy, fs=float(fs), meta=meta,
                             sigma_mode=sigma_mode,
                             meta_scale={"M": M, "q": 10.0})
    ds.whiten = whiten
    ds.whiten_mode = "model" if whiten else "raw"
    return ds


def prefetch_to_device(batch_iter, size: int = 2, sharding=None):
    """Double-buffered host->device transfer: keep ``size`` batches in
    flight so the H2D copy of batch i+1 overlaps the compute of batch i
    (``jax.device_put`` is asynchronous).

    The reference relies on torch pinned-memory + non_blocking copies for
    the same overlap (``train.py:324-332``); this is the JAX equivalent.
    ``sharding``: optional NamedSharding for the batch arrays (DP mesh).
    """
    import collections

    import jax
    import jax.numpy as jnp

    def put(batch):
        out = {}
        for k, v in batch.items():
            if k == "index":
                continue
            a = jnp.asarray(v)
            out[k] = jax.device_put(a, sharding) if sharding is not None else a
        return out

    queue = collections.deque()
    for batch in batch_iter:
        queue.append(put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def num_batches(ds: PreparedDataset, batch_size: int,
                drop_remainder: bool = False) -> int:
    total = 0
    for Lb in ds.bucket_lengths:
        N = ds.buckets[Lb]["sigma"].shape[0]
        total += N // batch_size if drop_remainder else -(-N // batch_size)
    return total
