"""AOT serving export: the deployment sampler as a portable compiled artifact.

Framework extension — no reference counterpart: the reference serves
reconstructions by re-running its Python + torch inference script per
measurement (``/root/reference/src/snr_denoising/inference.py:517-903``),
which needs the full source tree, a torch install and a warm Python
process on every serving host.

Here the ENTIRE deployment recipe — timestep ladder, CFG folding,
self-conditioning policy, seed-averaged sampling, σ rescale and
matched-filter amplitude calibration — is already one jitted XLA program
(``inference.reconstruct_batch``'s device core).  ``jax.export`` serializes
that program (StableHLO) with the model weights baked in as constants, so a
serving host replays it with nothing but ``jax.export.deserialize`` — no
model code, no checkpoint loading, no flax, and bit-identical numerics to
the exporting process on the same platform.  Exports can target multiple
platforms at once (``platforms=("tpu", "cpu")``): lowering is
platform-parameterized, so a CPU host can produce TPU serving artifacts.

The calling convention is fixed and recorded in a JSON sidecar:

    x0_white (B, L)  =  artifact(cond_stack (B, C, L) f32,
                                 sigmas (B,) f32,
                                 seed () i32)

where ``cond_stack`` is the whitened, σ-normalised measurement stack
(measurement channel + broadcast metadata channels) exactly as produced by
``inference.prepare_measurement`` — host-side prep stays outside the
artifact because it is data-dependent f64 FFT work that belongs on the
ingest host, not the accelerator.
"""
from __future__ import annotations

import json
import os
from types import SimpleNamespace
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .inference import apply_distilled_defaults, load_model, resolve_start_t
from .ops.sampling import (
    SamplerConfig,
    aggregate_seeds,
    ddim_sample,
    ddpm_sample,
    dpmpp_sample,
    sample_with_refinement,
)

_SAMPLERS = {"ddim": ddim_sample, "ddpm": ddpm_sample, "dpmpp": dpmpp_sample}

# knobs recorded in the sidecar (the artifact itself is opaque StableHLO)
_CONTRACT_VERSION = 1


def resolve_serving_config(ck: dict, schedule, *, sampler: str = "ddim",
                           steps: Optional[int] = None,
                           ladder: Optional[str] = None,
                           cfg_scale: Optional[float] = None,
                           start_t: Optional[int] = None,
                           eta: float = 0.0) -> Tuple[SamplerConfig, str]:
    """Resolve the deployment ``SamplerConfig`` from a checkpoint contract.

    Same resolution order as ``cli/infer.py``: explicit overrides win, then
    a distilled checkpoint's recorded deployment knobs
    (``apply_distilled_defaults``), then the reference defaults.  One
    serving-specific default differs: ``start_t`` falls back to the top of
    the chain (T-1) instead of the CLI's start-SNR heuristic — a serving
    artifact always samples from pure noise, and a mid-chain start with
    noise init is the measured footgun (corr 0.005 vs 0.78, RESULTS.md
    "start-t footgun").
    """
    a = SimpleNamespace(steps=steps, cfg_scale=cfg_scale, ladder=ladder,
                        start_t=start_t)
    apply_distilled_defaults(a, ck)
    if a.start_t is None:
        a.start_t = int(schedule.T) - 1
    cond_in_ch = int(ck.get("cond_in_ch", 1))
    cfg = SamplerConfig(
        steps=int(a.steps),
        eta=float(eta),
        start_t=resolve_start_t(schedule, a.start_t, None),
        init_mode="noise",
        pred_type=str(ck.get("pred_type", "eps")),
        use_selfcond=int(ck.get("in_ch", 3)) == (1 + cond_in_ch + 1),
        cfg_scale=float(a.cfg_scale),
        drop_y_only=bool(ck.get("dropout_y_only", True)),
        selfcond_mode=str(ck.get("selfcond_mode", "update")),
        ladder=a.ladder or ("lambda" if sampler == "dpmpp" else "t"),
    )
    return cfg, sampler


def build_serving_fn(model, schedule, cfg: SamplerConfig, *,
                     sampler: str = "ddim", avg_seeds: int = 1,
                     avg_mode: str = "mean", amp_calib: str = "none"):
    """The device core of ``inference.reconstruct_batch`` as one pure
    function ``fn(params, cond_stack, sigmas, seed) -> x0_white (B, L)``.

    Identical sampling semantics (seed tiling layout, aggregation, σ
    rescale); the matched-filter amplitude calibration runs ON DEVICE in
    f32 (the host path computes it in f64 — same formula,
    ``inference.mf_amp_calibrate``, difference at f32 roundoff).
    """
    sample_fn = _SAMPLERS[sampler]
    S = max(1, int(avg_seeds))

    def model_fn(p, x, t):
        return model.apply(p, x, t)

    def fn(params, cond_stack, sigmas, seed):
        cond = jnp.asarray(cond_stack, jnp.float32)
        B = cond.shape[0]
        key = jax.random.PRNGKey(seed)
        cond_t = jnp.tile(cond, (S, 1, 1)) if S > 1 else cond
        x0 = sample_with_refinement(sample_fn, model_fn, params, schedule,
                                    cond_t, key, cfg)
        if S > 1:
            per_seed = x0.reshape(S, B, *x0.shape[1:])
            x0 = aggregate_seeds(per_seed, avg_mode, y_norm=cond[:, 0, :])
        sig = jnp.asarray(sigmas, jnp.float32).reshape(-1)
        x0w = x0[:, 0, :] * sig[:, None]
        if amp_calib == "mf":
            yw = cond[:, 0, :] * sig[:, None]
            den = jnp.sum(x0w * x0w, axis=-1)
            s = jnp.sum(yw * x0w, axis=-1) / jnp.maximum(den, 1e-30)
            s = jnp.where((den > 0.0) & jnp.isfinite(s), s, 1.0)
            s = jnp.clip(s, 0.25, 4.0)
            x0w = x0w * s[:, None]
        return x0w

    return fn


def export_sampler(ckpt_path: str, out_path: str, *, batch: int, length: int,
                   platforms: Sequence[str] = ("tpu", "cpu"),
                   sampler: str = "ddim", steps: Optional[int] = None,
                   ladder: Optional[str] = None,
                   cfg_scale: Optional[float] = None,
                   start_t: Optional[int] = None, eta: float = 0.0,
                   avg_seeds: int = 8, avg_mode: str = "mean",
                   amp_calib: str = "mf", use_ema: bool = True,
                   dp: int = 1) -> dict:
    """Export a checkpoint's deployment sampler to ``out_path`` (StableHLO)
    plus a ``<out_path>.json`` sidecar describing the calling convention.

    Returns the sidecar contract dict.  Weights are baked into the program
    as constants — the artifact is fully self-contained.

    ``dp > 1`` exports a POD-SERVING artifact: the batch axis is sharded
    over a ``dp``-device ``data`` mesh (GSPMD inserts the collectives), so
    one artifact drives a whole TPU slice with per-chip throughput intact.
    Lowering uses an ``AbstractMesh`` — export runs on a single-device
    process; the serving host must have ``dp`` local devices of the target
    platform (``load_exported`` builds the mesh and shards automatically).
    """
    from jax import export as jexport

    model, params, schedule, ck = load_model(ckpt_path, use_ema=use_ema)
    cfg, sampler = resolve_serving_config(
        ck, schedule, sampler=sampler, steps=steps, ladder=ladder,
        cfg_scale=cfg_scale, start_t=start_t, eta=eta)
    fn = build_serving_fn(model, schedule, cfg, sampler=sampler,
                          avg_seeds=avg_seeds, avg_mode=avg_mode,
                          amp_calib=amp_calib)
    cond_in_ch = int(ck.get("cond_in_ch", 1))

    def served(cond_stack, sigmas, seed):
        return fn(params, cond_stack, sigmas, seed)

    dp = max(1, int(dp))
    if batch % dp != 0:
        raise ValueError(f"batch {batch} not divisible by dp {dp}")
    jit_kwargs = {}
    spec_shardings = (None, None, None)
    if dp > 1:
        from jax.sharding import (AbstractMesh, NamedSharding,
                                  PartitionSpec)

        mesh = AbstractMesh((dp,), ("data",))
        s_data = NamedSharding(mesh, PartitionSpec("data"))
        s_rep = NamedSharding(mesh, PartitionSpec())
        spec_shardings = (s_data, s_data, s_rep)
        jit_kwargs = dict(in_shardings=spec_shardings,
                          out_shardings=s_data)
    specs = (
        jax.ShapeDtypeStruct((batch, cond_in_ch, length), jnp.float32,
                             sharding=spec_shardings[0]),
        jax.ShapeDtypeStruct((batch,), jnp.float32,
                             sharding=spec_shardings[1]),
        jax.ShapeDtypeStruct((), jnp.int32, sharding=spec_shardings[2]),
    )
    exported = jexport.export(jax.jit(served, **jit_kwargs),
                              platforms=list(platforms))(*specs)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as fh:
        fh.write(blob)

    contract = {
        "contract_version": _CONTRACT_VERSION,
        "calling_convention": {
            "inputs": {
                "cond_stack": [batch, cond_in_ch, length, "float32"],
                "sigmas": [batch, "float32"],
                "seed": ["scalar", "int32"],
            },
            "output": {"x0_white": [batch, length, "float32"]},
        },
        "platforms": list(platforms),
        # devices the artifact was lowered for: 1 = single-chip; >1 = the
        # batch axis is sharded over a dp-device 'data' mesh and the host
        # must present exactly this many local devices
        "dp": dp,
        "checkpoint": os.path.abspath(ckpt_path),
        "ema_weights": bool(use_ema),
        "knobs": {
            "sampler": sampler, "steps": cfg.steps, "ladder": cfg.ladder,
            "start_t": int(cfg.start_t) if cfg.start_t is not None else None,
            "cfg_scale": cfg.cfg_scale, "eta": cfg.eta,
            "pred_type": cfg.pred_type, "avg_seeds": avg_seeds,
            "avg_mode": avg_mode, "amp_calib": amp_calib,
            "selfcond_mode": cfg.selfcond_mode,
        },
        "arch": {k: ck.get(k) for k in ("base_ch", "depth", "time_dim",
                                        "in_ch", "cond_in_ch", "T",
                                        "schedule", "use_attention")},
        # measurement-prep domain (ADVICE r3): the ingest host must run
        # prepare_measurement in the checkpoint's EXACT domain to build
        # cond_stack — with only sampler knobs it could silently prepare in
        # the wrong domain (e.g. mis-scaled meta channels).  This block makes
        # the sidecar the complete serving contract.
        "prep": {
            "whiten": bool(ck.get("whiten", False)),
            "whiten_mode": str(ck.get("whiten_mode_resolved", "")
                               or ck.get("whiten_mode", "auto")),
            "sigma_mode": str(ck.get("sigma_mode", "std")),
            "sigma_fixed": float(ck.get("sigma_fixed", 1.0)),
            "meta_scale": dict(ck.get("meta_scale") or {}),
            "fs": float(ck.get("fs", 4096.0)),
        },
        "artifact_bytes": len(blob),
    }
    with open(out_path + ".json", "w") as fh:
        json.dump(contract, fh, indent=2)
    return contract


def _artifact_device(platforms: Sequence[str]):
    """A local device whose platform is one of the artifact's lowering
    targets, preferring the process default backend.

    Needed because replaying an exported program on a platform it was not
    lowered for is an error, and this environment's default backend is an
    experimental TPU registered in every interpreter — a cpu-only artifact
    must be dispatched onto the cpu backend explicitly."""
    default = jax.default_backend()
    for p in [default] + [q for q in platforms if q != default]:
        if p not in platforms:
            continue
        try:
            devs = jax.devices(p)
        except RuntimeError:
            continue
        if devs:
            return devs[0]
    raise RuntimeError(
        f"no local device matches artifact platforms {list(platforms)} "
        f"(local backends: {jax.default_backend()})")


def load_exported(path: str):
    """Deserialize a serving artifact; returns (callable, contract dict).

    The callable takes ``(cond_stack, sigmas, seed)`` arrays matching the
    sidecar's calling convention.  Inputs are placed on a local device of
    one of the artifact's lowering platforms (preferring the process
    default backend) — calling an exported program on a platform it was
    not lowered for is an error."""
    from jax import export as jexport

    with open(path, "rb") as fh:
        exported = jexport.deserialize(bytearray(fh.read()))
    contract = None
    sidecar = path + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as fh:
            contract = json.load(fh)
        # fail fast on a calling-convention generation mismatch (ADVICE r3):
        # silently consuming a different contract generation would misread
        # the input/output layout
        got = int(contract.get("contract_version", -1))
        if got != _CONTRACT_VERSION:
            raise ValueError(
                f"serving artifact {path} has contract_version {got}; this "
                f"host speaks {_CONTRACT_VERSION} — re-export the artifact "
                f"or upgrade the host")
    n_dev = int(exported.nr_devices)
    if n_dev <= 1:
        dev = _artifact_device(exported.platforms)

        def call(*args):
            return exported.call(*(jax.device_put(a, dev) for a in args))

        return call, contract

    # pod-serving artifact: rebuild the dp-device 'data' mesh on the host
    # and shard (cond_stack, sigmas) over it, seed replicated — mirroring
    # the shardings baked in at export time.
    import numpy as _np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    dev = _artifact_device(exported.platforms)
    devs = jax.devices(dev.platform)
    if len(devs) < n_dev:
        raise RuntimeError(
            f"pod artifact {path} was lowered for {n_dev} devices; this "
            f"host has {len(devs)} local {dev.platform} device(s)")
    mesh = Mesh(_np.array(devs[:n_dev]), ("data",))
    s_data = NamedSharding(mesh, PartitionSpec("data"))
    s_rep = NamedSharding(mesh, PartitionSpec())

    def call(cond_stack, sigmas, seed):
        return exported.call(jax.device_put(cond_stack, s_data),
                             jax.device_put(sigmas, s_data),
                             jax.device_put(seed, s_rep))

    return call, contract


def run_batched(call, contract: dict, cond_stack, sigmas, seed: int = 0):
    """Run an exported artifact over ``n`` measurements, chunking and
    zero-padding to its STATIC batch size.

    The artifact is compiled for a fixed ``(B, C, L)`` (XLA static shapes);
    arbitrary request sizes are served by slicing into ceil(n/B) calls and
    padding the tail chunk (pad rows get zero conditioning and σ=1 — the
    MF-calibration zero-guard keeps them finite — and are dropped from the
    output).  Each chunk advances the seed so chunks don't share noise.

    Returns ``x0_white (n, L) float32``.
    """
    cc = contract["calling_convention"]["inputs"]
    B, C, L = (int(v) for v in cc["cond_stack"][:3])
    cond = np.asarray(cond_stack, np.float32)
    sig = np.asarray(sigmas, np.float32).reshape(-1)
    if cond.ndim != 3 or cond.shape[1:] != (C, L):
        raise ValueError(
            f"cond_stack shape {cond.shape} incompatible with artifact "
            f"contract (n, {C}, {L})")
    if sig.shape[0] != cond.shape[0]:
        raise ValueError(
            f"sigmas length {sig.shape[0]} != cond_stack rows {cond.shape[0]}")
    n = cond.shape[0]
    out = np.empty((n, L), np.float32)
    for ci, lo in enumerate(range(0, n, B)):
        hi = min(lo + B, n)
        cchunk, schunk = cond[lo:hi], sig[lo:hi]
        if hi - lo < B:
            pad = B - (hi - lo)
            cchunk = np.concatenate(
                [cchunk, np.zeros((pad, C, L), np.float32)], axis=0)
            schunk = np.concatenate(
                [schunk, np.ones((pad,), np.float32)], axis=0)
        res = np.asarray(call(cchunk, schunk, np.int32(int(seed) + ci)))
        out[lo:hi] = res[:hi - lo]
    return out


def validate_export(path: str, seed: int = 0) -> float:
    """Replay the artifact on random inputs against nothing but its own
    sidecar (shape contract) and return max|output| sanity; raises on shape
    or dtype violations.  Cheap smoke check for CI / post-export."""
    call, contract = load_exported(path)
    if contract is None:
        raise FileNotFoundError(f"missing sidecar {path}.json")
    cc = contract["calling_convention"]["inputs"]
    B, C, L, _ = cc["cond_stack"]
    rng = np.random.default_rng(seed)
    cond = rng.normal(size=(B, C, L)).astype(np.float32)
    sig = np.ones((B,), np.float32)
    out = np.asarray(call(cond, sig, np.int32(seed)))
    expect = tuple(contract["calling_convention"]["output"]["x0_white"][:2])
    if out.shape != expect:
        raise ValueError(f"artifact output shape {out.shape} != {expect}")
    if not np.all(np.isfinite(out)):
        raise ValueError("artifact produced non-finite output")
    return float(np.max(np.abs(out)))
