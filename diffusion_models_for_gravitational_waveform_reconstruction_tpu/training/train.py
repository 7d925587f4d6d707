"""Jitted, mesh-sharded training engine.

Reference parity: reproduces the full semantics of
``/root/reference/src/snr_denoising/train.py`` (see SURVEY.md §3.1):
sigma-normalisation in the whitening domain, [y || meta] conditioning stacks,
input clamping, stratified/uniform timestep sampling with ``t_min_frac`` and
``t_multi`` repeats, classifier-free-guidance dropout (y-only by default),
probabilistic self-conditioning via a one-step no-grad x0 estimate, masked
Huber/MSE epsilon-loss with optional (1-abar_t)^p weighting, AdamW with
linear-warmup + cosine LR, gradient clipping, EMA, bad-batch skipping,
JSONL logging (train_batch / probe / epoch_end), first-batch deep debug, and
the checkpoint metadata contract.

TPU-first design (NOT the torch loop):

- ONE jitted ``train_step`` per (batch, length) bucket: q_sample, CFG
  dropout, self-conditioning, forward, loss, grad, clip, AdamW update and
  EMA all fuse into a single XLA program; no per-batch host sync except the
  scalar metrics fetch.
- the reference's ``continue``-on-bad-batch (``train.py:423-436``) becomes a
  branchless gated update: the new (params, opt_state, ema) are selected
  against the old ones with a traced ``ok`` predicate — no host round-trip,
  no recompile.
- self-conditioning's data-dependent extra forward (``train.py:401-405``)
  is a ``lax.cond`` on a single Bernoulli draw per batch (same semantics:
  one coin per batch, not per sample).
- bf16 compute / f32 params replaces CUDA AMP + GradScaler (``train.py:283``)
  — TPUs need no loss scaling.
- data parallelism: params replicated, batch sharded over the mesh ``data``
  axis; XLA's SPMD partitioner inserts the gradient all-reduce (the
  reference is single-device, SURVEY.md §2.9).
"""
from __future__ import annotations

import dataclasses
import json
import os
import shutil
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.unet import UNet1D
from ..ops.diffusion import (
    masked_loss,
    q_sample,
    sample_timesteps_stratified,
)
from ..ops.schedules import DiffusionSchedule, make_schedule
from ..utils.checkpoint import (
    load_checkpoint,
    restore_params,
    save_checkpoint,
    select_weights,
)
from ..utils.jsonl import JsonlLogger


@dataclasses.dataclass
class TrainConfig:
    """All training knobs; names track the reference CLI (``train.py:632-714``)."""

    data: str = ""
    model_dir: str = "model"
    epochs: int = 50
    batch_size: int = 16
    lr: float = 2e-4
    weight_decay: float = 1e-4
    T: int = 1000
    base_ch: int = 64
    time_dim: int = 128
    depth: int = 3
    seed: int = 42
    schedule: str = "cosine"            # extension: 'linear' also supported
    use_attention: bool = False         # extension: bottleneck attention

    # guidance & self-conditioning
    p_uncond: float = 0.2
    p_selfcond: float = 0.5
    t_min_frac: float = 0.5
    force_cond_epochs: int = 0
    dropout_y_only: bool = True

    # timestep coverage
    t_cover: str = "rand"               # 'rand' | 'strat'
    t_bins: int = 0
    t_multi: int = 1

    # parametrisation: 'eps' (reference) | 'v' (extension; well-conditioned
    # at high t where eps targets carry no signal)
    pred_type: str = "eps"

    # robustness
    loss: str = "huber"                 # 'huber' | 'mse'
    huber_beta: float = 0.5
    clip_grad: float = 1.0
    clamp_inputs: float = 10.0
    skip_bad_batches: bool = True
    skip_loss_threshold: float = 50.0
    loss_weight_power: float = 0.0

    # EMA + LR schedule
    ema: bool = True
    ema_decay: float = 0.999
    warmup_steps: int = 1000
    cosine_decay: bool = True
    min_lr_scale: float = 0.1

    # data domain
    whiten: bool = False
    whiten_mode: str = "auto"
    sigma_mode: str = "std"
    sigma_fixed: float = 1.0
    streaming: bool = False             # lazy chunked HDF5 loading (larger-
                                        # than-RAM datasets); see
                                        # data.pipeline.StreamingDataset
    stream_chunk: int = 512             # samples prepared per chunk
    max_len: int = 0                    # 0 = off; else LEFT-truncate samples
                                        # to this length (merger kept; caps
                                        # the largest bucket so the 16 kHz
                                        # step program fits HBM)
    device_data: bool = True            # keep the bucketed dataset resident
                                        # in HBM and gather batches on-device
                                        # (zero per-step H2D; also avoids the
                                        # axon client's per-transfer host
                                        # leak — see pipeline.upload_buckets)

    # compute
    bf16: bool = True                   # bf16 activations (TPU-native AMP)
    data_parallel: bool = True          # shard batch over the mesh
    tp: int = 1                         # tensor-parallel ('model' mesh axis)
                                        # size: conv output channels sharded
                                        # via GSPMD (parallel/mesh.py)
    remat: bool = False                 # jax.checkpoint the forward: trade
                                        # FLOPs for activation memory (the
                                        # 16 kHz batch-512 config needs it)

    # logging / probes
    log_jsonl: Optional[str] = None
    probe_cond: bool = False
    probe_t: Tuple[int, ...] = (24, 50, 200, 500, 800)
    probe_interval: int = 50
    debug_first: bool = False
    debug_first_every: int = 0

    # checkpointing
    init_from: Optional[str] = None
    save_every_epochs: int = 0          # 0 = final only (reference behaviour)
    resume: Optional[str] = None        # full-state resume (params/EMA/opt/epoch)

    # profiling (SURVEY.md §5.1: the reference has none; TPU rebuild adds
    # jax.profiler traces + steps/sec counters)
    profile_dir: Optional[str] = None
    profile_steps: Tuple[int, int] = (10, 20)   # [start, stop) global steps


class TrainState(NamedTuple):
    params: Any
    ema_params: Any
    opt_state: Any
    step: jnp.ndarray


def make_lr_schedule(cfg: TrainConfig, total_steps: int):
    """Linear warmup then cosine to ``min_lr_scale`` (ref ``train.py:84-91``)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(1e-8, (step + 1.0) / max(1, cfg.warmup_steps))
        progress = (step - cfg.warmup_steps) / max(1, total_steps - cfg.warmup_steps)
        progress = jnp.clip(progress, 0.0, 1.0)
        if cfg.cosine_decay:
            cos = cfg.min_lr_scale + 0.5 * (1 - cfg.min_lr_scale) * (
                1 + jnp.cos(jnp.pi * progress))
        else:
            cos = 1.0
        return cfg.lr * jnp.where(step < cfg.warmup_steps, warm, cos)

    return sched


def make_optimizer(cfg: TrainConfig, total_steps: int):
    lr_sched = make_lr_schedule(cfg, total_steps)
    tx = []
    if cfg.clip_grad > 0:
        tx.append(optax.clip_by_global_norm(cfg.clip_grad))
    tx.append(optax.adamw(learning_rate=lr_sched, weight_decay=cfg.weight_decay))
    return optax.chain(*tx), lr_sched


def _broadcast_meta(meta: jnp.ndarray, L: int) -> Optional[jnp.ndarray]:
    """(B, C_meta) scalars -> (B, C_meta, L) channels (the device-side
    counterpart of the host tiling at ref ``dataloader.py:219-222``)."""
    if meta.ndim != 2 or meta.shape[1] == 0:
        return None
    return jnp.broadcast_to(meta[:, :, None], (*meta.shape, L))


def make_train_step(
    model: UNet1D,
    schedule: DiffusionSchedule,
    cfg: TrainConfig,
    optimizer,
    lr_sched,
):
    """Build the jitted train step.

    step(state, batch, key, t_min, p_uncond_eff, p_selfcond_eff)
      -> (state, metrics dict of scalars)
    """
    K = max(1, int(cfg.t_multi))

    def apply_model(params, net_in, t):
        return model.apply(params, net_in, t)

    if cfg.remat:
        apply_model = jax.checkpoint(apply_model)

    def loss_fn(params, x_t, cond_used, x0_sc, t, target, mask):
        net_in = jnp.concatenate([x_t, cond_used, x0_sc], axis=1)
        out = apply_model(params, net_in, t)
        loss = masked_loss(out, target, mask, t, schedule, cfg.loss,
                           cfg.huber_beta, cfg.loss_weight_power)
        return loss, out

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], key: jax.Array,
             t_min: jnp.ndarray, p_uncond_eff: jnp.ndarray,
             p_selfcond_eff: jnp.ndarray):
        clean_raw = batch["clean"].astype(jnp.float32)
        noisy_raw = batch["noisy"].astype(jnp.float32)
        sigma = batch["sigma"].astype(jnp.float32)
        mask = batch["mask"].astype(jnp.float32)
        meta = batch.get("meta")
        B, _, L = clean_raw.shape

        sigma_ = sigma.reshape(-1, 1, 1)
        clean_norm = clean_raw / sigma_
        y_norm = noisy_raw / sigma_
        meta_bc = _broadcast_meta(meta, L) if meta is not None else None

        if cfg.clamp_inputs > 0:
            clean_norm = jnp.clip(clean_norm, -cfg.clamp_inputs, cfg.clamp_inputs)
            y_norm = jnp.clip(y_norm, -cfg.clamp_inputs, cfg.clamp_inputs)

        # t_multi: K distinct timesteps per item (ref train.py:358-369)
        if K > 1:
            clean_norm = jnp.repeat(clean_norm, K, axis=0)
            y_norm = jnp.repeat(y_norm, K, axis=0)
            mask = jnp.repeat(mask, K, axis=0)
            if meta_bc is not None:
                meta_bc = jnp.repeat(meta_bc, K, axis=0)
        bsz_eff = clean_norm.shape[0]

        cond_stack = (jnp.concatenate([y_norm, meta_bc], axis=1)
                      if meta_bc is not None else y_norm)

        k_t, k_q, k_drop, k_sc_coin, k_sc = jax.random.split(key, 5)
        t_max = cfg.T - 1
        # determinism fixture (SURVEY.md §5.2): parity tests inject the exact
        # (t, eps) the reference trainer consumed; production batches don't
        # carry these keys, so the trace is unchanged there.
        if "t_inject" in batch:
            t = batch["t_inject"].astype(jnp.int32)
        elif cfg.t_cover == "strat":
            t = sample_timesteps_stratified(k_t, bsz_eff, t_min, t_max, cfg.t_bins)
        else:
            u = jax.random.uniform(k_t, (bsz_eff,))
            t = (t_min + jnp.floor(u * (cfg.T - t_min))).astype(jnp.int32)

        if "eps_inject" in batch:
            from ..ops.diffusion import q_sample_with_eps

            eps = batch["eps_inject"].astype(jnp.float32)
            x_t = q_sample_with_eps(schedule, clean_norm, t, eps)
        else:
            x_t, eps = q_sample(schedule, clean_norm, t, k_q)
        if cfg.clamp_inputs > 0:
            x_t = jnp.clip(x_t, -cfg.clamp_inputs, cfg.clamp_inputs)

        # CFG dropout (y-only by default; ref train.py:385-398)
        drop = (jax.random.uniform(k_drop, (bsz_eff, 1, 1)) < p_uncond_eff
                ).astype(jnp.float32)
        if meta_bc is not None and cfg.dropout_y_only:
            y_used = y_norm * (1.0 - drop)
            cond_used = jnp.concatenate([y_used, meta_bc], axis=1)
        else:
            cond_used = cond_stack * (1.0 - drop)

        # self-conditioning: one coin per batch (ref train.py:401-405)
        def selfcond_on(_):
            zeros_sc = jnp.zeros_like(x_t)
            net_in = jnp.concatenate([x_t, cond_used, zeros_sc], axis=1)
            out0 = apply_model(state.params, net_in, t)
            ab = schedule.alpha_bar[t].reshape(-1, 1, 1)
            if cfg.pred_type == "v":
                x0_hat = jnp.sqrt(ab) * x_t - jnp.sqrt(1 - ab) * out0
            else:
                x0_hat = (x_t - jnp.sqrt(1 - ab) * out0) / jnp.sqrt(ab)
            return jax.lax.stop_gradient(x0_hat)

        coin = jax.random.uniform(k_sc_coin, ()) < p_selfcond_eff
        x0_sc = jax.lax.cond(coin, selfcond_on,
                             lambda _: jnp.zeros_like(x_t), operand=None)

        if cfg.pred_type == "v":
            from ..ops.diffusion import v_target

            target = v_target(schedule, clean_norm, eps, t)
        else:
            target = eps
        (loss, _out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x_t, cond_used, x0_sc, t, target, mask)
        grad_norm = optax.global_norm(grads)

        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # EMA (ref train.py:73-81): decay*ema + (1-decay)*params
        if cfg.ema:
            d = cfg.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, state.ema_params, new_params)
        else:
            new_ema = state.ema_params

        # bad-batch gate (ref train.py:423-436), branchless
        ok = jnp.isfinite(loss)
        if cfg.skip_bad_batches:
            ok = ok & (loss <= cfg.skip_loss_threshold)
        ok = ok & jnp.all(jnp.isfinite(grad_norm))

        def sel(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old)

        new_state = TrainState(
            params=sel(new_params, state.params),
            ema_params=sel(new_ema, state.ema_params),
            opt_state=sel(new_opt, state.opt_state),
            step=state.step + ok.astype(jnp.int32),
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "lr": lr_sched(state.step),
            "ok": ok,
            "t_min": t.min(),
            "t_mean": t.mean().astype(jnp.float32),
            "t_max": t.max(),
            "bsz_eff": jnp.asarray(bsz_eff),
        }
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_probe_fn(model: UNet1D, schedule: DiffusionSchedule, cfg: TrainConfig):
    """Conditioning probe: cond-on vs cond-off eps-prediction quality at fixed
    timesteps (ref ``train.py:482-521``).  Returns per-t dicts of scalars."""

    @jax.jit
    def probe(params, clean_norm0, y_norm0, meta_bc0, t_pick, key):
        # single-sample probe (B=1 slices)
        zeros_sc = jnp.zeros_like(clean_norm0)
        zeros_y = jnp.zeros_like(y_norm0)
        if meta_bc0 is not None and meta_bc0.shape[1] > 0:
            cond_on = jnp.concatenate([y_norm0, meta_bc0], axis=1)
            cond_off = jnp.concatenate([zeros_y, meta_bc0], axis=1)
        else:
            cond_on, cond_off = y_norm0, zeros_y
        t = jnp.full((1,), t_pick, jnp.int32)
        x_t, eps = q_sample(schedule, clean_norm0, t, key)
        net_on = jnp.concatenate([x_t, cond_on, zeros_sc], axis=1)
        net_off = jnp.concatenate([x_t, cond_off, zeros_sc], axis=1)
        eps_on = model.apply(params, net_on, t)
        eps_off = model.apply(params, net_off, t)

        def corr(a, b):
            a = a.reshape(-1) - a.mean()
            b = b.reshape(-1) - b.mean()
            den = jnp.sqrt((a * a).sum()) * jnp.sqrt((b * b).sum()) + 1e-12
            return (a * b).sum() / den

        delta = eps_on - eps_off
        return {
            "mse_on": jnp.mean((eps_on - eps) ** 2),
            "mse_off": jnp.mean((eps_off - eps) ** 2),
            "corr_on": corr(eps_on, eps),
            "corr_off": corr(eps_off, eps),
            "cond_delta_rms": jnp.linalg.norm(delta.reshape(-1)) / jnp.sqrt(delta.size),
        }

    return probe


def masked_corr(a, b, m):
    """Masked Pearson correlation, scale-invariant at physical-strain
    magnitudes: inputs are max-abs-normalised before the products (f32
    products of ~1e-22 values are subnormal and flush to zero on TPU), and
    the denominator is zero-GUARDED, never eps-padded (an absolute eps
    swamps physical scales — the reference's corr-eps bug; CLAUDE.md rule).
    """
    w = m.reshape(-1)
    a = a.reshape(-1) * w
    b = b.reshape(-1) * w
    n = jnp.maximum(w.sum(), 1.0)
    a = a - a.sum() / n * w
    b = b - b.sum() / n * w
    amax = jnp.max(jnp.abs(a))
    bmax = jnp.max(jnp.abs(b))
    a = jnp.where(amax > 0, a / amax, a)
    b = jnp.where(bmax > 0, b / bmax, b)
    den = jnp.sqrt((a * a).sum()) * jnp.sqrt((b * b).sum())
    return jnp.where(den > 0, (a * b).sum() / den, 0.0)


def make_debug_x0_fn(model: UNet1D, schedule: DiffusionSchedule,
                     cfg: TrainConfig):
    """First-batch one-step-x0 quality probe (ref ``train.py:544-576``):
    masked corr and MSE of the single-step x0 estimate against clean, in
    both the sigma-normalised and the whitened domain, on sample 0."""
    from ..ops.diffusion import eps_to_x0, v_to_x0_eps

    @jax.jit
    def dbg(params, clean, noisy, sigma, mask, meta, t_pick, key):
        sigma_ = sigma.reshape(-1, 1, 1)
        clean_norm = clean / sigma_
        y_norm = noisy / sigma_
        if cfg.clamp_inputs > 0:
            clean_norm = jnp.clip(clean_norm, -cfg.clamp_inputs,
                                  cfg.clamp_inputs)
            y_norm = jnp.clip(y_norm, -cfg.clamp_inputs, cfg.clamp_inputs)
        L = clean.shape[-1]
        meta_bc = _broadcast_meta(meta, L) if meta is not None else None
        cond = (jnp.concatenate([y_norm, meta_bc], axis=1)
                if meta_bc is not None else y_norm)
        B = clean.shape[0]
        t = jnp.full((B,), t_pick, jnp.int32)
        x_t, _eps = q_sample(schedule, clean_norm, t, key)
        if cfg.clamp_inputs > 0:
            x_t = jnp.clip(x_t, -cfg.clamp_inputs, cfg.clamp_inputs)
        net_in = jnp.concatenate([x_t, cond, jnp.zeros_like(x_t)], axis=1)
        out = model.apply(params, net_in, t)
        if cfg.pred_type == "v":
            x0_hat_norm, _ = v_to_x0_eps(schedule, x_t, out, t)
        else:
            x0_hat_norm = eps_to_x0(schedule, x_t, out, t)
        x0_hat = x0_hat_norm * sigma_
        corr_masked = masked_corr

        m0 = mask[:1]
        msum = jnp.maximum(m0.sum(), 1.0)
        return {
            "valid_frac": m0.mean(),
            "corr_x0_norm": corr_masked(x0_hat_norm[:1], clean_norm[:1], m0),
            "corr_x0_white": corr_masked(x0_hat[:1], clean[:1], m0),
            "mse_x0_norm": (((x0_hat_norm[:1] - clean_norm[:1]) ** 2)
                            * m0).sum() / msum,
            "mse_x0_white": (((x0_hat[:1] - clean[:1]) ** 2) * m0).sum()
                            / msum,
            "x0_hat_sample0": x0_hat[0],
        }

    return dbg


def prepare_output_dir(base_dir: str) -> str:
    """Clean ``<base>/latest_model`` (ref ``train.py:17-27``)."""
    out_dir = os.path.join(base_dir, "latest_model")
    if os.path.exists(out_dir):
        for f in os.listdir(out_dir):
            p = os.path.join(out_dir, f)
            try:
                os.remove(p) if os.path.isfile(p) else shutil.rmtree(p)
            except Exception:
                pass
    else:
        os.makedirs(out_dir, exist_ok=True)
    return out_dir


def build_model_and_state(
    cfg: TrainConfig,
    c_meta: int,
    example_len: int,
    total_steps: int,
    key: jax.Array,
):
    """Construct model / schedule / optimizer / TrainState.

    Channel layout inference mirrors ``train.py:222-242``:
    cond_in_ch = 1 + C_meta; in_ch = 1 + cond_in_ch + 1 (selfcond).
    """
    cond_in_ch = 1 + c_meta
    in_ch = 1 + cond_in_ch + 1
    model = UNet1D(
        in_ch=in_ch,
        base_ch=cfg.base_ch,
        time_dim=cfg.time_dim,
        depth=cfg.depth,
        t_embed_max_time=max(0, cfg.T - 1),
        cond_in_ch=cond_in_ch,
        use_selfcond=True,
        use_attention=cfg.use_attention,
        dtype=jnp.bfloat16 if cfg.bf16 else None,
    )
    schedule = make_schedule(cfg.T, cfg.schedule)
    x0 = jnp.zeros((1, in_ch, example_len))
    params = model.init(key, x0, jnp.zeros((1,), jnp.int32))

    if cfg.init_from:
        if cfg.init_from.endswith((".pth", ".pt")):
            # reference-framework interop: warm-start directly from a torch
            # checkpoint (ref train.py:258-262 loads .pth the same way)
            from .. utils.torch_compat import load_torch_checkpoint_as_flax

            params = load_torch_checkpoint_as_flax(cfg.init_from, cfg.depth)
            print(f"[init] loaded torch weights from {cfg.init_from} (EMA preferred)")
        else:
            ckpt = load_checkpoint(cfg.init_from)
            weights, used_ema = select_weights(ckpt, use_ema=True)
            params = restore_params(params, weights)
            print(f"[init] loaded weights from {cfg.init_from} (EMA={used_ema})")

    optimizer, lr_sched = make_optimizer(cfg, total_steps)
    opt_state = optimizer.init(params)
    ema_params = jax.tree_util.tree_map(jnp.copy, params) if cfg.ema else params
    state = TrainState(params=params, ema_params=ema_params, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))
    return model, schedule, optimizer, lr_sched, state, (in_ch, cond_in_ch)


def checkpoint_args(cfg: TrainConfig, in_ch: int, cond_in_ch: int, c_meta: int,
                    meta_scale: dict, whiten_mode_resolved: str = "",
                    data_fs: float = 0.0) -> dict:
    """The checkpoint ``args`` contract (ref ``train.py:611-625``).

    ``whiten_mode_resolved`` records the ACTUAL whitening domain the data
    pipeline used (may differ from the requested ``whiten_mode`` when a
    fallback fired) — a checkpoint must never lie about its own domain
    (VERDICT r3 weak-point 1)."""
    d = dataclasses.asdict(cfg)
    d.update({
        "whiten_mode_resolved": whiten_mode_resolved,
        # sampling rate of the training data: a serving/ingest host must
        # prepare measurements at the SAME fs (16 kHz checkpoints would
        # otherwise inherit a silent 4096 default)
        "fs": float(data_fs),
        "conditional": True,
        "in_ch": in_ch,
        "cond_in_ch": cond_in_ch,
        "meta_enabled": c_meta > 0,
        "meta_channels": c_meta,
        "conditioning": ("concat[y + meta]+selfcond" if c_meta > 0
                         else "concat[y]+selfcond"),
        "dropout_y_only": bool(cfg.dropout_y_only),
        "meta_scale": meta_scale,
    })
    return d


def train(cfg: TrainConfig, dataset=None, mesh=None) -> Dict[str, Any]:
    """Full training run; returns dict with final state + paths + history.

    ``dataset``: optionally a pre-built ``PreparedDataset`` (tests / synthetic
    data); otherwise loaded from ``cfg.data``.
    """
    from ..data import pipeline as dpipe
    from ..data.hdf5io import compute_meta_scale
    from ..parallel import mesh as pmesh

    # multi-host pods: no-op unless coordinator env vars are present, so the
    # same entry point serves dev boxes and pod slices (SURVEY.md §5.8)
    pmesh.multihost_init()

    t_run0 = time.time()
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    # read the resume payload BEFORE the output-dir wipe so resuming from a
    # checkpoint inside model_dir/latest_model is safe
    ck_resume = load_checkpoint(cfg.resume) if cfg.resume else None
    out_dir = prepare_output_dir(cfg.model_dir)
    logger = JsonlLogger(cfg.log_jsonl)

    if dataset is None:
        if cfg.data.startswith("synth:"):
            # self-contained on-device synthesis: --data synth:<N>
            n_synth = int(cfg.data.split(":", 1)[1])
            print(f"[train] synthesising {n_synth} samples on device")
            dataset = dpipe.synthetic_dataset(
                n_synth, seed=cfg.seed, whiten=cfg.whiten,
                sigma_mode=cfg.sigma_mode)
        elif cfg.streaming:
            if cfg.max_len:
                raise ValueError(
                    "--max-len is only supported by the non-streaming loader")
            meta_scale = compute_meta_scale(cfg.data)
            dataset = dpipe.StreamingDataset(
                cfg.data, whiten=cfg.whiten, whiten_mode=cfg.whiten_mode,
                sigma_mode=cfg.sigma_mode, sigma_fixed=cfg.sigma_fixed,
                include_metadata=True, mass_scale=meta_scale.get("M", 80.0),
                chunk=cfg.stream_chunk,
            )
        else:
            meta_scale = compute_meta_scale(cfg.data)
            dataset = dpipe.prepare_dataset(
                cfg.data, whiten=cfg.whiten, whiten_mode=cfg.whiten_mode,
                sigma_mode=cfg.sigma_mode, sigma_fixed=cfg.sigma_fixed,
                include_metadata=True, mass_scale=meta_scale.get("M", 80.0),
                max_len=cfg.max_len or None,
            )
    meta_scale = dataset.meta_scale
    # actual whitening domain the pipeline used (never trust the request —
    # VERDICT r3 weak-point 1); synthetic/array datasets predate the field
    wm_resolved = getattr(dataset, "whiten_mode_resolved",
                          "train" if cfg.whiten else "none")
    data_fs = float(getattr(dataset, "fs", 0.0))

    c_meta = dpipe.meta_dim(dataset)
    n_batches = dpipe.num_batches(dataset, cfg.batch_size)
    total_steps = n_batches * cfg.epochs

    key, k_init = jax.random.split(key)
    model, schedule, optimizer, lr_sched, state, (in_ch, cond_in_ch) = (
        build_model_and_state(cfg, c_meta, dataset.bucket_lengths[0],
                              total_steps, k_init))
    print(f"[train] dataset n={dataset.n} buckets={dataset.bucket_lengths} "
          f"meta_scale={meta_scale}")
    print(f"[train] C_meta={c_meta} cond_in_ch={cond_in_ch} in_ch={in_ch} "
          f"batches/epoch={n_batches} devices={len(jax.devices())}")

    # analytic MFU accounting (utils/roofline.py; validated 98% vs XLA cost
    # analysis): fwd + ~2x bwd + an extra selfcond forward on p_selfcond of
    # the steps
    from ..utils.roofline import peak_for, unet_flops_per_sample
    _fwd_flops = unet_flops_per_sample(
        dataset.bucket_lengths[0], in_ch, cfg.base_ch, cfg.depth,
        cond_ch=cond_in_ch, use_attention=cfg.use_attention)
    _train_flops_per_sample = (3.0 + float(cfg.p_selfcond)) * _fwd_flops
    _peak = peak_for(jax.devices()[0].device_kind)

    step_fn = make_train_step(model, schedule, cfg, optimizer, lr_sched)
    probe_fn = make_probe_fn(model, schedule, cfg) if cfg.probe_cond else None
    debug_x0_fn = None   # built lazily on the first debug-enabled batch

    start_epoch = 1
    if ck_resume is not None:
        ck = ck_resume
        # exact step restore (falls back to epoch*n_batches for pre-r2
        # checkpoints) — reconstruction from epoch silently misaligns the
        # LR schedule when batch size or dataset changed between runs
        step_restored = int(ck.get("global_step",
                                   int(ck.get("epoch", 0)) * n_batches))
        state = TrainState(
            params=restore_params(state.params, ck["model_state"]),
            ema_params=(restore_params(state.ema_params, ck["model_ema_state"])
                        if "model_ema_state" in ck else state.ema_params),
            opt_state=(restore_params(state.opt_state, ck["optimizer_state"])
                       if "optimizer_state" in ck else state.opt_state),
            step=jnp.asarray(step_restored, jnp.int32),
        )
        if "rng_key" in ck:
            key = jnp.asarray(np.asarray(ck["rng_key"], np.uint32))
        start_epoch = int(ck.get("epoch", 0)) + 1
        print(f"[train] resumed from {cfg.resume} at epoch {start_epoch} "
              f"(global step {step_restored})")

    want_mesh = cfg.data_parallel or int(cfg.tp) > 1
    if mesh is None and want_mesh and len(jax.devices()) > 1:
        n_model = max(1, int(cfg.tp))
        # respect an explicit --no-data-parallel: leftover devices must NOT
        # silently re-enable a data axis the user disabled
        n_data = (max(1, len(jax.devices()) // n_model)
                  if cfg.data_parallel else 1)
        if n_model > len(jax.devices()):
            raise ValueError(
                f"--tp {cfg.tp} requested but only {len(jax.devices())} "
                f"devices are visible")
        if cfg.batch_size % n_data == 0:
            mesh = pmesh.make_mesh(n_data=n_data, n_model=n_model)
        else:
            dropped = (f" (and the requested --tp {cfg.tp} tensor "
                       f"parallelism)" if n_model > 1 else "")
            print(f"[train] batch_size={cfg.batch_size} not divisible by "
                  f"{n_data} data-parallel devices; running without "
                  f"sharding{dropped}")
    elif mesh is None and int(cfg.tp) > 1:
        # tp requested but unsatisfiable (single device) — say so instead
        # of silently running unsharded (ADVICE r2)
        print(f"[train] --tp {cfg.tp} requested but only "
              f"{len(jax.devices())} device(s) visible; tensor parallelism "
              f"dropped")
    if mesh is not None:
        tp_on = "model" in mesh.shape and mesh.shape["model"] > 1
        state = TrainState(
            params=pmesh.shard_params_tp(state.params, mesh),
            ema_params=pmesh.shard_params_tp(state.ema_params, mesh),
            # optimizer state stays replicated: adamw's mu/nu mirror the
            # params and XLA re-shards them after the first update; scalars
            # (count) must be replicated anyway
            opt_state=pmesh.replicate_tree(state.opt_state, mesh),
            step=state.step)
        print(f"[train] mesh {dict(mesh.shape)}"
              + (" (tensor-parallel conv channels)" if tp_on else ""))

    if cfg.t_min_frac > 0:
        # reference default is 0.5 (train.py:651) — kept for flag parity,
        # but it means the model never trains on t < t_min_frac*T, so a
        # full DDIM trajectory from pure noise will traverse UNTRAINED
        # timesteps and produce garbage.  Verified empirically; see README.
        print(f"[train] WARNING: t_min_frac={cfg.t_min_frac} — timesteps "
              f"t < {int(cfg.t_min_frac * cfg.T)} will be untrained; "
              f"full-range sampling from noise requires t_min_frac=0")

    dev_buckets = None
    if cfg.device_data and not cfg.streaming:
        # on a mesh, upload row-sharded: each device holds 1/n_data of the
        # dataset (pod-viable input path) and epoch tensors land pre-sharded
        dev_buckets = dpipe.upload_buckets(
            dataset,
            sharding=pmesh.batch_sharding(mesh) if mesh is not None else None)
        if dev_buckets is not None:
            mb = sum(v.nbytes for b in dev_buckets.values()
                     for v in b.values()) / 1e6
            print(f"[train] dataset resident on device ({mb:.0f} MB"
                  + (f", row-sharded over {mesh.shape['data']} devices"
                     if mesh is not None else "")
                  + "); on-device batch gather (no per-step H2D)")

    history = []
    global_step = (start_epoch - 1) * n_batches
    profiling = False
    for epoch in range(start_epoch, cfg.epochs + 1):
        t_min_epoch = int(max(0, min(cfg.T - 1, int(cfg.t_min_frac * cfg.T))))
        p_u = 0.0 if epoch <= cfg.force_cond_epochs else cfg.p_uncond
        p_sc = 0.0 if epoch <= cfg.force_cond_epochs else cfg.p_selfcond
        print(f"[train] epoch {epoch}/{cfg.epochs} p_uncond={p_u:.2f} "
              f"p_selfcond={p_sc:.2f} t_min={t_min_epoch}")

        sum_loss_w, sum_w, batch_losses, skipped = 0.0, 0, [], 0
        t_epoch0 = time.time()
        sharding = pmesh.batch_sharding(mesh) if mesh is not None else None
        if dev_buckets is not None:
            batches = dpipe.device_resident_batches(
                dataset, cfg.batch_size, rng, dev_buckets, sharding=sharding)
        elif (cfg.streaming and cfg.device_data
              and hasattr(dataset, "iter_batches_device")):
            # streaming composed with device residency: chunks rotate
            # through an HBM cache, steady-state epochs do zero H2D
            batches = dataset.iter_batches_device(
                cfg.batch_size, rng, sharding=sharding)
        else:
            batches = dpipe.prefetch_to_device(
                dpipe.iterate_batches(dataset, cfg.batch_size, rng),
                size=2, sharding=sharding)
        pending = []   # deferred metric fetch: no per-step host sync
        for i, jb in enumerate(batches):
            if cfg.profile_dir and global_step == cfg.profile_steps[0]:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            key, k_step = jax.random.split(key)
            state, m = step_fn(state, jb, k_step,
                               jnp.asarray(t_min_epoch),
                               jnp.asarray(p_u), jnp.asarray(p_sc))
            # metrics stay on device; ONE device_get at epoch end. A
            # per-batch float() would force a host round trip every step
            # and stall the XLA pipeline (the reference pays this price
            # via its per-batch .item() calls, train.py:464-478).
            pending.append((global_step, i, m))
            global_step += 1
            if profiling and global_step >= cfg.profile_steps[1]:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                profiling = False
                print(f"[train] profiler trace -> {cfg.profile_dir}")

            if probe_fn is not None and (i % max(1, cfg.probe_interval) == 0):
                sigma_ = jb["sigma"].reshape(-1, 1, 1)
                c0 = (jb["clean"] / sigma_)[:1]
                y0 = (jb["noisy"] / sigma_)[:1]
                meta0 = _broadcast_meta(jb.get("meta"), c0.shape[-1])
                meta0 = meta0[:1] if meta0 is not None else None
                for t_pick in cfg.probe_t:
                    key, k_p = jax.random.split(key)
                    pm = probe_fn(state.params, c0, y0, meta0,
                                  int(np.clip(t_pick, 0, cfg.T - 1)), k_p)
                    logger.log({"phase": "probe", "epoch": epoch, "batch": i,
                                "t": int(t_pick),
                                **{k: float(v) for k, v in pm.items()}})

            if cfg.debug_first and i == 0 and (
                    epoch == 1 or (cfg.debug_first_every
                                   and epoch % cfg.debug_first_every == 0)):
                if debug_x0_fn is None:
                    debug_x0_fn = make_debug_x0_fn(model, schedule, cfg)
                key, k_dbg = jax.random.split(key)
                x0m = debug_x0_fn(state.params, jb["clean"], jb["noisy"],
                                  jb["sigma"], jb["mask"], jb.get("meta"),
                                  cfg.T // 2, k_dbg)
                _first_batch_debug(jb, m, out_dir, epoch, x0m)

        # drain the deferred metrics (single host sync per epoch)
        fetched = jax.device_get([p[2] for p in pending])
        for (gs, i, _), m in zip(pending, fetched):
            loss = float(m["loss"])
            if not bool(m["ok"]):
                skipped += 1
                print(f"[warn] batch {i} skipped (loss={loss:.3e})")
            else:
                bsz_eff = int(m["bsz_eff"])
                batch_losses.append(loss)
                sum_loss_w += loss * bsz_eff
                sum_w += bsz_eff
            logger.log({
                "phase": "train_batch", "step": gs, "epoch": epoch,
                "batch": i, "t_min": int(m["t_min"]),
                "t_mean": float(m["t_mean"]), "t_max": int(m["t_max"]),
                "loss": loss, "grad_norm": float(m["grad_norm"]),
                "lr": float(m["lr"]),
            })

        # failure detection (SURVEY.md §5.3: the reference only skips bad
        # batches silently): a majority-skipped epoch means training has
        # diverged or the data is broken — stop instead of burning compute.
        n_seen = len(batch_losses) + skipped
        if cfg.skip_bad_batches and n_seen >= 4 and skipped > n_seen // 2:
            _save(out_dir, state, cfg, in_ch, cond_in_ch, c_meta, meta_scale,
                  epoch, name="model_diffusion_aborted.msgpack", key=key,
                  whiten_mode_resolved=wm_resolved, data_fs=data_fs)
            raise RuntimeError(
                f"epoch {epoch}: {skipped}/{n_seen} batches skipped "
                f"(non-finite or above loss threshold) — aborting; last "
                f"state saved to model_diffusion_aborted.msgpack")

        avg = sum_loss_w / max(1, sum_w)
        mean_b = float(np.mean(batch_losses)) if batch_losses else float("nan")
        med_b = float(np.median(batch_losses)) if batch_losses else float("nan")
        # throughput counters (SURVEY.md §5.1 / BASELINE metric family)
        dt_epoch = max(1e-9, time.time() - t_epoch0)
        steps_per_s = n_batches / dt_epoch
        samples_per_s = steps_per_s * cfg.batch_size
        n_dev = max(1, len(jax.devices()))
        mfu_est = (_train_flops_per_sample * samples_per_s / n_dev / _peak[0]
                   if _peak else None)
        print(f"[train] epoch {epoch}: avg/sample={avg:.6f} mean/batch={mean_b:.6f} "
              f"median/batch={med_b:.6f} skipped={skipped} "
              f"({steps_per_s:.2f} steps/s, {samples_per_s:.1f} samples/s, "
              f"{samples_per_s / n_dev:.1f} samples/s/chip"
              + (f", MFU~{mfu_est:.3f}" if mfu_est is not None else "") + ")")
        logger.log({"phase": "epoch_end", "epoch": epoch, "avg_per_sample": avg,
                    "mean_per_batch": mean_b, "median_per_batch": med_b,
                    "skipped_batches": skipped,
                    "steps_per_sec": steps_per_s,
                    "samples_per_sec": samples_per_s,
                    "samples_per_sec_per_chip": samples_per_s / n_dev,
                    "mfu_est": mfu_est,
                    "elapsed_s": time.time() - t_run0})
        history.append({"epoch": epoch, "avg_per_sample": avg})

        if cfg.save_every_epochs and epoch % cfg.save_every_epochs == 0:
            _save(out_dir, state, cfg, in_ch, cond_in_ch, c_meta, meta_scale, epoch,
                  name=f"model_diffusion_ep{epoch}.msgpack", key=key,
                  whiten_mode_resolved=wm_resolved, data_fs=data_fs)

    save_path = _save(out_dir, state, cfg, in_ch, cond_in_ch, c_meta, meta_scale,
                      cfg.epochs, key=key, whiten_mode_resolved=wm_resolved,
                      data_fs=data_fs)
    print(f"[train] saved model to {save_path}")
    return {
        "state": state, "model": model, "schedule": schedule,
        "checkpoint": save_path, "history": history, "out_dir": out_dir,
        "in_ch": in_ch, "cond_in_ch": cond_in_ch,
    }


def _save(out_dir, state: TrainState, cfg, in_ch, cond_in_ch, c_meta, meta_scale,
          epoch, name="model_diffusion.msgpack", key=None,
          whiten_mode_resolved: str = "", data_fs: float = 0.0):
    path = os.path.join(out_dir, name)
    save_checkpoint(
        path,
        model_state=state.params,
        args=checkpoint_args(cfg, in_ch, cond_in_ch, c_meta, meta_scale,
                             whiten_mode_resolved=whiten_mode_resolved,
                             data_fs=data_fs),
        epoch=epoch,
        model_ema_state=state.ema_params if cfg.ema else None,
        opt_state=state.opt_state,
        global_step=int(np.asarray(state.step)),
        rng_key=np.asarray(key) if key is not None else None,
    )
    return path


def _first_batch_debug(jb, metrics, out_dir, epoch, x0m=None):
    """First-batch deep stats + one-step-x0 quality + npy dumps
    (ref ``train.py:524-585``)."""
    def stats(name, a):
        a = np.asarray(a, np.float64)
        print(f"[DEBUG] {name}: min={a.min():.3e} max={a.max():.3e} "
              f"mean={a.mean():.3e} std={a.std():.3e}")

    sigma = np.asarray(jb["sigma"])
    print(f"[DEBUG] sigma[min/mean/max]={sigma.min():.3e}/{sigma.mean():.3e}/"
          f"{sigma.max():.3e}")
    stats("clean", jb["clean"])
    stats("noisy", jb["noisy"])
    if x0m is not None:
        x0m = {k: np.asarray(v) for k, v in x0m.items()}
        print(f"[DEBUG] valid_frac={float(x0m['valid_frac']):.3f} , "
              f"corr_masked(x0_norm, clean_norm)="
              f"{float(x0m['corr_x0_norm']):.3f} "
              f"corr_masked(x0, clean)={float(x0m['corr_x0_white']):.3f} , "
              f"MSE_masked_norm={float(x0m['mse_x0_norm']):.3e} , "
              f"MSE_masked_white={float(x0m['mse_x0_white']):.3e}")
    if epoch == 1:
        try:
            dbg = os.path.join(out_dir, "debug_batch0")
            os.makedirs(dbg, exist_ok=True)
            np.save(os.path.join(dbg, "clean_raw.npy"),
                    np.asarray(jb["clean"][0]).ravel())
            np.save(os.path.join(dbg, "y_norm.npy"),
                    (np.asarray(jb["noisy"][0]) / max(sigma[0], 1e-30)).ravel())
            if x0m is not None:
                np.save(os.path.join(dbg, "x0_hat.npy"),
                        x0m["x0_hat_sample0"].ravel())
            print(f"[DEBUG] wrote debug npys -> {dbg}")
        except Exception as e:
            print("[DEBUG] npy-dump skipped:", e)
