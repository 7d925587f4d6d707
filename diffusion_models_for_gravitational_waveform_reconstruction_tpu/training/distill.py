"""Progressive distillation: halve sampler steps, keep quality.

Salimans & Ho, "Progressive Distillation for Fast Sampling of Diffusion
Models" (ICLR 2022), adapted to this framework's conditional denoiser.  The
reference framework has no counterpart — its recipe is a 200-step DDIM loop
per sample (``/root/reference/src/snr_denoising/inference.py:374-514``); a
distilled student reconstructs with 4-8 single-forward steps, a 50-400x
inference-compute reduction (CFG is folded into the student, halving model
calls again).

Method per stage (teacher with N-step ladder -> student with N/2):

1. draw ``x_t = q_sample(x0, t_i)`` at a random student-ladder time ``t_i``
   (data-space sampling as in the paper, Sec. 3);
2. run the TEACHER two deterministic DDIM sub-steps ``t_i -> t_mid ->
   t_next`` with classifier-free guidance FOLDED in at fixed weight ``w``
   (out = (1-w) out_u + w out_c) and deployment clamps applied — the student
   learns the *deployed* teacher trajectory map, not the raw network;
3. solve the one-step DDIM update for the x0 the student must predict to
   land exactly on the teacher's endpoint:
       x0_tgt = (sb_i * x'' - sb_n * x_t) / (sa_n * sb_i - sb_n * sa_i)
   with sa = sqrt(alpha_bar), sb = sqrt(1 - alpha_bar) at (i = t_i,
   n = t_next); ``t_next`` past the ladder end means alpha_bar = 1 and the
   formula degenerates to x0_tgt = x'' exactly;
4. regress the student's x0 estimate on x0_tgt with the paper's truncated-
   SNR weighting max(alpha_bar/(1-alpha_bar), 1), masked to valid samples.

Self-conditioning: both teacher and student run with a ZERO self-cond
channel (the architecture keeps the input channel; distilled checkpoints
record ``selfcond_mode='zero'`` and the samplers honour it).  Stages chain:
the stage-k student becomes the stage-k+1 teacher.  Checkpoints carry
``distilled_steps`` / ``distilled_cfg_scale`` / ``distilled_ladder`` so
``gw-infer``/``gw-grid`` pick deployment knobs automatically.

TPU-first: one jitted step contains teacher rollout + target algebra +
student update (3 forwards total, one XLA program); per-item ladder indices
are a gather, not control flow; the epoch loop reuses the device-resident
batch path (zero per-step H2D).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.schedules import (
    DiffusionSchedule,
    build_lambda_t_schedule,
    build_t_schedule,
    make_schedule,
)
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.jsonl import JsonlLogger
from .train import TrainState, _broadcast_meta


@dataclasses.dataclass
class DistillConfig:
    """Distillation run parameters (everything else inherits from the
    teacher checkpoint's args contract)."""

    teacher: str                       # checkpoint path (.msgpack or .pth)
    data: str                          # HDF5 dataset (same domain as teacher)
    model_dir: str = "distilled"
    # halving chain: first entry = the TEACHER's sampling steps for stage 1;
    # each subsequent entry is a student. [64, 32, 16, 8, 4] runs 4 stages.
    steps_schedule: Optional[List[int]] = None
    epochs_per_stage: int = 4
    batch_size: int = 64
    lr: float = 1e-4
    weight_decay: float = 0.0
    clip_grad: float = 1.0
    cfg_scale: float = 1.5             # guidance folded into the student
    ladder: str = "lambda"             # deployment ladder family
    start_t: Optional[int] = 999       # top-of-chain (full-range sampling)
    ema: bool = True
    ema_decay: float = 0.999
    seed: int = 42
    device_data: bool = True
    log_jsonl: Optional[str] = None
    save_every_stage: bool = True

    def __post_init__(self):
        if self.steps_schedule is None:
            self.steps_schedule = [64, 32, 16, 8, 4]


def _teacher_ladder(schedule: DiffusionSchedule, n_student: int, ladder: str,
                    start_t: Optional[int]) -> np.ndarray:
    """Teacher ladder = the student's DEPLOYMENT ladder interleaved with
    lambda-midpoints (length exactly 2x the student's).

    Built from the same ``build_*_t_schedule`` the samplers use, so the
    distillation grid and the deployed sampling grid are identical by
    construction — a regridded student would be trained for step sizes it
    never sees at inference.  The final segment ends on the virtual
    alpha_bar=1 point (the samplers' last-step convention); its midpoint is
    taken halfway to t=0 on the integer grid.
    """
    if ladder == "lambda":
        stud = build_lambda_t_schedule(schedule, n_student, start_t)
    else:
        stud = build_t_schedule(schedule.T, n_student, start_t)
    stud = np.asarray(stud, np.int64)
    ab = np.asarray(schedule.alpha_bar, np.float64).clip(1e-12, 1 - 1e-12)
    lam = 0.5 * (np.log(ab) - np.log1p(-ab))
    s = int(stud[0])
    rev_lam = lam[s::-1]
    rev_t = np.arange(s, -1, -1, dtype=np.float64)
    out = []
    for i, t_i in enumerate(stud):
        out.append(int(t_i))
        if i + 1 < len(stud):
            mid_lam = 0.5 * (lam[t_i] + lam[stud[i + 1]])
            t_mid = int(round(float(np.interp(mid_lam, rev_lam, rev_t))))
            out.append(int(np.clip(t_mid, stud[i + 1], t_i)))
        else:
            out.append(int(t_i) // 2)
    return np.asarray(out, np.int64)


def make_distill_step(model, schedule: DiffusionSchedule, cfg: DistillConfig,
                      optimizer, teacher_ladder: np.ndarray, pred_type: str,
                      clamp_inputs: float = 10.0, x0_clip: float = 10.0):
    """Jitted distillation step over a fixed teacher ladder of 2N entries.

    ``teacher_ladder``: descending timestep array, length 2N.  Returns
    step(state, teacher_params, batch, key) -> (state, metrics).
    """
    tl = np.asarray(teacher_ladder, np.int64)
    n2 = len(tl)
    assert n2 % 2 == 0, "teacher ladder length must be even (2x student)"
    n_student = n2 // 2
    ab_np = np.asarray(schedule.alpha_bar, np.float64).clip(1e-12, 1.0)
    # alpha_bar along the ladder, with the virtual final point ab=1
    ab_ext = np.concatenate([ab_np[tl], [1.0]]).astype(np.float32)
    w = float(cfg.cfg_scale)
    # a duplicate-collapsed segment (tiny T grids) has no usable DDIM
    # inversion — zero its loss weight instead of dividing by ~0
    seg_valid = (ab_ext[2::2][:n_student]
                 - ab_ext[0:-1:2][:n_student]) > 1e-5

    ts_j = jnp.asarray(tl, jnp.int32)            # (2N,)
    ab_j = jnp.asarray(ab_ext, jnp.float32)      # (2N+1,)
    valid_j = jnp.asarray(seg_valid, jnp.float32)  # (N,)

    def x0_eps(out, x_t, ab):
        sa = jnp.sqrt(ab)
        sb = jnp.sqrt(jnp.clip(1.0 - ab, 0.0))
        if pred_type == "v":
            x0 = sa * x_t - sb * out
            eps = sb * x_t + sa * out
        else:                                    # eps-prediction
            eps = out
            x0 = (x_t - sb * eps) / jnp.maximum(sa, 1e-6)
        return x0, eps

    def teacher_fwd(tp, x_t, t_b, cond_c, cond_u, sc):
        """Deployed-teacher forward: folded CFG + deployment clamps."""
        if clamp_inputs > 0:
            x_t = jnp.clip(x_t, -clamp_inputs, clamp_inputs)
        B = x_t.shape[0]
        net_c = jnp.concatenate([x_t, cond_c, sc], axis=1)
        if w != 1.0:
            net_u = jnp.concatenate([x_t, cond_u, sc], axis=1)
            out2 = model.apply(tp, jnp.concatenate([net_c, net_u], axis=0),
                               jnp.concatenate([t_b, t_b], axis=0))
            out = w * out2[:B] + (1.0 - w) * out2[B:]
        else:
            out = model.apply(tp, net_c, t_b)
        return out

    def step(state: TrainState, teacher_params, batch, key):
        clean = batch["clean"].astype(jnp.float32)
        noisy = batch["noisy"].astype(jnp.float32)
        sigma = batch["sigma"].astype(jnp.float32).reshape(-1, 1, 1)
        mask = batch["mask"].astype(jnp.float32)
        meta = batch.get("meta")
        B, _, L = clean.shape

        clean_n = jnp.clip(clean / sigma, -clamp_inputs, clamp_inputs)
        y_n = jnp.clip(noisy / sigma, -clamp_inputs, clamp_inputs)
        meta_bc = _broadcast_meta(meta, L) if meta is not None else None
        cond_c = (jnp.concatenate([y_n, meta_bc], axis=1)
                  if meta_bc is not None else y_n)
        # folded-CFG unconditional stack: y dropped, metadata kept
        # (drop_y_only convention, ops/sampling._make_uncond)
        cond_u = (jnp.concatenate([jnp.zeros_like(y_n), meta_bc], axis=1)
                  if meta_bc is not None else jnp.zeros_like(y_n))
        sc = jnp.zeros_like(clean_n)

        k_j, k_q = jax.random.split(key)
        # per-item student segment j: step from ladder[2j] to ladder[2j+2]
        j = jax.random.randint(k_j, (B,), 0, n_student)
        t_in = ts_j[2 * j]                                   # (B,)
        t_mid = ts_j[2 * j + 1]
        ab_in = ab_j[2 * j].reshape(-1, 1, 1)
        ab_mid = ab_j[2 * j + 1].reshape(-1, 1, 1)
        ab_out = ab_j[2 * j + 2].reshape(-1, 1, 1)

        eps0 = jax.random.normal(k_q, clean_n.shape, clean_n.dtype)
        x_t = jnp.sqrt(ab_in) * clean_n + jnp.sqrt(1.0 - ab_in) * eps0

        # --- teacher: two deterministic DDIM sub-steps (no grad) ---
        out1 = teacher_fwd(teacher_params, x_t, t_in, cond_c, cond_u, sc)
        x0_1, eps_1 = x0_eps(out1, x_t, ab_in)
        if x0_clip > 0:
            x0_1 = jnp.clip(x0_1, -x0_clip, x0_clip)
        x_mid = (jnp.sqrt(ab_mid) * x0_1
                 + jnp.sqrt(jnp.clip(1.0 - ab_mid, 0.0)) * eps_1)

        out2 = teacher_fwd(teacher_params, x_mid, t_mid, cond_c, cond_u, sc)
        x0_2, eps_2 = x0_eps(out2, x_mid, ab_mid)
        if x0_clip > 0:
            x0_2 = jnp.clip(x0_2, -x0_clip, x0_clip)
        x_out = (jnp.sqrt(ab_out) * x0_2
                 + jnp.sqrt(jnp.clip(1.0 - ab_out, 0.0)) * eps_2)

        # --- one-step student target (exact DDIM inversion) ---
        sa_i = jnp.sqrt(ab_in)
        sb_i = jnp.sqrt(jnp.clip(1.0 - ab_in, 0.0))
        sa_n = jnp.sqrt(ab_out)
        sb_n = jnp.sqrt(jnp.clip(1.0 - ab_out, 0.0))
        denom = sa_n * sb_i - sb_n * sa_i         # > 0: ab_out > ab_in
        x0_tgt = jax.lax.stop_gradient(
            (sb_i * x_out - sb_n * x_t) / jnp.maximum(denom, 1e-6))

        # truncated-SNR loss weight (Salimans & Ho Sec. 4, 'SNR+1'-trunc),
        # zeroed on degenerate (duplicate-collapsed) segments
        w_t = (jnp.maximum(ab_in / jnp.clip(1.0 - ab_in, 1e-6), 1.0)
               * valid_j[j].reshape(-1, 1, 1))

        def loss_fn(params):
            net_in = jnp.concatenate([x_t, cond_c, sc], axis=1)
            out_s = model.apply(params, net_in, t_in)
            x0_s, _ = x0_eps(out_s, x_t, ab_in)
            se = (x0_s - x0_tgt) ** 2 * mask * w_t
            return se.sum() / jnp.maximum(mask.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        if cfg.ema:
            d = cfg.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p,
                state.ema_params, new_params)
        else:
            new_ema = state.ema_params

        ok = jnp.isfinite(loss) & jnp.all(jnp.isfinite(grad_norm))

        def sel(new, old):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old)

        new_state = TrainState(
            params=sel(new_params, state.params),
            ema_params=sel(new_ema, state.ema_params),
            opt_state=sel(new_opt, state.opt_state),
            step=state.step + ok.astype(jnp.int32),
        )
        return new_state, {"loss": loss, "grad_norm": grad_norm, "ok": ok}

    return jax.jit(step, donate_argnums=(0,))


def distill(cfg: DistillConfig, dataset=None) -> Dict[str, Any]:
    """Run the progressive-distillation stage chain; returns paths + history.

    The student inherits the teacher's architecture and domain contract
    (whiten/sigma/meta/pred_type); each stage halves the sampler steps.
    """
    from ..data import pipeline as dpipe
    from ..inference import load_model

    model, teacher_params, schedule, ck = load_model(cfg.teacher,
                                                     use_ema=True)
    pred_type = str(ck.get("pred_type", "eps"))
    os.makedirs(cfg.model_dir, exist_ok=True)
    logger = JsonlLogger(cfg.log_jsonl)

    if dataset is None:
        from ..data.hdf5io import compute_meta_scale
        meta_scale = compute_meta_scale(cfg.data)
        dataset = dpipe.prepare_dataset(
            cfg.data,
            whiten=bool(ck.get("whiten", 0)),
            # the teacher's RESOLVED training domain, not its request — a
            # pre-r4 teacher whose PSD fallback fired would otherwise have
            # its student distilled in a different whitening domain
            whiten_mode=(str(ck["whiten_mode_resolved"])
                         if ck.get("whiten_mode_resolved")
                         in ("model", "welch", "train")
                         else str(ck.get("whiten_mode", "auto"))),
            sigma_mode=str(ck.get("sigma_mode", "std")),
            sigma_fixed=float(ck.get("sigma_fixed", 1.0)),
            include_metadata=bool(ck.get("meta_enabled", True)),
            mass_scale=float(ck.get("meta_scale", {}).get("M", 80.0)),
        )
    n_batches = dpipe.num_batches(dataset, cfg.batch_size)

    dev_buckets = (dpipe.upload_buckets(dataset)
                   if cfg.device_data else None)

    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    chain = list(cfg.steps_schedule)
    if len(chain) < 2:
        raise ValueError("steps_schedule needs >= 2 entries (teacher, "
                         "student, ...)")
    for a, b in zip(chain, chain[1:]):
        if a != 2 * b:
            raise ValueError(f"steps_schedule must halve: {a} -> {b}")

    history = []
    stage_paths = []
    cur_teacher = teacher_params
    for stage, (n_teach, n_stud) in enumerate(zip(chain, chain[1:]), 1):
        t_ladder = _teacher_ladder(schedule, n_stud, cfg.ladder, cfg.start_t)
        total = n_batches * cfg.epochs_per_stage
        optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.clip_grad),
            optax.adamw(optax.warmup_cosine_decay_schedule(
                0.0, cfg.lr, min(100, max(1, total // 20)), total,
                cfg.lr * 0.1), weight_decay=cfg.weight_decay),
        )
        # student initialised FROM its teacher (paper Sec. 3)
        state = TrainState(
            params=jax.tree_util.tree_map(jnp.copy, cur_teacher),
            ema_params=jax.tree_util.tree_map(jnp.copy, cur_teacher),
            opt_state=optimizer.init(cur_teacher),
            step=jnp.zeros((), jnp.int32),
        )
        step_fn = make_distill_step(
            model, schedule, cfg, optimizer, t_ladder, pred_type,
            clamp_inputs=float(ck.get("clamp_inputs", 10.0)))

        print(f"[distill] stage {stage}: {n_teach} -> {n_stud} steps, "
              f"{cfg.epochs_per_stage} epochs x {n_batches} batches")
        for epoch in range(1, cfg.epochs_per_stage + 1):
            t0 = time.time()
            if dev_buckets is not None:
                batches = dpipe.device_resident_batches(
                    dataset, cfg.batch_size, rng, dev_buckets)
            else:
                batches = dpipe.prefetch_to_device(
                    dpipe.iterate_batches(dataset, cfg.batch_size, rng),
                    size=2)
            pending = []
            for jb in batches:
                key, k = jax.random.split(key)
                state, m = step_fn(state, cur_teacher, jb, k)
                pending.append(m)
            fetched = jax.device_get(pending)
            losses = [float(m["loss"]) for m in fetched if bool(m["ok"])]
            avg = float(np.mean(losses)) if losses else float("nan")
            dt = time.time() - t0
            print(f"[distill] stage {stage} epoch {epoch}: loss={avg:.6f} "
                  f"({n_batches / max(dt, 1e-9):.1f} steps/s)")
            logger.log({"phase": "distill_epoch", "stage": stage,
                        "teacher_steps": n_teach, "student_steps": n_stud,
                        "epoch": epoch, "loss": avg,
                        "steps_per_sec": n_batches / max(dt, 1e-9)})
            history.append({"stage": stage, "epoch": epoch, "loss": avg})

        # save the stage checkpoint with deployment metadata
        args = dict(ck)
        args.update({
            "distilled_steps": n_stud,
            "distilled_cfg_scale": cfg.cfg_scale,
            "distilled_ladder": cfg.ladder,
            "distilled_start_t": cfg.start_t,
            "selfcond_mode": "zero",
            "distilled_from": cfg.teacher,
            "distill_stage": stage,
        })
        path = os.path.join(cfg.model_dir,
                            f"model_distilled_{n_stud}step.msgpack")
        save_checkpoint(
            path,
            model_state=state.params,
            args=args,
            epoch=cfg.epochs_per_stage,
            model_ema_state=state.ema_params if cfg.ema else None,
            global_step=int(np.asarray(state.step)),
        )
        stage_paths.append(path)
        print(f"[distill] stage {stage} saved -> {path}")
        # EMA student becomes the next teacher
        cur_teacher = state.ema_params if cfg.ema else state.params

    return {"checkpoints": stage_paths, "history": history,
            "model": model, "schedule": schedule, "args": ck}
