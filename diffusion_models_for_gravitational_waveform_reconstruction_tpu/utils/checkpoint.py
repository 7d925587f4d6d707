"""Checkpoint save/load with the reference's metadata contract.

The reference writes a single torch ``.pth`` payload at the end of training
(``/root/reference/src/snr_denoising/train.py:606-630``) with keys
``model_state``, optional ``model_ema_state``, ``optimizer_state``, ``epoch``
and an ``args`` dict carrying the architecture + conditioning + data-domain
flags + dataset-adaptive ``meta_scale`` so inference can rebuild the model
with no CLI flags (``inference.py:614-638``).

This module keeps exactly that contract but serialises JAX pytrees with
flax's msgpack (no pickle, no torch).  Improvements over the reference
(SURVEY.md §5.3-4): periodic mid-training saves + resume are supported by the
trainer, not just a single end-of-run save.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    import jax

    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_checkpoint(
    path: str,
    model_state,
    args: Dict[str, Any],
    epoch: int,
    model_ema_state=None,
    opt_state=None,
    global_step: int | None = None,
    rng_key=None,
) -> None:
    """Write the checkpoint payload to ``path`` (msgpack).

    ``args`` must be JSON-serialisable; it lands both inside the msgpack and
    in a human-readable ``<path>.args.json`` sidecar.  ``global_step`` and
    ``rng_key`` (host PRNG key) let ``--resume`` continue the LR schedule and
    randomness exactly, instead of reconstructing step from epoch*n_batches
    (which silently misaligns the LR schedule if batch size or dataset
    changed between runs).
    """
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    payload = {
        "model_state": serialization.to_state_dict(_to_numpy_tree(model_state)),
        "epoch": int(epoch),
        "args_json": json.dumps(args, sort_keys=True, default=str),
    }
    if global_step is not None:
        payload["global_step"] = int(global_step)
    if rng_key is not None:
        payload["rng_key"] = np.asarray(rng_key)
    if model_ema_state is not None:
        payload["model_ema_state"] = serialization.to_state_dict(
            _to_numpy_tree(model_ema_state))
    if opt_state is not None:
        payload["optimizer_state"] = serialization.to_state_dict(
            _to_numpy_tree(opt_state))
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, path)
    with open(path + ".args.json", "w") as fh:
        json.dump(args, fh, indent=2, sort_keys=True, default=str)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load the raw payload; returns dict with 'model_state' (nested dict),
    optional 'model_ema_state'/'optimizer_state', 'epoch', 'args' (dict)."""
    with open(path, "rb") as fh:
        payload = serialization.msgpack_restore(fh.read())
    out = dict(payload)
    out["args"] = json.loads(out.pop("args_json"))
    return out


def restore_params(template, state_dict) -> Any:
    """Rebuild a concrete pytree (e.g. flax params / optax state) from its
    serialised nested-dict form, using ``template`` for structure."""
    return serialization.from_state_dict(template, state_dict)


_ARCH_KEYS = ("base_ch", "in_ch", "cond_in_ch", "T", "schedule", "pred_type",
              "use_attention", "selfcond_mode")


def _weighted_mean_tree(trees, weights):
    """Leaf-wise weighted mean over structurally identical nested dicts.

    Accumulates in float64, casts back to the first tree's leaf dtype."""
    import jax

    tdefs = {jax.tree_util.tree_structure(t) for t in trees}
    if len(tdefs) != 1:
        raise ValueError("checkpoints have different parameter structures")
    w = np.asarray(weights, np.float64)
    w = w / w.sum()

    def avg(*leaves):
        shapes = {np.shape(l) for l in leaves}
        if len(shapes) != 1:
            raise ValueError(f"leaf shape mismatch across members: {shapes}")
        acc = sum(wi * np.asarray(l, np.float64) for wi, l in zip(w, leaves))
        return acc.astype(np.asarray(leaves[0]).dtype)

    return jax.tree_util.tree_map(avg, *trees)


def average_checkpoints(paths, weights=None) -> Dict[str, Any]:
    """Uniform/weighted parameter averaging across checkpoints (model soup,
    Wortsman et al. 2022 — extension; no reference counterpart).

    Averages ``model_state`` and, when ALL members carry one,
    ``model_ema_state``.  Members must share the architecture contract
    (validated on the load-bearing args keys) and the exact parameter tree.
    Returns a payload dict shaped like :func:`load_checkpoint` output, with
    ``args`` taken from the first member plus ``soup_members``/``soup_weights``
    provenance; epoch is the max member epoch.
    """
    if len(paths) < 2:
        raise ValueError("need at least 2 checkpoints to average")
    if weights is None:
        weights = [1.0] * len(paths)
    if len(weights) != len(paths):
        raise ValueError("len(weights) != len(paths)")
    cks = [load_checkpoint(p) for p in paths]
    a0 = cks[0]["args"]
    for p, ck in zip(paths[1:], cks[1:]):
        for k in _ARCH_KEYS:
            if ck["args"].get(k) != a0.get(k):
                raise ValueError(
                    f"{p}: args[{k!r}]={ck['args'].get(k)!r} differs from "
                    f"{paths[0]}: {a0.get(k)!r} — cannot average across "
                    f"architectures/domains")
    out: Dict[str, Any] = {
        "model_state": _weighted_mean_tree(
            [ck["model_state"] for ck in cks], weights),
        "epoch": max(int(ck.get("epoch", 0)) for ck in cks),
    }
    if all("model_ema_state" in ck for ck in cks):
        out["model_ema_state"] = _weighted_mean_tree(
            [ck["model_ema_state"] for ck in cks], weights)
    args = dict(a0)
    args["soup_members"] = [os.path.basename(p) for p in paths]
    args["soup_weights"] = [float(w) for w in weights]
    out["args"] = args
    return out


def select_weights(ckpt: Dict[str, Any], use_ema: bool = True):
    """EMA-preferred weight selection (ref ``train.py:258-262``,
    ``inference.py:641-650``)."""
    if use_ema and "model_ema_state" in ckpt:
        return ckpt["model_ema_state"], True
    return ckpt["model_state"], False
