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


def select_weights(ckpt: Dict[str, Any], use_ema: bool = True):
    """EMA-preferred weight selection (ref ``train.py:258-262``,
    ``inference.py:641-650``)."""
    if use_ema and "model_ema_state" in ckpt:
        return ckpt["model_ema_state"], True
    return ckpt["model_state"], False
