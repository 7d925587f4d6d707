"""Device mesh construction and sharding helpers.

The reference has NO distributed machinery — single device throughout
(``train.py:219``, ``inference.py:597``; SURVEY.md §2.9).  This module is the
first-class TPU-native equivalent: a ``jax.sharding.Mesh`` over ICI with
named axes, batch sharded over ``data``; gradient all-reduce is inserted by
XLA's SPMD partitioner (GSPMD) from the shardings alone — no NCCL-style
explicit collectives in user code.

Axes:
- ``data``: data parallelism (batch dimension) — the primary axis for this
  model family (small convnet, large batches).
- ``model``: reserved for tensor/sequence sharding of the 16 kHz long-segment
  configs (BASELINE config 4-5); size 1 by default.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def multihost_init() -> None:
    """Initialise JAX distributed for multi-host TPU pods.

    No-op unless the standard coordinator env vars are present, so the same
    entry points work single-host (dev) and multi-host (pods).
    """
    if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the ``data`` axis.  The mesh is laid out so
    that the fast-varying axis maps to physically adjacent devices (ICI
    neighbours) for the ``data`` all-reduce.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devs) // n_model
    assert n_data >= 1 and n_model >= 1, (
        f"mesh {n_data}x{n_model} is empty — n_model={n_model} exceeds the "
        f"{len(devs)} visible devices")
    assert n_data * n_model <= len(devs), (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices but only "
        f"{len(devs)} are visible")
    grid = np.asarray(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the ``data`` axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put every array in the batch with its batch axis sharded over
    ``data`` (per-host input pipelines feed their local shard; single-host
    this scatters)."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def _tp_spec(mesh: Mesh, path, leaf, min_ch: int = 16) -> NamedSharding:
    """Tensor-parallel PartitionSpec for one U-Net param leaf.

    Conv kernels/biases in the encoder/decoder/mid stages are sharded over
    the OUTPUT-channel dimension (their last axis in flax layout) across the
    ``model`` mesh axis; GSPMD then partitions each conv's output channels
    and inserts the boundary collectives.  Small leaves (time-embed MLPs,
    norms, heads below ``min_ch`` channels) stay replicated — sharding them
    would cost more in collectives than it saves.
    """
    n_model = mesh.shape["model"]
    names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
    if (n_model > 1 and leaf.ndim >= 1 and leaf.shape[-1] % n_model == 0
            and leaf.shape[-1] >= min_ch
            and any(n.startswith(("enc", "dec", "mid")) for n in names)
            # norms stay replicated as documented: their scale/bias are tiny
            # and sharding them only buys extra boundary collectives
            and not any("norm" in n.lower() for n in names)):
        return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + ["model"])))
    return NamedSharding(mesh, P())


def shard_params_tp(params, mesh: Mesh, min_ch: int = 16):
    """device_put a params/EMA pytree with the tensor-parallel rule above.

    With ``model`` axis size 1 this degenerates to plain replication, so the
    trainer can call it unconditionally."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(x, _tp_spec(mesh, path, x, min_ch)),
        params)
