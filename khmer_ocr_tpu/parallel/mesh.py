"""Device-mesh parallelism: the framework's distributed layer.

The reference has NO distributed code (SURVEY.md §2.4) — single GPU, single
process. This module *introduces* the scale-out design: a 2-D
``jax.sharding.Mesh`` with a ``data`` axis (batch/data parallelism over ICI —
lines and chunks shard here) and a ``model`` axis (tensor parallelism for the
wide matmuls: FFN hidden, attention heads, vocab projection). Sharding is
expressed as NamedSharding annotations; XLA's GSPMD partitioner inserts the
all-reduce/all-gather collectives over ICI.

For the model sizes involved (384-dim, 124-vocab), ``model=1`` (pure data
parallel) is the performant default; the model axis exists so the same code
scales to larger variants and multi-slice meshes (a ``dcn`` axis can be
prepended without touching call sites).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults: all local devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        assert len(devices) % n_model == 0
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def stacked_batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for a grouped-dispatch stack of K same-shape batches: axis 0 is
    the step axis (replicated — `lax.scan` consumes it sequentially), axis 1 is
    the batch axis (sharded over data). This is what lets grouped multi-step
    training dispatch run under a mesh (train/loop.py): each scanned slice
    keeps its data-axis sharding."""
    assert ndim >= 2, ndim
    return NamedSharding(mesh, P(None, DATA_AXIS, *([None] * (ndim - 2))))


def _spec_for_path(path: str, leaf) -> P:
    """Tensor-parallel placement for a parameter, by its pytree path.

    Sharded over the model axis:
      * encoder/decoder FFN: lin1 out-dim / lin2 in-dim (column/row parallel)
      * attention q/k/v out-dim (head parallel) and o in-dim
      * decoder vocab projection out-dim, token embedding vocab dim
    Everything else (convs, norms, positions, LSTM) is replicated — they are
    small and bandwidth-bound.
    """
    if leaf.ndim < 2:
        return P()
    if ".lin1.w" in path or (".q.w" in path or ".k.w" in path or ".v.w" in path):
        return P(None, MODEL_AXIS)
    if ".lin2.w" in path or ".o.w" in path:
        return P(MODEL_AXIS, None)
    if path.endswith("dec.out.w"):
        return P(None, MODEL_AXIS)
    if path.endswith("dec.tok_emb"):
        return P(MODEL_AXIS, None)
    return P()


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return ".".join(parts)


def param_sharding(mesh: Mesh, params):
    """NamedSharding pytree for the model parameters (TP over the model axis)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(_path_str(path), leaf)), params
    )


def shard_params(mesh: Mesh, params):
    shardings = param_sharding(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
