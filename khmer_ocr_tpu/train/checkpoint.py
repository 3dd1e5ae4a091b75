"""Orbax checkpointing with full resume state.

The reference saves bare ``model.state_dict()`` every 10/20 epochs with no
optimizer state and no resume logic (CNN-Transformer.ipynb [cell 17];
SURVEY.md §5). Here checkpoints carry params + BN stats + optimizer state +
step, plus the ModelConfig as JSON metadata, so training resumes exactly and
inference can reconstruct the model without shape sniffing (though
``convert.detect_model_config`` still handles legacy .pth files).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import numpy as np

from ..config import ModelConfig

_META = "model_config.json"


def _to_numpy_tree(tree):
    return jax.tree.map(np.asarray, tree)


def save_checkpoint(path: str | Path, params, batch_stats, model_cfg: ModelConfig,
                    opt_state=None, step: int | None = None) -> Path:
    """Save via orbax (falls back to npz if orbax is unavailable)."""
    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    payload = {"params": _to_numpy_tree(params), "batch_stats": _to_numpy_tree(batch_stats)}
    if opt_state is not None:
        payload["opt_state"] = _to_numpy_tree(opt_state)
    if step is not None:
        payload["step"] = np.asarray(step)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        target = path / "state"
        if target.exists():
            import shutil

            shutil.rmtree(target)
        ckptr.save(target, payload)
    except ImportError:  # pragma: no cover
        flat, treedef = jax.tree.flatten(payload)
        np.savez(path / "state.npz", treedef=np.frombuffer(str(treedef).encode(), np.uint8),
                 **{f"leaf_{i}": leaf for i, leaf in enumerate(flat)})
    (path / _META).write_text(json.dumps(dataclasses.asdict(model_cfg), indent=2))
    return path


def load_checkpoint(path: str | Path):
    """Returns (params, batch_stats, model_cfg). Optimizer state/step via
    load_checkpoint_full."""
    payload, model_cfg = _load(path)
    return payload["params"], payload["batch_stats"], model_cfg


def load_checkpoint_full(path: str | Path, template=None):
    """``template``: an optional pytree with the live payload structure (e.g. a
    fresh TrainState's fields) — orbax restores raw nested containers, so
    restoring INTO the template recovers NamedTuple/custom-node structure (the
    optax opt_state) robustly instead of relying on leaf-order unflattening."""
    payload, model_cfg = _load(path)
    if template is not None:
        restored = {}
        for key, tmpl in template.items():
            if key not in payload:
                continue
            leaves = jax.tree.leaves(payload[key])
            tmpl_leaves, treedef = jax.tree.flatten(tmpl)
            if len(leaves) != len(tmpl_leaves):
                raise ValueError(
                    f"checkpoint field {key!r} has {len(leaves)} leaves but the live "
                    f"template has {len(tmpl_leaves)} — config/optimizer mismatch"
                )
            restored[key] = jax.tree.unflatten(treedef, leaves)
        for key in payload:
            restored.setdefault(key, payload[key])
        payload = restored
    return payload, model_cfg


def _load(path: str | Path):
    path = Path(path).absolute()
    meta = json.loads((path / _META).read_text())
    meta.pop("dec_ffn_dim", None)
    model_cfg = ModelConfig(**{k: tuple(v) if isinstance(v, list) else v for k, v in meta.items()})
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(path / "state")
    return payload, model_cfg
