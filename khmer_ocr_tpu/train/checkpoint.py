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


def load_checkpoint_full(path: str | Path):
    payload, model_cfg = _load(path)
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
