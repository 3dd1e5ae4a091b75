"""Checkpoint format handling: raw state dicts, {'model_state_dict': ...}
wrappers (predictor.py:40), and safetensors."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

HERE = Path(__file__).parent

_SAVE_SCRIPT = """
import sys, torch
from torch_oracle import KhmerOCR
torch.manual_seed(7)
m = KhmerOCR(vocab_size=124, emb_dim=384, backbone="vgg")
sd = m.state_dict()
torch.save(sd, sys.argv[1])                                  # raw
torch.save({"model_state_dict": sd, "epoch": 42}, sys.argv[2])  # wrapped
from safetensors.numpy import save_file
save_file({k: v.detach().contiguous().numpy() for k, v in sd.items()}, sys.argv[3])
print("saved")
"""


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpts")
    raw, wrapped, st = d / "raw.pth", d / "wrapped.pth", d / "model.safetensors"
    subprocess.run([sys.executable, "-c", _SAVE_SCRIPT, str(raw), str(wrapped), str(st)],
                   check=True, cwd=HERE, timeout=300)
    return raw, wrapped, st


def test_all_formats_convert_identically(ckpts):
    from khmer_ocr_tpu.convert.torch_loader import load_and_convert

    trees = []
    for path in ckpts:
        params, stats, cfg = load_and_convert(path)
        assert cfg.backbone == "vgg" and cfg.emb_dim == 384
        trees.append(params)
    import jax

    leaves = [jax.tree.leaves(t) for t in trees]
    assert len(leaves[0]) == len(leaves[1]) == len(leaves[2])
    for a, b, c in zip(*leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_missing_checkpoint_raises():
    from khmer_ocr_tpu.convert.torch_loader import load_torch_checkpoint

    with pytest.raises(FileNotFoundError):
        load_torch_checkpoint("/nonexistent/model.pth")
