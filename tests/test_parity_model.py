"""Per-stage numerical parity: JAX model + converter vs the torch reference oracle.

Strategy (SURVEY.md §4): a subprocess (tests/oracle_dump.py) builds the
reference module tree with random weights, exports its state dict AND reference
activations/decodes for fixed inputs to .npz; this module converts the state
dict and requires stage-by-stage activation parity plus token-for-token decode
parity. This is exactly the check a real reference checkpoint would get (same
state-dict format), minus the weights this mirror strips.

The oracle runs out-of-process because torch thread pools and XLA:CPU
executables deadlock intermittently when mixed (documented in conftest.py).
All JAX matmuls/convs run at precision='highest' — the production inference
default (RuntimeConfig.matmul_precision) — because XLA:CPU's default-precision
conv loses ~4e-3 vs the f64 ground truth while torch stays at ~2e-7.
"""

import hashlib
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from khmer_ocr_tpu.config import DecodeConfig
from khmer_ocr_tpu.convert import convert_state_dict, detect_model_config
from khmer_ocr_tpu.decode import beam_decode, greedy_decode
from khmer_ocr_tpu.models import decode_train, encode
from khmer_ocr_tpu.models.backbones import BACKBONE_APPLY
from khmer_ocr_tpu.models.layers import Ctx

HERE = Path(__file__).parent
CACHE = HERE / "_oracle_cache"
VOCAB = 124
CTX = Ctx(num_heads=8, dropout=0.0, deterministic=True)
PREC = "highest"


def _oracle(backbone: str) -> dict:
    """Run (or reuse) the torch-subprocess oracle dump for a backbone."""
    CACHE.mkdir(exist_ok=True)
    key = hashlib.sha256(
        (HERE / "torch_oracle.py").read_bytes() + (HERE / "oracle_dump.py").read_bytes()
    ).hexdigest()[:12]
    path = CACHE / f"{backbone}-{key}.npz"
    if not path.exists():
        subprocess.run(
            [sys.executable, str(HERE / "oracle_dump.py"), backbone, str(path)],
            check=True,
            cwd=HERE,
            timeout=600,
        )
    return dict(np.load(path, allow_pickle=False))


@pytest.fixture(scope="module", params=["se_vgg", "vgg", "resnet"])
def setup(request):
    blobs = _oracle(request.param)
    state = {k[3:]: v for k, v in blobs.items() if k.startswith("sd/")}
    cfg = detect_model_config(state)
    params, stats, cfg = convert_state_dict(state, cfg)
    return request.param, blobs, params, stats, cfg


def test_detect_config(setup):
    backbone, blobs, params, stats, cfg = setup
    assert cfg.backbone == backbone
    assert cfg.emb_dim == 384
    assert cfg.max_global_len == 4096
    assert cfg.decode_max_len == 256
    assert cfg.vocab_size == VOCAB
    assert cfg.use_bilstm == (backbone == "se_vgg")
    assert cfg.enc_layers == 2 and cfg.dec_layers == 2


def test_backbone_parity(setup):
    backbone, blobs, params, stats, cfg = setup
    x = blobs["backbone_in"]  # (B, 1, 48, 100)
    with jax.default_matmul_precision(PREC):
        apply = jax.jit(lambda p, s, xx: BACKBONE_APPLY[backbone](p, s, xx)[0])
        ours = apply(params["backbone"], stats, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, blobs["backbone_out"], atol=2e-4, rtol=1e-3)


def test_encode_parity(setup):
    backbone, blobs, params, stats, cfg = setup
    # Two images in one bucket (N=3) with counts [2, 3] — exercises bucket padding.
    chunks_a, chunks_b = blobs["enc_in_a"], blobs["enc_in_b"]
    batch = np.zeros((2, 3, 48, 100), np.float32)
    batch[0, :2] = chunks_a[:, 0]
    batch[1, :3] = chunks_b[:, 0]
    counts = np.array([2, 3], np.int32)
    with jax.default_matmul_precision(PREC):
        enc_fn = jax.jit(lambda p, s, c, n: encode(p, s, c, n, cfg, CTX)[:2])
        memory, pad_mask = enc_fn(params, stats, jnp.asarray(batch), jnp.asarray(counts))
    memory = np.asarray(memory)
    for i, name in enumerate(["a", "b"]):
        ref = blobs[f"enc_out_{name}"]  # (N*32, D)
        np.testing.assert_allclose(memory[i, : ref.shape[0]], ref, atol=5e-4, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(pad_mask[0]), np.arange(96) >= 64)


def test_decode_train_parity(setup):
    backbone, blobs, params, stats, cfg = setup
    with jax.default_matmul_precision(PREC):
        dec_fn = jax.jit(lambda p, m, pm, t: decode_train(p, m, pm, t, cfg, CTX))
        ours = dec_fn(
            params, jnp.asarray(blobs["dec_memory"]), jnp.asarray(blobs["dec_pad"]),
            jnp.asarray(blobs["dec_tgt"]),
        )
    # padded tgt tail rows are garbage on both sides — compare valid positions
    np.testing.assert_allclose(np.asarray(ours)[:, :9], blobs["dec_logits"][:, :9], atol=5e-4, rtol=1e-3)


def test_greedy_parity(setup):
    backbone, blobs, params, stats, cfg = setup
    memory = jnp.asarray(blobs["greedy_memory"])
    pad = jnp.zeros((1, memory.shape[1]), bool)
    dec_cfg = DecodeConfig(max_len=24)
    with jax.default_matmul_precision(PREC):
        g_fn = jax.jit(lambda p, m, pm: greedy_decode(p, m, pm, cfg, dec_cfg))
        ours = np.asarray(g_fn(params, memory, pad))[0]
    # reference returns tokens WITHOUT eos; ours stores eos then pads
    got = [int(t) for t in ours if t != 0]
    if 3 in got:
        got = got[: got.index(3)]
    assert got == blobs["greedy_tokens"].tolist(), f"{got} != {blobs['greedy_tokens']}"


def test_beam_stress_parity(setup):
    """Batched-beam x padded-memory x 128-step oracle parity (round-2 widening
    of the beam evidence): four images with valid memory lengths 32/64/96/128
    decode TOGETHER as masked lanes; each string must equal the reference's
    per-image exact-length beam decode."""
    backbone, blobs, params, stats, cfg = setup
    if backbone != "se_vgg":
        pytest.skip("decode params are backbone-independent; one backbone suffices")
    memory = jnp.asarray(blobs["beam_stress_memory"])  # (4, 128, 384)
    lens = blobs["beam_stress_lens"]
    pad = jnp.asarray(np.arange(memory.shape[1])[None, :] >= lens[:, None])
    dec_cfg = DecodeConfig(beam_width=3, max_len=128)
    with jax.default_matmul_precision(PREC):
        b_fn = jax.jit(lambda p, m, pm: beam_decode(p, m, pm, cfg, dec_cfg))
        ours = np.asarray(b_fn(params, memory, pad))
    for i in range(4):
        got = [int(t) for t in ours[i] if t != 0]
        if 3 in got:
            got = got[: got.index(3)]
        ref = [int(t) for t in blobs[f"beam_stress_tokens_{i}"] if t != 3]
        assert got == ref, f"image {i} (len {lens[i]}): {got} != {ref}"


def test_beam_parity(setup):
    backbone, blobs, params, stats, cfg = setup
    memory = jnp.asarray(blobs["beam_memory"])
    pad = jnp.zeros((1, memory.shape[1]), bool)
    dec_cfg = DecodeConfig(beam_width=3, max_len=16)
    with jax.default_matmul_precision(PREC):
        b_fn = jax.jit(lambda p, m, pm: beam_decode(p, m, pm, cfg, dec_cfg))
        ours = np.asarray(b_fn(params, memory, pad))[0]
    got = [int(t) for t in ours if t != 0]
    ref = [int(t) for t in blobs["beam_tokens"] if t != 3]
    if 3 in got:
        got = got[: got.index(3)]
    assert got == ref, f"{got} != {ref}"
