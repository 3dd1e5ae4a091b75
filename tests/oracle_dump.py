"""Torch-only oracle dump (run as a subprocess; never imports JAX).

Builds the reference module tree with random weights and records its state dict
plus reference activations/decodes for fixed inputs into an .npz file. The
pytest process then runs only JAX — torch's thread pools and XLA:CPU
executables deadlock intermittently when mixed in one process (see
tests/conftest.py).

Usage: python oracle_dump.py <backbone> <out.npz> [checkpoint]

With a third argument the module tree loads that REAL reference checkpoint
(.pth / .safetensors, strict key match) instead of random weights — the mode
``examples/real_checkpoint_gate.py`` uses to produce ground-truth activations
and decodes for the acceptance gate the day real weights appear (BASELINE.md).
"""

from __future__ import annotations

import sys

import numpy as np
import torch

from torch_oracle import KhmerOCR, oracle_beam, oracle_encode, oracle_greedy

VOCAB = 124


def load_reference_state(path: str) -> dict:
    """Load a reference checkpoint's state dict (.pth/.pt torch pickle —
    possibly nested under 'state_dict'/'model' — or .safetensors)."""
    if str(path).endswith(".safetensors"):
        from safetensors.torch import load_file

        return load_file(path)
    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return obj


def randomize_bn(model: torch.nn.Module, gen: torch.Generator):
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=gen) + 0.5)
            m.weight.data.copy_(torch.rand(m.num_features, generator=gen) + 0.5)
            m.bias.data.copy_(torch.randn(m.num_features, generator=gen) * 0.1)


def rand_chunks(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, size=(n, 1, 48, 100)).astype(np.float32)


def main(backbone: str, out_path: str, checkpoint: str | None = None) -> None:
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    if checkpoint is not None:
        sd = load_reference_state(checkpoint)
        emb_dim = sd["patch.proj.weight"].shape[0]
        vocab = sd["dec.tok_emb.weight"].shape[0]
        tm = KhmerOCR(vocab_size=vocab, emb_dim=emb_dim, backbone=backbone)
        tm.load_state_dict(sd, strict=True)
    else:
        tm = KhmerOCR(vocab_size=VOCAB, emb_dim=384, backbone=backbone)
        randomize_bn(tm, gen)
    tm.eval()

    blobs: dict[str, np.ndarray] = {}
    for k, v in tm.state_dict().items():
        blobs[f"sd/{k}"] = v.detach().numpy()

    # backbone
    x = rand_chunks(4)
    with torch.no_grad():
        blobs["backbone_in"] = x
        blobs["backbone_out"] = tm.cnn(torch.from_numpy(x)).numpy()

    # piecewise encode (predictor.py:53-78) per image
    for name, seed, n in [("a", 1, 2), ("b", 2, 3)]:
        ch = rand_chunks(n, seed=seed)
        blobs[f"enc_in_{name}"] = ch
        blobs[f"enc_out_{name}"] = oracle_encode(tm, torch.from_numpy(ch)).numpy()[0]

    # teacher-forced decoder logits
    rng = np.random.RandomState(3)
    memory = rng.randn(2, 64, 384).astype(np.float32)
    pad = np.zeros((2, 64), bool)
    pad[0, 48:] = True
    tgt = rng.randint(1, VOCAB, size=(2, 12)).astype(np.int64)
    tgt[0, 9:] = 0
    with torch.no_grad():
        logits = tm.dec(torch.from_numpy(tgt), torch.from_numpy(memory), torch.from_numpy(pad)).numpy()
    blobs.update(dec_memory=memory, dec_pad=pad, dec_tgt=tgt.astype(np.int32), dec_logits=logits)

    # greedy / beam decode token parity
    mem_g = oracle_encode(tm, torch.from_numpy(rand_chunks(2, seed=5)))
    blobs["greedy_memory"] = mem_g.numpy()
    blobs["greedy_tokens"] = np.array(oracle_greedy(tm, mem_g, max_len=24), np.int32)
    mem_b = oracle_encode(tm, torch.from_numpy(rand_chunks(2, seed=7)))
    blobs["beam_memory"] = mem_b.numpy()
    blobs["beam_tokens"] = np.array(oracle_beam(tm, mem_b, beam_width=3, max_len=16), np.int32)

    # beam stress (round-2 VERDICT #8): batched x padded-memory x long decode.
    # Four memories of different valid lengths; the reference decodes each at
    # its exact length (B=1, no padding — predictor.py:64), our side decodes
    # all four batched with key-padding masks. 128 steps exercises the staged
    # cache windows across 32/64/128 boundaries.
    rng = np.random.RandomState(11)
    lens = [32, 64, 96, 128]
    mem_s = (rng.randn(4, 128, 384) * 0.5).astype(np.float32)
    for i, L in enumerate(lens):
        mem_s[i, L:] = 0.0
    blobs["beam_stress_memory"] = mem_s
    blobs["beam_stress_lens"] = np.array(lens, np.int32)
    for i, L in enumerate(lens):
        toks = oracle_beam(tm, torch.from_numpy(mem_s[i : i + 1, :L]), beam_width=3, max_len=128)
        blobs[f"beam_stress_tokens_{i}"] = np.array(toks, np.int32)

    np.savez_compressed(out_path, **blobs)
    print(f"oracle dump: {backbone} -> {out_path} ({len(blobs)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
