"""The chunk-and-merge KhmerOCR model: encode, teacher-forced decode, and
incremental decode-step — all pure functions over a parameter pytree.

Reference: ``KhmerOCR`` (se_model.py:210-288 / vgg_model.py / resnet_model.py):
CNN backbone over fixed 48x100 chunks -> ViT-style patch projection (32 tokens
per chunk) -> 2-layer per-chunk transformer encoder -> per-image concat +
learned global positions (4096) -> BiLSTM smoothing (SE variant) -> 2-layer
transformer decoder over characters.

TPU-first redesign vs the reference forward:
  * The reference regroups chunks with Python loops over ragged lists
    (se_model.py:253-262) and `pad_sequence`. Here a batch is a static
    (B, N, H, W) array + chunk mask; "merge" is a reshape — chunks of one image
    are contiguous along N, so `(B, N, 32, D) -> (B, N*32, D)` IS the
    concatenation, and padding chunks land at the tail exactly like
    `pad_sequence`'s zero tail.
  * Memory-key padding masks are computed from the chunk mask (32 tokens per
    chunk).
  * Incremental decoding gets first-class cache support (`init_decode_state` /
    `decode_step`) instead of re-running the decoder on the growing prefix
    (predictor.py:85-99).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import backbones
from .bilstm import bilstm_apply, bilstm_init
from .layers import (
    Ctx,
    decoder_layer,
    decoder_layer_init,
    decoder_layer_step,
    dense,
    encoder_layer,
    encoder_layer_init,
    linear_init,
    trunc_normal,
)

CHUNK_TOKENS = 32  # patch tokens per 48x100 chunk: (2,32) feature map, k=(2,1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_model(rng, cfg: ModelConfig):
    """Returns (params, batch_stats) pytrees."""
    keys = jax.random.split(rng, 12)
    backbone_p, backbone_s = backbones.BACKBONE_INIT[cfg.backbone](keys[0])
    d = cfg.emb_dim
    params = {
        "backbone": backbone_p,
        "patch": {
            # torch Conv2d(512, D, k=(2,1)) repacked as (2*512, D) dense over the
            # flattened (H=2, C=512) axis; fan_in = 512*2*1.
            "proj": linear_init(keys[1], 1024, d),
            "pos_emb": trunc_normal(keys[2], (cfg.patch_max, d), 0.02),
        },
        "enc": [encoder_layer_init(k, d, cfg.enc_ffn_dim) for k in jax.random.split(keys[3], cfg.enc_layers)],
        "global_pos": trunc_normal(keys[4], (cfg.max_global_len, d), 0.02),
        "dec": {
            "tok_emb": jax.random.normal(keys[5], (cfg.vocab_size, d), jnp.float32)
            .at[cfg.pad_idx]
            .set(0.0),
            "pos_emb": trunc_normal(keys[6], (cfg.decode_max_len, d), 0.1),
            "layers": [
                decoder_layer_init(k, d, cfg.dec_ffn_dim) for k in jax.random.split(keys[7], cfg.dec_layers)
            ],
            "out": linear_init(keys[8], d, cfg.vocab_size),
        },
    }
    if cfg.use_bilstm:
        params["bilstm"] = bilstm_init(keys[9], d, d // 2)
    return params, backbone_s


# ---------------------------------------------------------------------------
# encode: chunks -> memory
# ---------------------------------------------------------------------------


def patch_apply(p, f):
    """(B, 2, 32, C) backbone features -> (B, 32, D) tokens.

    Equivalent to the reference PatchEncoder's Conv2d(k=(2,1), s=(2,1)) +
    flatten + local positions (se_model.py:81-117): each width column's two
    height rows are concatenated and densely projected.
    """
    b = f.shape[0]
    x = f.transpose(0, 2, 1, 3).reshape(b, CHUNK_TOKENS, -1)  # (B, 32, 2*C)
    x = dense({k: v.astype(x.dtype) for k, v in p["proj"].items()}, x)
    return x + p["pos_emb"][:CHUNK_TOKENS].astype(x.dtype)


def encode(params, batch_stats, chunks, chunk_counts, cfg: ModelConfig, ctx: Ctx, train: bool = False):
    """chunks: (B, N, H, W) normalized; chunk_counts: (B,) valid chunks.

    Returns (memory (B, N*32, D), memory_pad_mask (B, N*32) True=pad, new_stats).
    """
    b, n, h, w = chunks.shape
    x = chunks.reshape(b * n, h, w, 1)
    f, new_stats = backbones.BACKBONE_APPLY[cfg.backbone](params["backbone"], batch_stats, x, train)
    tok = patch_apply(params["patch"], f)  # (B*N, 32, D)
    for layer_p in params["enc"]:
        tok = encoder_layer(layer_p, ctx, tok)
    d = tok.shape[-1]
    memory = tok.reshape(b, n * CHUNK_TOKENS, d)
    lengths = chunk_counts.astype(jnp.int32) * CHUNK_TOKENS
    t = n * CHUNK_TOKENS
    memory = memory + params["global_pos"][:t].astype(memory.dtype)
    if cfg.use_bilstm:
        # Training defaults to the differentiable `lax.scan` path; the Pallas
        # recurrence kernel IS trainable (custom_vjp: kernel forward,
        # reverse-scan adjoint — ops/pallas/lstm.py) and can be opted in with
        # KHMER_OCR_PALLAS_LSTM_TRAIN=1. A/B on v5e (examples/
        # ab_pallas_lstm_train.py): the scan path wins at the training batch
        # sizes, so it stays the default. Inference auto-selects (bilstm.py).
        train_pallas = train and os.environ.get("KHMER_OCR_PALLAS_LSTM_TRAIN") == "1"
        memory = bilstm_apply(params["bilstm"], memory, lengths,
                              use_pallas=(None if train_pallas else False) if train else None)
    pad_mask = jnp.arange(t)[None, :] >= lengths[:, None]  # True = padding
    return memory, pad_mask, new_stats


# ---------------------------------------------------------------------------
# teacher-forced decode (training / eval forward)
# ---------------------------------------------------------------------------


def decode_train(params, memory, memory_pad_mask, tgt_tokens, cfg: ModelConfig, ctx: Ctx):
    """tgt_tokens: (B, T) int32 -> logits (B, T, V). Causal + pad masking as in
    TransformerDecoderWrapper.forward (se_model.py:182-207)."""
    dec = params["dec"]
    t = tgt_tokens.shape[1]
    max_t = dec["pos_emb"].shape[0]
    if t > max_t:
        raise ValueError(
            f"target length {t} exceeds the decoder's positional embedding ({max_t}); "
            f"truncate labels to decode_max_len + 1 (see train/data.py label buckets)"
        )
    x = dec["tok_emb"][tgt_tokens] + dec["pos_emb"][:t][None]
    x = x.astype(memory.dtype)
    tgt_pad = tgt_tokens == cfg.pad_idx
    for layer_p in dec["layers"]:
        x = decoder_layer(
            layer_p, ctx, x, memory,
            tgt_key_padding_mask=tgt_pad,
            memory_key_padding_mask=memory_pad_mask,
        )
    return dense(dec["out"], x)


def forward_train(params, batch_stats, chunks, chunk_counts, tgt_in, cfg: ModelConfig, ctx: Ctx, train: bool):
    """Full teacher-forced forward: (chunks, tgt_in) -> (logits, new_batch_stats)."""
    memory, pad_mask, new_stats = encode(params, batch_stats, chunks, chunk_counts, cfg, ctx, train)
    logits = decode_train(params, memory, pad_mask, tgt_in, cfg, ctx)
    return logits, new_stats


# ---------------------------------------------------------------------------
# incremental decode
# ---------------------------------------------------------------------------


def init_decode_state(params, memory, memory_pad_mask, cfg: ModelConfig, lanes: int = 1,
                      cache_len: int | None = None):
    """Precompute per-layer cross-attention K/V and allocate self-attention caches.

    ``lanes``: decode lanes per image (beam width). The memory K/V stay ONE
    copy per image — beam lanes read them through grouped merged-head
    cross-attention (models/layers.py::_attend_merged_grouped) — while
    self-attention caches are allocated per lane.

    ``cache_len``: self-attention cache slots. Defaults to the positional cap
    (``cfg.decode_max_len``), but decode loops that run ``max_len`` steps only
    ever write/read ``max_len`` slots — sizing the cache to the run (greedy.py
    / beam.py pass it) shrinks every in-loop cache update and windowed read
    proportionally, which matters because the step is KV-bandwidth-bound.

    K/V are stored MERGED-HEAD — (…, T, D) with the head partition applied at
    attention time via a constant (D, H) segment matrix — so the per-step
    attention contractions run as MXU matmuls streaming K/V once instead of
    VPU multiply-reduce fusions (layers.py::_head_segments).

    Returns a pytree: {'mem_kv': [(k, v)] per layer with shape (B, Tm, D),
    'self_kv': [(k, v)] per layer with shape (B*lanes, cache_len, D),
    'mem_valid': (B, Tm)}.
    """
    b, _, d = memory.shape
    n = cfg.decode_max_len if cache_len is None else min(cache_len, cfg.decode_max_len)
    mem_kv = [
        (dense(lp["cross"]["k"], memory), dense(lp["cross"]["v"], memory))
        for lp in params["dec"]["layers"]
    ]
    self_kv = [
        (
            jnp.zeros((b * lanes, n, d), memory.dtype),
            jnp.zeros((b * lanes, n, d), memory.dtype),
        )
        for _ in params["dec"]["layers"]
    ]
    return {
        "mem_kv": mem_kv,
        "self_kv": self_kv,
        "mem_valid": ~memory_pad_mask,
        # float view for the fused Pallas step (bool blocks are awkward in Mosaic)
        "mem_valid_f": (~memory_pad_mask).astype(jnp.float32),
    }


def pack_decode_params(params, fused: bool = False, head_dtype=None):
    """Derive a decode-optimized view of ``params`` ONCE before the decode loop:
    each decoder layer gains a packed (D, 3D) self-QKV projection (see
    layers.pack_step_params). Numerically identical; one MXU launch replaces
    three in every step of the KV-bound decode loop. With ``fused``, also
    precompute each layer's flat 2D weight operands for the fused Pallas step
    (ops/pallas/decode_step.py) so no reshapes happen inside the loop.

    ``head_dtype`` (with ``fused``): also pack the decode head — the out
    projection zero-padded to a lane-aligned vocab (Vp = ceil(V/128)*128) in
    the cache dtype — so the final layer's kernel can emit log-probs directly
    (decode_step.py head fusion; the padding columns are masked to ~NEG_INF
    in-kernel)."""
    from .layers import pack_step_params

    dec = dict(params["dec"])
    dec["layers"] = [pack_step_params(lp) for lp in dec["layers"]]
    if fused:
        from ..ops.pallas.decode_step import layer_weights

        dec["layers_fused"] = [layer_weights(lp) for lp in dec["layers"]]
        if head_dtype is not None:
            ow, ob = dec["out"]["w"], dec["out"]["b"]
            d, v = ow.shape
            vp = -(-v // 128) * 128
            dec["head_fused"] = {
                "w": jnp.zeros((d, vp), head_dtype).at[:, :v].set(ow.astype(head_dtype)),
                "b": jnp.zeros((1, vp), jnp.float32).at[0, :v].set(ob.astype(jnp.float32)),
                "v": v,
            }
    return {**params, "dec": dec}


def decode_step(params, state, tokens, pos, cfg: ModelConfig, ctx: Ctx, window: int | None = None,
                lineage_idx=None, fused: bool = False, lineage_local=None, interpret: bool = False,
                head: bool = False):
    """One decode step for a batch of lanes.

    tokens: (B,) int32 current input tokens; pos: scalar int32 position.
    ``window``: static self-attention cache window (requires pos < window); see
    decoder_layer_step. ``lineage_idx``: (B, w) absolute beam parent pointers
    for gather-at-read self-attention (see decoder_layer_step).

    ``fused``: run each decoder layer as ONE fused Pallas kernel
    (ops/pallas/decode_step.py) instead of ~12 XLA ops — requires params from
    ``pack_decode_params(fused=True)``; beam callers pass ``lineage_local``
    ((B, w) image-local parents, no pos-patching — the kernel patches) instead
    of ``lineage_idx``. Returns (logits (B, V), new_state).

    ``head`` (requires ``fused`` + params packed with ``head_dtype``): the
    LAST layer's kernel also computes the decode head; the return becomes
    (logp (B, Vp) f32 with padded columns ~NEG_INF, new_state).
    """
    dec = params["dec"]
    x = dec["tok_emb"][tokens] + jax.lax.dynamic_index_in_dim(dec["pos_emb"], pos, axis=0, keepdims=False)
    x = x.astype(state["mem_kv"][0][0].dtype)
    new_self = []
    if fused:
        from ..ops.pallas.decode_step import fused_decoder_layer_step

        lanes = state["self_kv"][0][0].shape[0] // state["mem_kv"][0][0].shape[0]
        w = window if window is not None else state["self_kv"][0][0].shape[1]
        n_layers = len(dec["layers_fused"])
        logp = None
        for li, (lw, (sk, sv), (mk, mv)) in enumerate(
                zip(dec["layers_fused"], state["self_kv"], state["mem_kv"])):
            head_op = None
            if head and li == n_layers - 1:
                hf = dec["head_fused"]
                head_op = (hf["w"], hf["b"], hf["v"])
            out = fused_decoder_layer_step(
                lw, x, pos, sk, sv, mk, mv, state["mem_valid_f"], lineage_local,
                num_heads=ctx.num_heads, window=w, lanes=lanes, interpret=interpret,
                head=head_op,
            )
            if head_op is not None:
                x, sk, sv, logp = out
            else:
                x, sk, sv = out
            new_self.append((sk, sv))
        if head:
            return logp, {**state, "self_kv": new_self}
    else:
        for lp, (sk, sv), (mk, mv) in zip(dec["layers"], state["self_kv"], state["mem_kv"]):
            x, sk, sv = decoder_layer_step(lp, ctx, x, pos, sk, sv, mk, mv, state["mem_valid"], window,
                                           lineage_idx=lineage_idx)
            new_self.append((sk, sv))
    logits = dense(dec["out"], x)
    return logits, {**state, "self_kv": new_self}


def decode_windows(max_len: int, base: int = 32) -> tuple[int, ...]:
    """Geometric cache-window schedule: (32, 64, 128, ..., max_len)."""
    windows = []
    w = base
    while w < max_len:
        windows.append(w)
        w *= 2
    windows.append(max_len)
    return tuple(windows)
