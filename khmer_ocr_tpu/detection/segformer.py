"""SegFormer (MiT-b0) semantic segmentation in functional JAX/NHWC.

TPU-native port of the layout model the reference serves through HF
transformers (`LayoutModel`, netra_ocr/detection/model.py:6-33: mit-b0 with 12
DocLayNet classes, bilinear logit upsampling, argmax class map + max-softmax
heatmap). The forward is a pure function over a parameter pytree, fully
jittable; weights convert from HF checkpoints (`convert_hf_state_dict`).

Architecture (det-b0/config.json): 4 stages, depths [2,2,2,2], hidden
[32,64,160,256], heads [1,2,5,8], spatial-reduction ratios [8,4,2,1],
mix-FFN ratio 4, patch convs k7s4/k3s2/k3s2/k3s2, decode head with per-stage
linear projections -> upsample to 1/4 -> 1x1 fuse conv + BN + ReLU ->
classifier. LayerNorm eps 1e-6, exact GELU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

LN_EPS = 1e-6
BN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class SegFormerConfig:
    num_labels: int = 12
    depths: tuple[int, ...] = (2, 2, 2, 2)
    hidden_sizes: tuple[int, ...] = (32, 64, 160, 256)
    num_heads: tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: tuple[int, ...] = (8, 4, 2, 1)
    patch_sizes: tuple[int, ...] = (7, 3, 3, 3)
    strides: tuple[int, ...] = (4, 2, 2, 2)
    mlp_ratio: int = 4
    decoder_hidden: int = 256


def _ln(p, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * p["scale"] + p["bias"]


def _dense(p, x):
    return x @ p["w"] + p["b"]


def _conv(p, x, stride, padding):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + p["b"] if "b" in p else y


def _attention(p, x, hw, num_heads, sr_ratio):
    """Efficient self-attention with spatial reduction of K/V.

    x: (B, N, C) tokens; hw: (H, W) of the token grid.
    """
    b, n, c = x.shape
    h, w = hw
    hd = c // num_heads
    q = _dense(p["q"], x).reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    kv_in = x
    if sr_ratio > 1:
        spatial = x.reshape(b, h, w, c)
        spatial = _conv(p["sr"], spatial, sr_ratio, "VALID")
        kv_in = _ln(p["sr_ln"], spatial.reshape(b, -1, c))
    k = _dense(p["k"], kv_in).reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    v = _dense(p["v"], kv_in).reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd).astype(x.dtype)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(b, n, c)
    return _dense(p["o"], out)


def _mix_ffn(p, x, hw):
    """dense -> 3x3 depthwise conv (spatial) -> GELU -> dense."""
    b, n, c = x.shape
    h, w = hw
    x = _dense(p["dense1"], x)
    ch = x.shape[-1]
    spatial = x.reshape(b, h, w, ch)
    dw = jax.lax.conv_general_dilated(
        spatial, p["dw_w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=ch,
    ) + p["dw_b"]
    x = jax.nn.gelu(dw.reshape(b, n, ch), approximate=False)
    return _dense(p["dense2"], x)


def encoder_forward(params, x, cfg: SegFormerConfig):
    """x: (B, H, W, 3) normalized. Returns list of 4 stage features (B, Hi, Wi, Ci)."""
    feats = []
    for i in range(len(cfg.depths)):
        sp = params["stages"][i]
        pad = cfg.patch_sizes[i] // 2
        x = _conv(sp["patch"], x, cfg.strides[i], [(pad, pad), (pad, pad)])
        b, h, w, c = x.shape
        tok = _ln(sp["patch_ln"], x.reshape(b, h * w, c))
        for bp in sp["blocks"]:
            tok = tok + _attention(bp["attn"], _ln(bp["ln1"], tok), (h, w), cfg.num_heads[i], cfg.sr_ratios[i])
            tok = tok + _mix_ffn(bp["mlp"], _ln(bp["ln2"], tok), (h, w))
        tok = _ln(sp["final_ln"], tok)
        x = tok.reshape(b, h, w, c)
        feats.append(x)
    return feats


def _resize_bilinear(x, out_hw):
    """torch F.interpolate(mode='bilinear', align_corners=False) equivalence —
    jax.image 'linear' uses the same half-pixel convention."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="linear")


def decode_head_forward(params, feats, cfg: SegFormerConfig):
    """Per-stage linear proj -> upsample to 1/4 -> concat(reversed) -> fuse
    conv + BN + ReLU -> classifier. Returns logits (B, H/4, W/4, num_labels)."""
    hp = params["head"]
    target = feats[0].shape[1:3]
    proj = []
    for i, f in enumerate(feats):
        b, h, w, c = f.shape
        p = _dense(hp["linear_c"][i], f.reshape(b, h * w, c)).reshape(b, h, w, -1)
        if (h, w) != target:
            p = _resize_bilinear(p, target)
        proj.append(p)
    x = jnp.concatenate(proj[::-1], axis=-1)
    x = _conv(hp["fuse"], x, 1, "VALID")
    bn = hp["bn"]
    x = (x - bn["mean"]) * jax.lax.rsqrt(bn["var"] + BN_EPS) * bn["scale"] + bn["bias"]
    x = jax.nn.relu(x)
    return _conv(hp["classifier"], x, 1, "VALID")


def segformer_logits(params, x, cfg: SegFormerConfig):
    return decode_head_forward(params, encoder_forward(params, x, cfg), cfg)


def predict_maps(params, x, cfg: SegFormerConfig, out_hw: tuple[int, int],
                 compact: bool = False):
    """Full reference `LayoutModel.predict` semantics (model.py:20-33): upsample
    logits to the original size, return (argmax class map, max-softmax heatmap).

    ``compact``: pack both maps into ONE (B, 2, H, W) uint8 array — class ids
    exact (num_labels <= 255), heatmap quantized to 1/255 steps. Device->host
    transfer over the axon tunnel costs ~40 ms/call fixed + ~50 MB/s, so the
    default two-array int32+f32 return moves 18.4 MB in two calls (~390 ms for
    an A4 page) where the packed uint8 moves 4.6 MB in one (~100 ms); the
    1/255 heatmap step is far below every post-process threshold margin
    (postprocess.py uses 0.2/0.5 cutoffs on contour MEANS)."""
    logits = segformer_logits(params, x, cfg)
    logits = _resize_bilinear(logits, out_hw)
    probs = jax.nn.softmax(logits, axis=-1)
    cm = jnp.argmax(logits, axis=-1)
    hm = jnp.max(probs, axis=-1)
    if compact:
        return jnp.stack([cm.astype(jnp.uint8), (hm * 255.0 + 0.5).astype(jnp.uint8)], axis=1)
    return cm, hm


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------


def _t(x):
    return np.asarray(x, np.float32).T


def _lin(sd, p):
    return {"w": _t(sd[f"{p}.weight"]), "b": np.asarray(sd[f"{p}.bias"], np.float32)}


def _lnp(sd, p):
    return {"scale": np.asarray(sd[f"{p}.weight"], np.float32), "bias": np.asarray(sd[f"{p}.bias"], np.float32)}


def _convp(sd, p, bias=True):
    out = {"w": np.asarray(sd[f"{p}.weight"], np.float32).transpose(2, 3, 1, 0)}
    if bias and f"{p}.bias" in sd:
        out["b"] = np.asarray(sd[f"{p}.bias"], np.float32)
    return out


def convert_hf_state_dict(sd: dict, cfg: SegFormerConfig | None = None):
    """HF `SegformerForSemanticSegmentation` state dict -> our pytree.

    Depthwise conv: torch groups=C weight (C,1,3,3) -> HWIO (3,3,1,C).
    """
    cfg = cfg or SegFormerConfig()
    sd = {k.removeprefix("segformer."): v for k, v in sd.items()}
    stages = []
    for i in range(len(cfg.depths)):
        blocks = []
        for j in range(cfg.depths[i]):
            pre = f"encoder.block.{i}.{j}"
            attn = {
                "q": _lin(sd, f"{pre}.attention.self.query"),
                "k": _lin(sd, f"{pre}.attention.self.key"),
                "v": _lin(sd, f"{pre}.attention.self.value"),
                "o": _lin(sd, f"{pre}.attention.output.dense"),
            }
            if cfg.sr_ratios[i] > 1:
                attn["sr"] = _convp(sd, f"{pre}.attention.self.sr")
                attn["sr_ln"] = _lnp(sd, f"{pre}.attention.self.layer_norm")
            dw = np.asarray(sd[f"{pre}.mlp.dwconv.dwconv.weight"], np.float32)  # (C,1,3,3)
            blocks.append({
                "ln1": _lnp(sd, f"{pre}.layer_norm_1"),
                "attn": attn,
                "ln2": _lnp(sd, f"{pre}.layer_norm_2"),
                "mlp": {
                    "dense1": _lin(sd, f"{pre}.mlp.dense1"),
                    "dw_w": dw.transpose(2, 3, 1, 0),
                    "dw_b": np.asarray(sd[f"{pre}.mlp.dwconv.dwconv.bias"], np.float32),
                    "dense2": _lin(sd, f"{pre}.mlp.dense2"),
                },
            })
        stages.append({
            "patch": _convp(sd, f"encoder.patch_embeddings.{i}.proj"),
            "patch_ln": _lnp(sd, f"encoder.patch_embeddings.{i}.layer_norm"),
            "blocks": blocks,
            "final_ln": _lnp(sd, f"encoder.layer_norm.{i}"),
        })
    head = {
        "linear_c": [_lin(sd, f"decode_head.linear_c.{i}.proj") for i in range(len(cfg.depths))],
        "fuse": _convp(sd, "decode_head.linear_fuse", bias=False),
        "bn": {
            "scale": np.asarray(sd["decode_head.batch_norm.weight"], np.float32),
            "bias": np.asarray(sd["decode_head.batch_norm.bias"], np.float32),
            "mean": np.asarray(sd["decode_head.batch_norm.running_mean"], np.float32),
            "var": np.asarray(sd["decode_head.batch_norm.running_var"], np.float32),
        },
        "classifier": _convp(sd, "decode_head.classifier"),
    }
    return {"stages": stages, "head": head}


def load_hf_checkpoint(model_dir):
    """Load a local HF checkpoint dir (config.json + model.safetensors)."""
    import json
    from pathlib import Path

    model_dir = Path(model_dir)
    hf = json.loads((model_dir / "config.json").read_text())
    cfg = SegFormerConfig(
        num_labels=len(hf.get("id2label", {})) or 12,
        depths=tuple(hf["depths"]),
        hidden_sizes=tuple(hf["hidden_sizes"]),
        num_heads=tuple(hf["num_attention_heads"]),
        sr_ratios=tuple(hf["sr_ratios"]),
        patch_sizes=tuple(hf["patch_sizes"]),
        strides=tuple(hf["strides"]),
        mlp_ratio=hf["mlp_ratios"][0],
        decoder_hidden=hf["decoder_hidden_size"],
    )
    st = model_dir / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        sd = dict(load_file(str(st)))
    else:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(model_dir / "pytorch_model.bin", map_location="cpu").items()}
    return convert_hf_state_dict(sd, cfg), cfg
