"""One-time PyTorch-checkpoint -> JAX-pytree converter.

Maps the reference's ``.pth`` state dicts (se_model.py / vgg_model.py /
resnet_model.py module trees; both raw state dicts and ``{'model_state_dict':
...}`` wrappers, predictor.py:40) onto this framework's parameter pytree.

Layout rules:
  * Conv2d OIHW -> HWIO
  * Linear / Conv1d(k=1) (out, in) -> (in, out)
  * MHA packed in_proj (3D, D) -> split q/k/v, each transposed
  * PatchEncoder Conv2d(512, D, k=(2,1)) -> (2*512, D) dense over the flattened
    (kh, c) axis (see models/ocr_model.patch_apply)
  * LSTM (4H, X) -> (X, 4H); torch gate order i,f,g,o is kept
  * BatchNorm weight/bias -> scale/bias params; running stats -> batch_stats

``detect_model_config`` reproduces `autodetect_config` (utils.py:14-43): peek
``global_pos`` for (max_seq_len, emb_dim), ``dec.pos_emb`` for decode_max_len —
plus backbone/BiLSTM detection from key names.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config import ModelConfig


def load_torch_checkpoint(path: str | Path) -> dict[str, np.ndarray]:
    """Load a .pth/.pt/.safetensors checkpoint into a flat {name: np.ndarray} dict."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Model not found at {path}")
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch  # torch (CPU) is only needed for reading the legacy pickle format

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def detect_model_config(state: dict[str, np.ndarray], vocab_size: int | None = None) -> ModelConfig:
    cfg = ModelConfig()
    kw = {}
    if "global_pos" in state:
        kw["max_global_len"] = int(state["global_pos"].shape[0])
        kw["emb_dim"] = int(state["global_pos"].shape[1])
    if "dec.pos_emb" in state:
        kw["decode_max_len"] = int(state["dec.pos_emb"].shape[0])
    if "dec.tok_emb.weight" in state:
        kw["vocab_size"] = int(state["dec.tok_emb.weight"].shape[0])
    elif vocab_size is not None:
        kw["vocab_size"] = vocab_size
    kw["use_bilstm"] = any(k.startswith("context_bilstm.") for k in state)
    if any(k.startswith("cnn.layer1.") for k in state):
        kw["backbone"] = "resnet"
    elif any(k.startswith("cnn.se3.") for k in state):
        kw["backbone"] = "se_vgg"
    else:
        kw["backbone"] = "vgg"
    kw["enc_layers"] = 1 + max(
        (int(k.split(".")[2]) for k in state if k.startswith("enc.layers.")), default=1
    )
    kw["dec_layers"] = 1 + max(
        (int(k.split(".")[3]) for k in state if k.startswith("dec.decoder.layers.")), default=1
    )
    return cfg.replace(**kw)


def _f32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _linear(state, prefix) -> dict:
    return {"w": _f32(state[f"{prefix}.weight"]).T, "b": _f32(state[f"{prefix}.bias"])}


def _ln(state, prefix) -> dict:
    return {"scale": _f32(state[f"{prefix}.weight"]), "bias": _f32(state[f"{prefix}.bias"])}


def _conv(state, wkey, bkey=None) -> dict:
    p = {"w": _f32(state[wkey]).transpose(2, 3, 1, 0)}  # OIHW -> HWIO
    if bkey is not None and bkey in state:
        p["b"] = _f32(state[bkey])
    return p


def _bn(state, prefix) -> tuple[dict, dict]:
    return (
        {"scale": _f32(state[f"{prefix}.weight"]), "bias": _f32(state[f"{prefix}.bias"])},
        {"mean": _f32(state[f"{prefix}.running_mean"]), "var": _f32(state[f"{prefix}.running_var"])},
    )


def _se(state, prefix) -> dict:
    # SequenceSE.fc = Sequential(Conv1d, ReLU, Conv1d, Sigmoid) -> fc.0 / fc.2
    def c1d(i):
        w = _f32(state[f"{prefix}.fc.{i}.weight"])[:, :, 0].T  # (out,in,1) -> (in,out)
        return {"w": w, "b": _f32(state[f"{prefix}.fc.{i}.bias"])}

    return {"fc1": c1d(0), "fc2": c1d(2)}


def _mha(state, prefix) -> dict:
    w = _f32(state[f"{prefix}.in_proj_weight"])  # (3D, D)
    bias = _f32(state[f"{prefix}.in_proj_bias"])
    d = w.shape[1]
    qw, kw_, vw = w[:d], w[d : 2 * d], w[2 * d :]
    qb, kb, vb = bias[:d], bias[d : 2 * d], bias[2 * d :]
    return {
        "q": {"w": qw.T, "b": qb},
        "k": {"w": kw_.T, "b": kb},
        "v": {"w": vw.T, "b": vb},
        "o": _linear(state, f"{prefix}.out_proj"),
    }


def _enc_layer(state, prefix) -> dict:
    return {
        "self": _mha(state, f"{prefix}.self_attn"),
        "ln1": _ln(state, f"{prefix}.norm1"),
        "ln2": _ln(state, f"{prefix}.norm2"),
        "lin1": _linear(state, f"{prefix}.linear1"),
        "lin2": _linear(state, f"{prefix}.linear2"),
    }


def _dec_layer(state, prefix) -> dict:
    return {
        "self": _mha(state, f"{prefix}.self_attn"),
        "cross": _mha(state, f"{prefix}.multihead_attn"),
        "ln1": _ln(state, f"{prefix}.norm1"),
        "ln2": _ln(state, f"{prefix}.norm2"),
        "ln3": _ln(state, f"{prefix}.norm3"),
        "lin1": _linear(state, f"{prefix}.linear1"),
        "lin2": _linear(state, f"{prefix}.linear2"),
    }


def _lstm_dir(state, suffix="") -> dict:
    return {
        "w_ih": _f32(state[f"context_bilstm.weight_ih_l0{suffix}"]).T,
        "w_hh": _f32(state[f"context_bilstm.weight_hh_l0{suffix}"]).T,
        "b_ih": _f32(state[f"context_bilstm.bias_ih_l0{suffix}"]),
        "b_hh": _f32(state[f"context_bilstm.bias_hh_l0{suffix}"]),
    }


def _convert_se_vgg_backbone(state) -> tuple[dict, dict]:
    p, s = {}, {}
    for i in range(1, 7):
        p[f"conv{i}"] = _conv(state, f"cnn.conv{i}.0.weight", f"cnn.conv{i}.0.bias")
        p[f"bn_conv{i}"], s[f"bn_conv{i}"] = _bn(state, f"cnn.conv{i}.1")
    p["conv7"] = _conv(state, "cnn.conv7.weight", "cnn.conv7.bias")
    p["bn_conv7"], s["bn_conv7"] = _bn(state, "cnn.bn7")
    for name in ("se3", "se4", "se5"):
        p[name] = _se(state, f"cnn.{name}")
    return p, s


def _convert_vgg_backbone(state) -> tuple[dict, dict]:
    p, s = {}, {}
    for i in range(1, 7):
        p[f"conv{i}"] = _conv(state, f"cnn.conv{i}.0.weight", f"cnn.conv{i}.0.bias")
        p[f"bn_conv{i}"], s[f"bn_conv{i}"] = _bn(state, f"cnn.conv{i}.1")
    p["conv7"] = _conv(state, "cnn.conv7.weight", "cnn.conv7.bias")
    return p, s


def _convert_resnet_backbone(state) -> tuple[dict, dict]:
    p, s = {"stem_conv": _conv(state, "cnn.conv1.weight")}, {}
    p["stem_bn"], s["stem_bn"] = _bn(state, "cnn.bn1")
    from ..models.backbones import RESNET_STAGES

    for stage_i, (_, _, n_blocks) in enumerate(RESNET_STAGES):
        blocks_p, blocks_s = [], []
        for bidx in range(n_blocks):
            pre = f"cnn.layer{stage_i + 1}.{bidx}"
            bp = {
                "conv1": _conv(state, f"{pre}.conv1.weight"),
                "conv2": _conv(state, f"{pre}.conv2.weight"),
            }
            bs = {}
            bp["bn1"], bs["bn1"] = _bn(state, f"{pre}.bn1")
            bp["bn2"], bs["bn2"] = _bn(state, f"{pre}.bn2")
            if f"{pre}.shortcut.0.weight" in state:
                bp["short_conv"] = _conv(state, f"{pre}.shortcut.0.weight")
                bp["short_bn"], bs["short_bn"] = _bn(state, f"{pre}.shortcut.1")
            blocks_p.append(bp)
            blocks_s.append(bs)
        p[f"layer{stage_i + 1}"] = blocks_p
        s[f"layer{stage_i + 1}"] = blocks_s
    return p, s


_BACKBONE_CONVERTERS = {
    "se_vgg": _convert_se_vgg_backbone,
    "vgg": _convert_vgg_backbone,
    "resnet": _convert_resnet_backbone,
}


def convert_state_dict(state: dict[str, np.ndarray], cfg: ModelConfig | None = None):
    """Flat torch state dict -> (params, batch_stats, ModelConfig)."""
    cfg = cfg or detect_model_config(state)
    backbone_p, backbone_s = _BACKBONE_CONVERTERS[cfg.backbone](state)

    # PatchEncoder proj: (D, 512, 2, 1) -> (2*512, D) over the flattened (kh, c)
    # axis used by patch_apply's (B, 32, 2, C) -> (B, 32, 2C) reshape.
    pw = _f32(state["patch.proj.weight"])[:, :, :, 0]  # (D, C, KH)
    pw = pw.transpose(2, 1, 0).reshape(-1, pw.shape[0])  # (KH*C, D)

    params = {
        "backbone": backbone_p,
        "patch": {
            "proj": {"w": pw, "b": _f32(state["patch.proj.bias"])},
            "pos_emb": _f32(state["patch.pos_emb"]),
        },
        "enc": [_enc_layer(state, f"enc.layers.{i}") for i in range(cfg.enc_layers)],
        "global_pos": _f32(state["global_pos"]),
        "dec": {
            "tok_emb": _f32(state["dec.tok_emb.weight"]),
            "pos_emb": _f32(state["dec.pos_emb"]),
            "layers": [_dec_layer(state, f"dec.decoder.layers.{i}") for i in range(cfg.dec_layers)],
            "out": _linear(state, "dec.out_proj"),
        },
    }
    if cfg.use_bilstm:
        params["bilstm"] = {"fw": _lstm_dir(state), "bw": _lstm_dir(state, "_reverse")}
    return params, backbone_s, cfg


def load_and_convert(path: str | Path, vocab_size: int | None = None):
    state = load_torch_checkpoint(path)
    cfg = detect_model_config(state, vocab_size)
    params, stats, cfg = convert_state_dict(state, cfg)
    return params, stats, cfg
