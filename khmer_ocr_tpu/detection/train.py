"""SegFormer layout-model fine-tuning (TPU, functional JAX).

The reference fine-tuned its `det-b0` checkpoint on DocLayNet-style pages
outside the repo (the HF hub model is simply *loaded* by
netra_ocr/detection/model.py:6-14 — no training code ships with it). This
module closes that self-sufficiency gap: random init, a jitted train step
(batch-stats BN in the decode head, HF loss semantics), and a synthetic
layout-page generator so the loop is runnable end-to-end without DocLayNet.

Loss matches HF `SegformerForSemanticSegmentation.forward` (ignore_index=255,
cross-entropy over logits bilinearly upsampled to the label resolution).
Init matches HF `SegformerPreTrainedModel._init_weights` (normal std 0.02 for
dense/conv kernels, zero bias, unit LayerNorm/BN).
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

from .config import LayoutConfig
from .segformer import BN_EPS, SegFormerConfig, _resize_bilinear, encoder_forward, _conv, _dense

logger = logging.getLogger(__name__)

IGNORE_INDEX = 255  # HF semantic_loss_ignore_index
BN_MOMENTUM = 0.1  # torch BatchNorm2d default


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_dense(rng, cin, cout):
    return {"w": 0.02 * jax.random.truncated_normal(rng, -2, 2, (cin, cout), jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32)}


def _init_conv(rng, kh, kw, cin, cout, bias=True):
    p = {"w": 0.02 * jax.random.truncated_normal(rng, -2, 2, (kh, kw, cin, cout), jnp.float32)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _init_ln(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def segformer_init(rng, cfg: SegFormerConfig | None = None):
    """Random-init parameter pytree, same structure as `convert_hf_state_dict`."""
    cfg = cfg or SegFormerConfig()
    stages = []
    cin = 3
    for i, depth in enumerate(cfg.depths):
        c = cfg.hidden_sizes[i]
        rng, kp = jax.random.split(rng)
        blocks = []
        for _ in range(depth):
            rng, kq, kk, kv, ko, ksr, k1, kdw, k2 = jax.random.split(rng, 9)
            attn = {"q": _init_dense(kq, c, c), "k": _init_dense(kk, c, c),
                    "v": _init_dense(kv, c, c), "o": _init_dense(ko, c, c)}
            if cfg.sr_ratios[i] > 1:
                attn["sr"] = _init_conv(ksr, cfg.sr_ratios[i], cfg.sr_ratios[i], c, c)
                attn["sr_ln"] = _init_ln(c)
            hid = c * cfg.mlp_ratio
            blocks.append({
                "ln1": _init_ln(c), "attn": attn, "ln2": _init_ln(c),
                "mlp": {
                    "dense1": _init_dense(k1, c, hid),
                    "dw_w": 0.02 * jax.random.truncated_normal(kdw, -2, 2, (3, 3, 1, hid), jnp.float32),
                    "dw_b": jnp.zeros((hid,), jnp.float32),
                    "dense2": _init_dense(k2, hid, c),
                },
            })
        stages.append({
            "patch": _init_conv(kp, cfg.patch_sizes[i], cfg.patch_sizes[i], cin, c),
            "patch_ln": _init_ln(c),
            "blocks": blocks,
            "final_ln": _init_ln(c),
        })
        cin = c
    rng, *hk = jax.random.split(rng, len(cfg.depths) + 3)
    dh = cfg.decoder_hidden
    head = {
        "linear_c": [_init_dense(hk[i], cfg.hidden_sizes[i], dh) for i in range(len(cfg.depths))],
        "fuse": _init_conv(hk[-2], 1, 1, dh * len(cfg.depths), dh, bias=False),
        "bn": {"scale": jnp.ones((dh,), jnp.float32), "bias": jnp.zeros((dh,), jnp.float32),
               "mean": jnp.zeros((dh,), jnp.float32), "var": jnp.ones((dh,), jnp.float32)},
        "classifier": _init_conv(hk[-1], 1, 1, dh, cfg.num_labels),
    }
    return {"stages": stages, "head": head}


# ---------------------------------------------------------------------------
# train-mode forward (the inference path uses running BN stats; training uses
# batch stats and returns the updated running pair, torch semantics)
# ---------------------------------------------------------------------------


def decode_head_train(params, feats, cfg: SegFormerConfig):
    """Returns (logits, new_bn_stats)."""
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
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.var(x, axis=(0, 1, 2))
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unbiased = var * (n / max(n - 1, 1))
    new_stats = {
        "mean": (1 - BN_MOMENTUM) * bn["mean"] + BN_MOMENTUM * mean,
        "var": (1 - BN_MOMENTUM) * bn["var"] + BN_MOMENTUM * unbiased,
    }
    x = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * bn["scale"] + bn["bias"]
    x = jax.nn.relu(x)
    return _conv(hp["classifier"], x, 1, "VALID"), new_stats


def segformer_loss(params, images, labels, cfg: SegFormerConfig):
    """HF loss: upsample logits to the label resolution, CE with ignore_index.

    images: (B, H, W, 3) normalized; labels: (B, H, W) int32 (255 = ignore).
    Returns (loss, new_bn_stats).
    """
    feats = encoder_forward(params, images, cfg)
    logits, new_stats = decode_head_train(params, feats, cfg)
    logits = _resize_bilinear(logits, labels.shape[1:3])
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    return loss, new_stats


def make_train_step(cfg: SegFormerConfig, optimizer):
    """Jitted (params, opt_state, images, labels) -> (params, opt_state, loss).

    The decode-head BN running mean/var ride inside `params` but are *state*,
    not weights: the step re-inserts the batch-stat update in place of any
    gradient step on them (their grads are zeroed by construction — the loss
    uses batch stats, so autodiff never touches the running pair).
    """
    import optax

    def step(params, opt_state, images, labels):
        (loss, new_stats), grads = jax.value_and_grad(segformer_loss, has_aux=True)(
            params, images, labels, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        head_bn = dict(params["head"]["bn"])
        head_bn["mean"], head_bn["var"] = new_stats["mean"], new_stats["var"]
        params = {**params, "head": {**params["head"], "bn": head_bn}}
        return params, opt_state, loss

    return jax.jit(step)


# ---------------------------------------------------------------------------
# synthetic layout pages (stand-in for DocLayNet; lets the loop run and be
# tested without the external dataset)
# ---------------------------------------------------------------------------

_SYNTH_CLASSES = (10, 11, 9, 7, 8)  # Text, Title, Table, Picture, Section-header


def synth_layout_batch(rng: np.random.RandomState, batch: int, size: int = 512,
                       max_regions: int = 5):
    """Random white pages with class-colored regions.

    Regions get a flat ink texture per class (text rows for Text/Title, grid
    lines for Table, noise for Picture) so the model has actual visual signal
    to learn, and the label map marks the exact region rectangle.
    Returns (images (B,S,S,3) float32 normalized like the detector input,
    labels (B,S,S) int32).
    """
    imgs = np.ones((batch, size, size, 3), np.float32)
    labels = np.zeros((batch, size, size), np.int32)
    for b in range(batch):
        for _ in range(rng.randint(1, max_regions + 1)):
            cls = int(_SYNTH_CLASSES[rng.randint(len(_SYNTH_CLASSES))])
            h = rng.randint(size // 16, size // 3)
            w = rng.randint(size // 8, size - 2)
            y = rng.randint(0, size - h)
            x = rng.randint(0, size - w)
            region = imgs[b, y:y + h, x:x + w]
            if cls in (10, 11, 8):  # text-like: dark horizontal stripes
                period = max(h // max(h // 12, 1), 4)
                rows = (np.arange(h) % period) < max(period // 2, 1)
                region[rows] = 0.15 + 0.1 * rng.rand()
            elif cls == 9:  # table: grid lines
                region[::16, :] = 0.1
                region[:, ::32] = 0.1
            else:  # picture: noise patch
                region[:] = rng.rand(h, w, 1) * 0.8
            labels[b, y:y + h, x:x + w] = cls
    # detector input normalization: (x - 0.5) / 0.5
    return (imgs - 0.5) / 0.5, labels


# ---------------------------------------------------------------------------
# fine-tune loop
# ---------------------------------------------------------------------------


def finetune(params=None, cfg: SegFormerConfig | None = None, *, steps: int = 100,
             batch_size: int = 4, image_size: int = 512, lr: float = 6e-5, seed: int = 0,
             data_iter=None, log_every: int = 10):
    """Fine-tune (or train from scratch when params is None) on layout pages.

    `data_iter`: optional iterator of (images, labels) numpy batches — pass
    a real DocLayNet pipeline here; defaults to the synthetic generator.
    lr 6e-5 is the HF semantic-segmentation fine-tune default.
    Returns (params, losses).
    """
    import optax

    cfg = cfg or SegFormerConfig()
    if params is None:
        params = segformer_init(jax.random.PRNGKey(seed), cfg)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(cfg, optimizer)
    rng = np.random.RandomState(seed)
    if data_iter is None:
        def gen():
            while True:
                yield synth_layout_batch(rng, batch_size, image_size)
        data_iter = gen()

    losses = []
    for i in range(steps):
        images, labels = next(data_iter)
        params, opt_state, loss = step_fn(params, opt_state, jnp.asarray(images), jnp.asarray(labels))
        losses.append(float(loss))
        if (i + 1) % log_every == 0:
            logger.info("layout train step %d/%d loss %.4f", i + 1, steps, losses[-1])
    return params, losses


def flatten_params(tree, prefix: str = "") -> dict:
    """Pytree -> flat {slash/path: np.ndarray}; lists use numeric segments."""
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(flatten_params(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def unflatten_params(flat: dict, template):
    """Inverse of `flatten_params` against a same-structure template pytree."""
    def rebuild(node, prefix=""):
        if isinstance(node, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(node)]
        return jnp.asarray(flat[prefix[:-1]])

    return rebuild(template)


def main(argv=None) -> int:
    """`python -m khmer_ocr_tpu.detection.train` — runnable fine-tune demo."""
    import argparse

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s",
                        datefmt="%H:%M:%S")
    p = argparse.ArgumentParser(description="Fine-tune the SegFormer layout model")
    p.add_argument("--hf-checkpoint", type=str, default=None,
                   help="HF checkpoint dir to start from (default: random init)")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--lr", type=float, default=6e-5)
    p.add_argument("--out", type=str, default="layout_params.npz")
    args = p.parse_args(argv)

    params, cfg = None, SegFormerConfig(num_labels=LayoutConfig().num_labels)
    if args.hf_checkpoint:
        from .segformer import load_hf_checkpoint

        params, cfg = load_hf_checkpoint(args.hf_checkpoint)
    params, losses = finetune(params, cfg, steps=args.steps, batch_size=args.batch_size,
                              image_size=args.image_size, lr=args.lr)
    flat = flatten_params(params)
    np.savez(args.out, **flat)
    logger.info("saved %d arrays -> %s (final loss %.4f)", len(flat), args.out, losses[-1])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
