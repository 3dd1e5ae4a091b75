"""CNN feature extractors in NHWC layout: SE-VGG (proposed), VGG, ResNet.

Reference architectures:
  * SE-VGG  — ``ImprovedFeatureExtractor`` se_model.py:35-79 (7 conv blocks with
    BN+ReLU, 1D squeeze-excitation after conv4/conv6/conv7, pools 2x2, 2x2,
    (2,1), (2,1), AdaptiveAvgPool2d((2,32)) tail).
  * VGG     — vgg_model.py:5-59 (same trail, no SE; conv7 is a *plain* conv with
    no BN/ReLU).
  * ResNet  — resnet_model.py:5-91 (stem + BasicBlock stages 1x128, 2x256,
    2x512, 1x512 with projection shortcuts, same pool schedule).

All functions are pure: ``apply`` takes (params, batch_stats, x, train) and
returns (features, new_batch_stats). A (B, 48, 100, 1) chunk maps to
(B, 2, 32, 512). NHWC + HWIO is the TPU-native layout (channels on the lane
dimension); BN is folded into scale/shift at trace time for inference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.adaptive_pool import adaptive_avg_pool2d

BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch default


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def conv2d(p, x, stride=(1, 1), padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def batch_norm(p, s, x, train: bool):
    """BatchNorm2d over NHWC. Returns (y, new_stats).

    Training uses biased batch variance for normalization and unbiased variance
    for the running update (torch semantics), momentum 0.1.
    """
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_s = {
            "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = s["mean"].astype(x.dtype), s["var"].astype(x.dtype)
        new_s = s
    inv = jax.lax.rsqrt(var + BN_EPS) * p["scale"].astype(x.dtype)
    return (x - mean) * inv + p["bias"].astype(x.dtype), new_s


def max_pool(x, window, stride):
    return jax.lax.reduce_window(
        x,
        -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
        jax.lax.max,
        (1, window[0], window[1], 1),
        (1, stride[0], stride[1], 1),
        "VALID",
    )


def se_block(p, x):
    """1D squeeze-excitation (SequenceSE, se_model.py:8-30): pool over height only
    so the width/sequence axis survives; per-column channel gates."""
    y = jnp.mean(x, axis=1)  # (B, W, C)
    y = jax.nn.relu(y @ p["fc1"]["w"].astype(x.dtype) + p["fc1"]["b"].astype(x.dtype))
    y = jax.nn.sigmoid(y @ p["fc2"]["w"].astype(x.dtype) + p["fc2"]["b"].astype(x.dtype))
    return x * y[:, None, :, :]


def conv_bn_relu(p, s, name, x, train, new_stats):
    x = conv2d(p[name], x)
    x, new_stats[f"bn_{name}"] = batch_norm(p[f"bn_{name}"], s[f"bn_{name}"], x, train)
    return jax.nn.relu(x)


# ---------------------------------------------------------------------------
# SE-VGG (proposed)
# ---------------------------------------------------------------------------

SE_VGG_CHANNELS = [(1, 64), (64, 128), (128, 256), (256, 256), (256, 512), (512, 512), (512, 512)]


def se_vgg_apply(p, s, x, train: bool = False):
    ns = {}
    x = conv_bn_relu(p, s, "conv1", x, train, ns)
    x = max_pool(x, (2, 2), (2, 2))
    x = conv_bn_relu(p, s, "conv2", x, train, ns)
    x = max_pool(x, (2, 2), (2, 2))
    x = conv_bn_relu(p, s, "conv3", x, train, ns)
    x = conv_bn_relu(p, s, "conv4", x, train, ns)
    x = se_block(p["se3"], x)
    x = max_pool(x, (2, 1), (2, 1))
    x = conv_bn_relu(p, s, "conv5", x, train, ns)
    x = conv_bn_relu(p, s, "conv6", x, train, ns)
    x = se_block(p["se4"], x)
    x = max_pool(x, (2, 1), (2, 1))
    x = conv_bn_relu(p, s, "conv7", x, train, ns)
    x = se_block(p["se5"], x)
    x = adaptive_avg_pool2d(x, (2, 32))
    return x, ns


# ---------------------------------------------------------------------------
# VGG baseline
# ---------------------------------------------------------------------------


def vgg_apply(p, s, x, train: bool = False):
    ns = {}
    x = conv_bn_relu(p, s, "conv1", x, train, ns)
    x = max_pool(x, (2, 2), (2, 2))
    x = conv_bn_relu(p, s, "conv2", x, train, ns)
    x = max_pool(x, (2, 2), (2, 2))
    x = conv_bn_relu(p, s, "conv3", x, train, ns)
    x = conv_bn_relu(p, s, "conv4", x, train, ns)
    x = max_pool(x, (2, 1), (2, 1))
    x = conv_bn_relu(p, s, "conv5", x, train, ns)
    x = conv_bn_relu(p, s, "conv6", x, train, ns)
    x = max_pool(x, (2, 1), (2, 1))
    x = conv2d(p["conv7"], x)  # plain conv, no BN/ReLU (vgg_model.py:46)
    x = adaptive_avg_pool2d(x, (2, 32))
    return x, ns


# ---------------------------------------------------------------------------
# ResNet baseline
# ---------------------------------------------------------------------------

RESNET_STAGES = [(64, 128, 1), (128, 256, 2), (256, 512, 2), (512, 512, 1)]


def basic_block_apply(p, s, x, train: bool):
    ns = {}
    out = conv2d(p["conv1"], x)
    out, ns["bn1"] = batch_norm(p["bn1"], s["bn1"], out, train)
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out)
    out, ns["bn2"] = batch_norm(p["bn2"], s["bn2"], out, train)
    if "short_conv" in p:
        sc = conv2d(p["short_conv"], x)
        sc, ns["short_bn"] = batch_norm(p["short_bn"], s["short_bn"], sc, train)
    else:
        sc = x
    return jax.nn.relu(out + sc), ns


def resnet_apply(p, s, x, train: bool = False):
    ns = {}
    x = conv2d(p["stem_conv"], x)
    x, ns["stem_bn"] = batch_norm(p["stem_bn"], s["stem_bn"], x, train)
    x = jax.nn.relu(x)
    x = max_pool(x, (2, 2), (2, 2))
    pools = [((2, 2), (2, 2)), ((2, 1), (2, 1)), ((2, 1), (2, 1)), None]
    for stage_i, (_, _, n_blocks) in enumerate(RESNET_STAGES):
        ns_stage = []
        for b in range(n_blocks):
            x, bs = basic_block_apply(p[f"layer{stage_i + 1}"][b], s[f"layer{stage_i + 1}"][b], x, train)
            ns_stage.append(bs)
        ns[f"layer{stage_i + 1}"] = ns_stage
        if pools[stage_i] is not None:
            x = max_pool(x, *pools[stage_i])
    x = adaptive_avg_pool2d(x, (2, 32))
    return x, ns


BACKBONE_APPLY = {"se_vgg": se_vgg_apply, "vgg": vgg_apply, "resnet": resnet_apply}


# ---------------------------------------------------------------------------
# initializers (torch-default-matching)
# ---------------------------------------------------------------------------


def conv_init(rng, kh, kw, cin, cout, bias=True):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    kwk, kb = jax.random.split(rng)
    fan_in = cin * kh * kw
    bound = 1.0 / np.sqrt(fan_in)
    p = {"w": jax.random.uniform(kwk, (kh, kw, cin, cout), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return p


def bn_init(c):
    return (
        {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)},
        {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)},
    )


def se_init(rng, c, reduction=16):
    k1, k2 = jax.random.split(rng)
    # torch Conv1d k=1 default init: U(+-1/sqrt(fan_in)), fan_in = cin * 1
    def lin(k, cin, cout):
        ka, kb = jax.random.split(k)
        bound = 1.0 / np.sqrt(cin)
        return {
            "w": jax.random.uniform(ka, (cin, cout), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
        }

    return {"fc1": lin(k1, c, c // reduction), "fc2": lin(k2, c // reduction, c)}


def se_vgg_init(rng):
    p, s = {}, {}
    keys = jax.random.split(rng, 16)
    for i, (cin, cout) in enumerate(SE_VGG_CHANNELS):
        name = f"conv{i + 1}"
        p[name] = conv_init(keys[i], 3, 3, cin, cout)
        p[f"bn_{name}"], s[f"bn_{name}"] = bn_init(cout)
    p["se3"] = se_init(keys[8], 256)
    p["se4"] = se_init(keys[9], 512)
    p["se5"] = se_init(keys[10], 512)
    return p, s


def vgg_init(rng):
    p, s = {}, {}
    keys = jax.random.split(rng, 8)
    for i, (cin, cout) in enumerate(SE_VGG_CHANNELS):
        name = f"conv{i + 1}"
        p[name] = conv_init(keys[i], 3, 3, cin, cout)
        if i < 6:  # conv7 has no BN in the VGG baseline
            p[f"bn_{name}"], s[f"bn_{name}"] = bn_init(cout)
    return p, s


def basic_block_init(rng, cin, cout):
    k1, k2, k3 = jax.random.split(rng, 3)
    p = {"conv1": conv_init(k1, 3, 3, cin, cout, bias=False), "conv2": conv_init(k2, 3, 3, cout, cout, bias=False)}
    s = {}
    p["bn1"], s["bn1"] = bn_init(cout)
    p["bn2"], s["bn2"] = bn_init(cout)
    if cin != cout:
        p["short_conv"] = conv_init(k3, 1, 1, cin, cout, bias=False)
        p["short_bn"], s["short_bn"] = bn_init(cout)
    return p, s


def resnet_init(rng):
    p, s = {}, {}
    keys = jax.random.split(rng, 8)
    p["stem_conv"] = conv_init(keys[0], 3, 3, 1, 64, bias=False)
    p["stem_bn"], s["stem_bn"] = bn_init(64)
    for stage_i, (cin, cout, n_blocks) in enumerate(RESNET_STAGES):
        blocks_p, blocks_s = [], []
        bkeys = jax.random.split(keys[stage_i + 1], n_blocks)
        c = cin
        for b in range(n_blocks):
            bp, bs = basic_block_init(bkeys[b], c, cout)
            blocks_p.append(bp)
            blocks_s.append(bs)
            c = cout
        p[f"layer{stage_i + 1}"] = blocks_p
        s[f"layer{stage_i + 1}"] = blocks_s
    return p, s


BACKBONE_INIT = {"se_vgg": se_vgg_init, "vgg": vgg_init, "resnet": resnet_init}
