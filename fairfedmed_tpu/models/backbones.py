"""Backbone + head registries for the Baseline (SimpleNet) trainer.

Capability match of Dassl's modeling registries
(``Dassl/dassl/engine/trainer.py:48-105`` SimpleNet,
``Dassl/dassl/modeling/backbone/build.py`` + ``backbone/resnet.py``,
``head/mlp.py``), in functional JAX form: a backbone is a pair of pure
functions —

``init(rng) -> (params, stats)`` and
``apply(params, stats, x, train) -> (features, new_stats)``

with BatchNorm running statistics threaded explicitly (TPU-native: the whole
train step stays one jitted program; no module state).  ``x`` is NCHW fp32 in
[0, 1].  Pretrained torchvision weights are not available offline — backbones
random-init and the Baseline trainer prints a notice when
``MODEL.BACKBONE.PRETRAINED`` is requested.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.1
BN_EPS = 1e-5

BACKBONE_REGISTRY = {}
HEAD_REGISTRY = {}


def register_backbone(name):
    def deco(fn):
        BACKBONE_REGISTRY[name] = fn
        return fn
    return deco


def build_backbone(name: str):
    """Returns (init, apply, out_features) for a registered backbone."""
    if name not in BACKBONE_REGISTRY:
        raise KeyError(f"backbone {name!r} not registered; "
                       f"available: {sorted(BACKBONE_REGISTRY)}")
    return BACKBONE_REGISTRY[name]()


# --------------------------------------------------------------------------- #
# functional primitives
# --------------------------------------------------------------------------- #

def _conv_init(key, cout, cin, k):
    # kaiming_normal_(mode='fan_out') like the reference ResNet._init_params
    # (resnet.py:171-178): std = sqrt(2 / (cout*k*k)).  fan_in mode is off by
    # sqrt(cout/cin) on every channel-changing conv.
    fan_out = cout * k * k
    return jax.random.normal(key, (cout, cin, k, k)) * (2.0 / fan_out) ** 0.5


def _bn_init(dim):
    return ({"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
            {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))})


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _bn(bn, stat, x, train):
    """Functional BatchNorm2d with torch momentum semantics."""
    x32 = x.astype(jnp.float32)
    if train:
        mean = x32.mean(axis=(0, 2, 3))
        var = x32.var(axis=(0, 2, 3))
        n = x32.shape[0] * x32.shape[2] * x32.shape[3]
        new_stat = {
            "mean": (1 - BN_MOMENTUM) * stat["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * stat["var"]
                   + BN_MOMENTUM * var * n / max(n - 1, 1),
        }
    else:
        mean, var = stat["mean"], stat["var"]
        new_stat = stat
    y = (x32 - mean.reshape(1, -1, 1, 1)) * jax.lax.rsqrt(
        var.reshape(1, -1, 1, 1) + BN_EPS)
    return (y * bn["weight"].reshape(1, -1, 1, 1)
            + bn["bias"].reshape(1, -1, 1, 1)).astype(x.dtype), new_stat


def _max_pool(x, k, stride, padding):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, stride, stride),
        [(0, 0), (0, 0), (padding, padding), (padding, padding)])


# --------------------------------------------------------------------------- #
# torchvision-style ResNets (backbone/resnet.py)
# --------------------------------------------------------------------------- #

def _resnet(block_counts: Sequence[int], bottleneck: bool,
            mix: str | None = None, mix_layers: Sequence[str] = ()):
    """torchvision-style ResNet; ``mix``/``mix_layers`` add MixStyle or EFDMix
    after the named stages (backbone/resnet.py:283-556's ``_ms_l*`` /
    ``_efdmix_l*`` variants).  Mixing activates only when the caller passes an
    ``rng`` to ``apply`` in train mode — the functional analogue of Dassl's
    run_with_mixstyle context (mixstyle.py:37-50): deactivated by default."""
    expansion = 4 if bottleneck else 1
    out_features = 512 * expansion

    def init(rng):
        keys = iter(jax.random.split(rng, 256))
        params = {"conv1": _conv_init(next(keys), 64, 3, 7)}
        bn, stats = {}, {}
        bn["bn1"], stats["bn1"] = _bn_init(64)
        inplanes = 64
        for li, nblocks in enumerate(block_counts):
            planes = 64 * (2 ** li)
            blocks_p, blocks_b, blocks_s = [], [], []
            for bi in range(nblocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                if bottleneck:
                    p = {"conv1": _conv_init(next(keys), planes, inplanes, 1),
                         "conv2": _conv_init(next(keys), planes, planes, 3),
                         "conv3": _conv_init(next(keys), planes * 4, planes, 1)}
                    dims = (planes, planes, planes * 4)
                else:
                    p = {"conv1": _conv_init(next(keys), planes, inplanes, 3),
                         "conv2": _conv_init(next(keys), planes, planes, 3)}
                    dims = (planes, planes)
                b, s = {}, {}
                for i, dim in enumerate(dims, start=1):
                    b[f"bn{i}"], s[f"bn{i}"] = _bn_init(dim)
                if stride != 1 or inplanes != planes * expansion:
                    p["downsample"] = _conv_init(
                        next(keys), planes * expansion, inplanes, 1)
                    b["downsample_bn"], s["downsample_bn"] = _bn_init(
                        planes * expansion)
                blocks_p.append(p)
                blocks_b.append(b)
                blocks_s.append(s)
                inplanes = planes * expansion
            params[f"layer{li + 1}"] = blocks_p
            bn[f"layer{li + 1}"] = blocks_b
            stats[f"layer{li + 1}"] = blocks_s
        return {"conv": params, "bn": bn}, stats

    def block_apply(p, b, s, x, stride, train):
        new_s = {}
        if bottleneck:
            y, new_s["bn1"] = _bn(b["bn1"], s["bn1"], _conv(x, p["conv1"]), train)
            y = jax.nn.relu(y)
            y, new_s["bn2"] = _bn(b["bn2"], s["bn2"],
                                  _conv(y, p["conv2"], stride, 1), train)
            y = jax.nn.relu(y)
            y, new_s["bn3"] = _bn(b["bn3"], s["bn3"], _conv(y, p["conv3"]), train)
        else:
            y, new_s["bn1"] = _bn(b["bn1"], s["bn1"],
                                  _conv(x, p["conv1"], stride, 1), train)
            y = jax.nn.relu(y)
            y, new_s["bn2"] = _bn(b["bn2"], s["bn2"],
                                  _conv(y, p["conv2"], 1, 1), train)
        if "downsample" in p:
            sc, new_s["downsample_bn"] = _bn(
                b["downsample_bn"], s["downsample_bn"],
                _conv(x, p["downsample"], stride), train)
        else:
            sc = x
        return jax.nn.relu(y + sc), new_s

    def apply(params, stats, x, train, rng=None):
        conv, bn = params["conv"], params["bn"]
        new_stats = {}
        y, new_stats["bn1"] = _bn(bn["bn1"], stats["bn1"],
                                  _conv(x, conv["conv1"], 2, 3), train)
        y = jax.nn.relu(y)
        y = _max_pool(y, 3, 2, 1)
        mix_rngs = {}
        if mix is not None and rng is not None and train:
            for name, key in zip(mix_layers,
                                 jax.random.split(rng, len(mix_layers))):
                mix_rngs[name] = key
        for li, nblocks in enumerate(block_counts):
            lname = f"layer{li + 1}"
            new_stats[lname] = []
            for bi in range(nblocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                y, ns = block_apply(conv[lname][bi], bn[lname][bi],
                                    stats[lname][bi], y, stride, train)
                new_stats[lname].append(ns)
            if lname in mix_rngs:
                from ..ops import dassl as _dassl
                mix_fn = _dassl.mixstyle if mix == "mixstyle" else _dassl.efdmix
                y = mix_fn(mix_rngs[lname], y, p=0.5, alpha=0.1)
        return y.mean((2, 3)), new_stats

    return init, apply, out_features


for _name, _counts, _bneck in (
    ("resnet18", (2, 2, 2, 2), False),
    ("resnet34", (3, 4, 6, 3), False),
    ("resnet50", (3, 4, 6, 3), True),
    ("resnet101", (3, 4, 23, 3), True),
    ("resnet152", (3, 8, 36, 3), True),
):
    BACKBONE_REGISTRY[_name] = functools.partial(_resnet, _counts, _bneck)

# MixStyle / EFDMix stage variants (backbone/resnet.py:283-556).
_MIX_STAGES = {"l123": ("layer1", "layer2", "layer3"),
               "l12": ("layer1", "layer2"),
               "l1": ("layer1",)}
for _base, _counts, _bneck in (("resnet18", (2, 2, 2, 2), False),
                               ("resnet50", (3, 4, 6, 3), True),
                               ("resnet101", (3, 4, 23, 3), True)):
    for _mix, _tag in (("mixstyle", "ms"), ("efdmix", "efdmix")):
        for _suffix, _stages in _MIX_STAGES.items():
            BACKBONE_REGISTRY[f"{_base}_{_tag}_{_suffix}"] = functools.partial(
                _resnet, _counts, _bneck, _mix, _stages)


# --------------------------------------------------------------------------- #
# timm-style ViT (backbone/models_vit.py)
# --------------------------------------------------------------------------- #


@register_backbone("vit_base_patch16")
def _vit_base_patch16(image_size: int = 224, depth: int = 12,
                      width: int = 768, heads: int = 12):
    """ViT-B/16 with global average pooling + fc_norm
    (models_vit.py:26-83's MAE-style VisionTransformer).

    Pretrained MAE weights point at a hardcoded local path in the reference
    and are unavailable offline; random init, like the other backbones here.
    Blocks are stacked and scanned — one compiled block program regardless of
    depth, the same trick as models/clip_model.py's encoder.
    """
    patch = 16
    n_tok = (image_size // patch) ** 2 + 1
    head_dim = width // heads

    def init(rng):
        ks = jax.random.split(rng, 8)

        def tnorm(key, shape, std):
            return std * jax.random.truncated_normal(key, -2.0, 2.0, shape)

        def block_leaf(key, shape, fan_in):
            return jax.random.normal(key, shape) * (2.0 / fan_in) ** 0.5

        bk = jax.random.split(ks[3], 8 * depth).reshape(depth, 8, 2)
        blocks = {
            "ln1_w": jnp.ones((depth, width)), "ln1_b": jnp.zeros((depth, width)),
            "qkv_w": jax.vmap(lambda k: block_leaf(k, (width, 3 * width), width))(bk[:, 0]),
            "qkv_b": jnp.zeros((depth, 3 * width)),
            "proj_w": jax.vmap(lambda k: block_leaf(k, (width, width), width))(bk[:, 1]),
            "proj_b": jnp.zeros((depth, width)),
            "ln2_w": jnp.ones((depth, width)), "ln2_b": jnp.zeros((depth, width)),
            "fc1_w": jax.vmap(lambda k: block_leaf(k, (width, 4 * width), width))(bk[:, 2]),
            "fc1_b": jnp.zeros((depth, 4 * width)),
            "fc2_w": jax.vmap(lambda k: block_leaf(k, (4 * width, width), 4 * width))(bk[:, 3]),
            "fc2_b": jnp.zeros((depth, width)),
        }
        params = {
            "patch_w": block_leaf(ks[0], (width, 3, patch, patch), 3 * patch * patch),
            "patch_b": jnp.zeros((width,)),
            "cls": tnorm(ks[1], (1, 1, width), 0.02),
            "pos": tnorm(ks[2], (1, n_tok, width), 0.02),
            "blocks": blocks,
            "fc_norm_w": jnp.ones((width,)), "fc_norm_b": jnp.zeros((width,)),
        }
        return params, {}

    def ln(x, w, b, eps=1e-6):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        return (((x32 - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)

    def block(x, bp):
        h = ln(x, bp["ln1_w"], bp["ln1_b"])
        qkv = h @ bp["qkv_w"] + bp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b_, t, _ = q.shape

        def heads_split(a):
            return a.reshape(b_, t, heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        att = jax.nn.softmax(
            (q @ k.transpose(0, 1, 3, 2)) / head_dim ** 0.5, axis=-1)
        h = (att @ v).transpose(0, 2, 1, 3).reshape(b_, t, width)
        x = x + h @ bp["proj_w"] + bp["proj_b"]
        h = ln(x, bp["ln2_w"], bp["ln2_b"])
        h = jax.nn.gelu(h @ bp["fc1_w"] + bp["fc1_b"]) @ bp["fc2_w"] + bp["fc2_b"]
        return x + h

    def apply(params, stats, x, train):
        y = jax.lax.conv_general_dilated(
            x, params["patch_w"].astype(x.dtype), (patch, patch), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        b_ = y.shape[0]
        y = y.reshape(b_, width, -1).transpose(0, 2, 1) + params["patch_b"]
        cls = jnp.broadcast_to(params["cls"].astype(y.dtype), (b_, 1, width))
        y = jnp.concatenate([cls, y], axis=1) + params["pos"].astype(y.dtype)

        def body(carry, bp):
            return block(carry, bp), None

        y, _ = jax.lax.scan(body, y, params["blocks"])
        pooled = y[:, 1:, :].mean(axis=1)  # global pool without cls token
        return ln(pooled, params["fc_norm_w"], params["fc_norm_b"]), stats

    return init, apply, width


@register_backbone("cnn3")
def _cnn3():
    """Compact 3-conv net (CIFAR-scale default when no backbone is named)."""
    w = 64

    def init(rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        return {"conv1": _conv_init(k1, w, 3, 3),
                "conv2": _conv_init(k2, 2 * w, w, 3),
                "conv3": _conv_init(k3, 4 * w, 2 * w, 3)}, {}

    def apply(params, stats, x, train):
        for name in ("conv1", "conv2", "conv3"):
            x = jax.nn.relu(_conv(x, params[name], stride=2, padding=1))
        return x.mean((2, 3)), stats

    return init, apply, 4 * w


# --------------------------------------------------------------------------- #
# heads (head/mlp.py)
# --------------------------------------------------------------------------- #

def build_head(name: str, in_features: int, hidden_layers: Sequence[int],
               activation: str = "relu", bn: bool = True, dropout: float = 0.0):
    """MLP head: Linear (+BN1d) + activation per hidden layer.  Dropout is a
    no-op (Baseline defaults it to 0; stochastic eval parity not needed)."""
    if name != "mlp":
        raise KeyError(f"head {name!r} not registered; available: ['mlp']")
    hidden = [int(h) for h in hidden_layers]
    act = {"relu": jax.nn.relu, "leaky_relu": jax.nn.leaky_relu,
           "gelu": jax.nn.gelu}[activation]

    def init(rng):
        params, stats = [], []
        dims = [in_features] + hidden
        keys = jax.random.split(rng, len(hidden))
        for k, din, dout in zip(keys, dims[:-1], dims[1:]):
            layer = {"weight": jax.random.normal(k, (dout, din)) * (2.0 / din) ** 0.5,
                     "bias": jnp.zeros((dout,))}
            if bn:
                bn_p, bn_s = _bn_init(dout)
                layer["bn"] = bn_p
                stats.append(bn_s)
            else:
                stats.append({})
            params.append(layer)
        return params, stats

    def apply(params, stats, x, train):
        new_stats = []
        for layer, s in zip(params, stats):
            x = x @ layer["weight"].T + layer["bias"]
            if "bn" in layer:
                x32 = x.astype(jnp.float32)
                if train:
                    mean, var = x32.mean(0), x32.var(0)
                    n = x32.shape[0]
                    s = {"mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
                         "var": (1 - BN_MOMENTUM) * s["var"]
                                + BN_MOMENTUM * var * n / max(n - 1, 1)}
                else:
                    mean, var = s["mean"], s["var"]
                x = ((x32 - mean) * jax.lax.rsqrt(var + BN_EPS)
                     * layer["bn"]["weight"] + layer["bn"]["bias"]).astype(x.dtype)
            new_stats.append(s)
            x = act(x)
        return x, new_stats

    out_features = hidden[-1] if hidden else in_features
    return init, apply, out_features
