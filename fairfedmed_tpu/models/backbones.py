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
    fan_in = cin * k * k
    return jax.random.normal(key, (cout, cin, k, k)) * (2.0 / fan_in) ** 0.5


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

def _resnet(block_counts: Sequence[int], bottleneck: bool):
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

    def apply(params, stats, x, train):
        conv, bn = params["conv"], params["bn"]
        new_stats = {}
        y, new_stats["bn1"] = _bn(bn["bn1"], stats["bn1"],
                                  _conv(x, conv["conv1"], 2, 3), train)
        y = jax.nn.relu(y)
        y = _max_pool(y, 3, 2, 1)
        for li, nblocks in enumerate(block_counts):
            lname = f"layer{li + 1}"
            new_stats[lname] = []
            for bi in range(nblocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                y, ns = block_apply(conv[lname][bi], bn[lname][bi],
                                    stats[lname][bi], y, stride, train)
                new_stats[lname].append(ns)
        return y.mean((2, 3)), new_stats

    return init, apply, out_features


for _name, _counts, _bneck in (
    ("resnet18", (2, 2, 2, 2), False),
    ("resnet34", (3, 4, 6, 3), False),
    ("resnet50", (3, 4, 6, 3), True),
):
    BACKBONE_REGISTRY[_name] = functools.partial(_resnet, _counts, _bneck)


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
