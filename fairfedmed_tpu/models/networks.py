"""DDAIG perturbation networks (Dassl legacy), functional JAX form.

Capability match of ``Dassl/dassl/modeling/network/ddaig_fcn.py`` (SURVEY
§2.8): the FCN perturbation generator (reflection-padded resnet blocks,
instance norm, global-context fusion, tanh regression head) and its
spatial-transformer variant (LocNet → affine grid → bilinear sample).

TPU-native redesign:
- nn.Module graphs become ``init(rng) -> (params, stats)`` /
  ``apply(params, stats, x, train, lmda) -> (x_p, p, new_stats)`` pure
  functions, matching models/backbones.py's convention.
- ``F.affine_grid`` + ``F.grid_sample`` are reimplemented as vectorized
  gather+lerp (``_affine_grid``/``_grid_sample``), static shapes throughout so
  the whole generator jits into the trainer step.
- Instance norm (affine=False, no running stats) is a pure per-sample
  normalize; only LocNet's BatchNorms carry running statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .backbones import _bn, _bn_init, _conv, _max_pool

NETWORK_REGISTRY = {}


def register_network(name):
    def deco(fn):
        NETWORK_REGISTRY[name] = fn
        return fn
    return deco


def build_network(name: str, **kwargs):
    """Returns (init, apply) for a registered network (build.py:9-17)."""
    if name not in NETWORK_REGISTRY:
        raise KeyError(f"network {name!r} not registered; "
                       f"available: {sorted(NETWORK_REGISTRY)}")
    return NETWORK_REGISTRY[name](**kwargs)


# --------------------------------------------------------------------------- #
# primitives
# --------------------------------------------------------------------------- #


def _normal_conv_init(key, cout, cin, k, gain=0.02):
    """init_network_weights(init_type='normal', gain=0.02) — ddaig_fcn.py:12-42."""
    return gain * jax.random.normal(key, (cout, cin, k, k))


def _instance_norm(x, eps=1e-5):
    """InstanceNorm2d(affine=False, track_running_stats=False)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(2, 3), keepdims=True)
    var = x32.var(axis=(2, 3), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _reflect_pad(x, p=1):
    return jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p)), mode="reflect")


def _affine_grid(theta, h, w):
    """F.affine_grid(theta, (N,C,H,W), align_corners=False) equivalent.

    Returns normalized sampling coords (N, H, W, 2) as (x, y) in [-1, 1].
    """
    xs = (2 * jnp.arange(w) + 1) / w - 1
    ys = (2 * jnp.arange(h) + 1) / h - 1
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)  # (H*W, 3)
    out = jnp.einsum("nij,pj->npi", theta.astype(jnp.float32), base)
    return out.reshape(theta.shape[0], h, w, 2)


def _grid_sample(x, grid):
    """F.grid_sample(x, grid, mode='bilinear', padding_mode='zeros',
    align_corners=False) equivalent; grid holds (x, y) in [-1, 1]."""
    n, c, h, w = x.shape
    x32 = x.astype(jnp.float32)
    ix = ((grid[..., 0] + 1) * w - 1) / 2
    iy = ((grid[..., 1] + 1) * h - 1) / 2
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    results = 0.0
    for dx, wx in ((0, x0 + 1 - ix), (1, ix - x0)):
        for dy, wy in ((0, y0 + 1 - iy), (1, iy - y0)):
            xi = x0 + dx
            yi = y0 + dy
            valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            # gather per-sample pixels: (N, C, H, W) indexed at (N, H', W')
            vals = jax.vmap(lambda img, yy, xx: img[:, yy, xx])(x32, yc, xc)
            results = results + vals * (wx * wy * valid)[:, None]
    return results.astype(x.dtype)


# --------------------------------------------------------------------------- #
# resnet block (ddaig_fcn.py:61-112)
# --------------------------------------------------------------------------- #


def _resblock_init(keys, dim, norm):
    p = {"conv1": _normal_conv_init(keys[0], dim, dim, 3),
         "conv2": _normal_conv_init(keys[1], dim, dim, 3)}
    s = {}
    if norm == "batch":
        p["bn1"], s["bn1"] = _bn_init(dim)
        p["bn2"], s["bn2"] = _bn_init(dim)
        # init_network_weights sets BN weight=1, bias=0 — already the default
    return p, s


def _resblock_apply(p, s, x, train, norm, padding_type):
    def norm_fn(name, y, new_s):
        if norm == "instance":
            return _instance_norm(y), new_s
        y, new_s[name] = _bn(p[name], s[name], y, train)
        return y, new_s

    def pad_conv(y, wname):
        if padding_type == "reflect":
            return _conv(_reflect_pad(y), p[wname])
        return _conv(y, p[wname], padding=1)  # "zero"

    new_s = {}
    y, new_s = norm_fn("bn1", pad_conv(x, "conv1"), new_s)
    y = jax.nn.relu(y)
    y, new_s = norm_fn("bn2", pad_conv(y, "conv2"), new_s)
    return x + y, new_s


# --------------------------------------------------------------------------- #
# LocNet (ddaig_fcn.py:115-160)
# --------------------------------------------------------------------------- #


def _locnet_init(rng, input_nc, nc, n_blocks, image_size):
    keys = iter(jax.random.split(rng, 2 + 2 * n_blocks))
    params = {"conv1": _normal_conv_init(next(keys), nc, input_nc, 3)}
    stats = {}
    params["bn1"], stats["bn1"] = _bn_init(nc)
    params["blocks"], stats["blocks"] = [], []
    for _ in range(n_blocks):
        p, s = _resblock_init([next(keys), next(keys)], nc, "batch")
        params["blocks"].append(p)
        stats["blocks"].append(s)
    reduced = int(image_size * 0.5 ** (n_blocks + 1))
    # init_loc_layer (ddaig_fcn.py:240-246): identity transform
    params["fc_loc"] = {"weight": jnp.zeros((4, nc * reduced ** 2)),
                        "bias": jnp.array([1.0, 0.0, 0.0, 1.0])}
    return params, stats


def _locnet_apply(params, stats, x, train):
    new_stats = {}
    y, new_stats["bn1"] = _bn(params["bn1"], stats["bn1"],
                              _conv(x, params["conv1"], stride=2, padding=1),
                              train)
    y = jax.nn.relu(y)
    new_stats["blocks"] = []
    for p, s in zip(params["blocks"], stats["blocks"]):
        y, ns = _resblock_apply(p, s, y, train, "batch", "zero")
        new_stats["blocks"].append(ns)
        y = _max_pool(y, 2, 2, 0)
    y = y.reshape(y.shape[0], -1)
    y = jnp.tanh(y @ params["fc_loc"]["weight"].T + params["fc_loc"]["bias"])
    a = y.reshape(-1, 2, 2)
    # theta: (N, 2, 3), translation column zero (ddaig_fcn.py:152-159)
    theta = jnp.concatenate([a, jnp.zeros((a.shape[0], 2, 1), a.dtype)], axis=2)
    return theta, new_stats


# --------------------------------------------------------------------------- #
# FCN (ddaig_fcn.py:163-279)
# --------------------------------------------------------------------------- #


def _fcn(input_nc=3, output_nc=3, nc=32, n_blocks=3, norm="instance",
         padding_type="reflect", gctx=True, stn=False, image_size=32):
    def init(rng):
        keys = iter(jax.random.split(rng, 8 + 2 * n_blocks))
        params = {"conv1": _normal_conv_init(next(keys), nc, input_nc, 3)}
        stats = {}
        if norm == "batch":
            params["bn1"], stats["bn1"] = _bn_init(nc)
        params["blocks"], stats["blocks"] = [], []
        for _ in range(n_blocks):
            p, s = _resblock_init([next(keys), next(keys)], nc, norm)
            params["blocks"].append(p)
            stats["blocks"].append(s)
        if gctx:
            params["gctx"] = _normal_conv_init(next(keys), nc, 2 * nc, 1)
            if norm == "batch":
                params["gctx_bn"], stats["gctx_bn"] = _bn_init(nc)
        params["regress"] = {
            "weight": _normal_conv_init(next(keys), output_nc, nc, 1),
            "bias": jnp.zeros((output_nc,))}
        if stn:
            params["locnet"], stats["locnet"] = _locnet_init(
                next(keys), input_nc, nc, n_blocks, image_size)
        return params, stats

    def apply(params, stats, x, train=True, lmda=1.0):
        """Returns (x_p, p, new_stats) — the reference's return_p=True form;
        callers wanting only x_p drop p."""
        new_stats = {}
        if "locnet" in params:
            theta, new_stats["locnet"] = _locnet_apply(
                params["locnet"], stats["locnet"], x, train)
            grid = _affine_grid(theta, x.shape[2], x.shape[3])
            x = _grid_sample(x, grid)
        inp = x
        if padding_type == "reflect":
            y = _conv(_reflect_pad(x), params["conv1"])
        else:
            y = _conv(x, params["conv1"], padding=1)
        if norm == "instance":
            y = _instance_norm(y)
        else:
            y, new_stats["bn1"] = _bn(params["bn1"], stats["bn1"], y, train)
        y = jax.nn.relu(y)
        new_stats["blocks"] = []
        for p, s in zip(params["blocks"], stats["blocks"]):
            y, ns = _resblock_apply(p, s, y, train, norm, padding_type)
            new_stats["blocks"].append(ns)
        if "gctx" in params:
            c = y.mean((2, 3), keepdims=True)
            c = jnp.broadcast_to(c, y.shape)
            y = _conv(jnp.concatenate([y, c], axis=1), params["gctx"])
            if norm == "instance":
                y = _instance_norm(y)
            else:
                y, new_stats["gctx_bn"] = _bn(params["gctx_bn"],
                                              stats["gctx_bn"], y, train)
            y = jax.nn.relu(y)
        p_out = jnp.tanh(_conv(y, params["regress"]["weight"])
                         + params["regress"]["bias"].reshape(1, -1, 1, 1))
        x_p = inp + lmda * p_out
        return x_p, p_out, new_stats

    return init, apply


@register_network("fcn_3x32_gctx")
def fcn_3x32_gctx(**kwargs):
    return _fcn(3, 3, nc=32, n_blocks=3, norm="instance")


@register_network("fcn_3x64_gctx")
def fcn_3x64_gctx(**kwargs):
    return _fcn(3, 3, nc=64, n_blocks=3, norm="instance")


@register_network("fcn_3x32_gctx_stn")
def fcn_3x32_gctx_stn(image_size=32, **kwargs):
    return _fcn(3, 3, nc=32, n_blocks=3, norm="instance", stn=True,
                image_size=image_size)


@register_network("fcn_3x64_gctx_stn")
def fcn_3x64_gctx_stn(image_size=224, **kwargs):
    return _fcn(3, 3, nc=64, n_blocks=3, norm="instance", stn=True,
                image_size=image_size)
