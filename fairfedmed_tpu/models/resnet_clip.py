"""CLIP ModifiedResNet image encoder (RN50 family) as pure functions.

Capability match of clip/model.py:11-301 (Bottleneck with anti-aliased strides,
3-conv stem, QKV attention pooling; GLP_OT variant returns all attended tokens
and threads demographic ``attr`` into the 1×1 convs and attention projections).

TPU-native choices:

* convolutions via ``lax.conv_general_dilated`` in the policy compute dtype
  with fp32 accumulation — XLA maps them onto the MXU;
* BatchNorm is functional: affine params live in the TRAINABLE tree (the
  reference unfreezes every BatchNorm2d, GLP_OT_SVLoRA.py:825-827), running
  stats in a separate ``stats`` tree that the train step returns updated;
* FairLoRA on 1×1 convs is a channel-axis einsum with a per-sample singular
  vector — no [HW, B, C] permutes (the reference reshapes through token-major
  layout, GLP_OT_SVLoRA.py:469-480; the math is identical);
* attention pooling with LoRA-materialised projection weights is a plain
  batched einsum attention (replacing F.multi_head_attention_forward with
  per-sample weight matrices — "hard part #5" in SURVEY §7).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..adapters.lora import lora_delta
from ..core.precision import Policy

BN_MOMENTUM = 0.1
BN_EPS = 1e-5
EXPANSION = 4


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224
    width: int = 64

    @property
    def embed_dim(self) -> int:
        return self.width * 32


RN_PRESETS = {
    # random-init fallback only — checkpoints infer their architecture from
    # shapes (converter.infer_rn_config, mirroring clip/model.py:643-656)
    "RN50": ResNetConfig(),
    "RN101": ResNetConfig(layers=(3, 4, 23, 3), output_dim=512),
    "RN50x4": ResNetConfig(layers=(4, 6, 10, 6), output_dim=640, heads=40,
                           input_resolution=288, width=80),
    "RN50x16": ResNetConfig(layers=(6, 8, 18, 8), output_dim=768, heads=48,
                            input_resolution=384, width=96),
    "test-rn": ResNetConfig(layers=(1, 1, 1, 1), output_dim=64, heads=8,
                            input_resolution=32, width=16),
}


# --------------------------------------------------------------------------- #
# functional primitives
# --------------------------------------------------------------------------- #

def conv2d(x, w, stride=1, padding=0, policy: Optional[Policy] = None):
    # No preferred_element_type here: an f32 accumulator output feeds an f32
    # cotangent into the conv transpose rule against bf16 weights, which
    # lax.conv rejects (mixed dtypes) — and TPU convs accumulate in fp32
    # internally for bf16 operands anyway.
    dt = policy.compute_dtype if policy else x.dtype
    return jax.lax.conv_general_dilated(
        x.astype(dt), w.astype(dt),
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def avg_pool(x, k):
    if k <= 1:
        return x
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, k, k), "VALID"
    ) / float(k * k)


def batch_norm(bn, stat, x, train: bool):
    """Functional BatchNorm2d (torch semantics). Returns (y, new_stat)."""
    x32 = x.astype(jnp.float32)
    if train:
        mean = x32.mean(axis=(0, 2, 3))
        var = x32.var(axis=(0, 2, 3))
        n = x32.shape[0] * x32.shape[2] * x32.shape[3]
        unbiased = var * n / max(n - 1, 1)
        new_stat = {
            "mean": (1 - BN_MOMENTUM) * stat["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * stat["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = stat["mean"], stat["var"]
        new_stat = stat
    # fold (mean, var, weight, bias) into one per-channel scale+shift, applied
    # in fp32 with ONE rounding to the input dtype — a BatchNorm fp32 island,
    # like the LayerNorm islands of the ViT tower and like torch's fp16-input
    # cudnn BN (normalize in fp32, round only the output).  Applying in bf16
    # is NOT safe here: x·inv and shift are large near-cancelling terms, so
    # the rounded-operand error is amplified by |mean|/std — per-channel
    # percent-level noise the reference's fp16 path does not have.  (Measured
    # cost of the fp32 apply vs bf16: ~2.5% of the RN50 step.)
    inv = jax.lax.rsqrt(var + BN_EPS) * bn["weight"].astype(jnp.float32)
    shift = bn["bias"].astype(jnp.float32) - mean * inv
    y = x32 * inv.reshape(1, -1, 1, 1) + shift.reshape(1, -1, 1, 1)
    return y.astype(x.dtype), new_stat


def conv1x1_with_lora(x, w, lora, attr_mix, scaling, policy):
    """1×1 conv + FairLoRA channel-space delta (FairLoRALinear.is_1x1_conv
    path, GLP_OT_SVLoRA.py:469-480)."""
    y = conv2d(x, w, policy=policy)
    if lora is not None:
        # rank-r delta in the policy compute dtype (bf16 on TPU — the analogue
        # of the reference's fp16 LoRA matmuls; the MXU accumulates in fp32
        # internally).  At RN50's canonical rank 32 the delta einsums rival
        # the 1×1 conv's own FLOPs, so forcing them to fp32 (half MXU rate)
        # is measurable.  No preferred_element_type: the bf16→f32 mixed-
        # layout einsum is unsupported by the CPU dot thunks.
        dt = policy.compute_dtype if policy else x.dtype
        xc = x.astype(dt)
        a = lora["lora_A"].astype(dt)  # [C_in, r]
        b = lora["lora_B"].astype(dt)  # [r, C_out]
        h = jnp.einsum("bchw,cr->brhw", xc, a)
        from ..adapters.lora import effective_s

        s = effective_s(lora, attr_mix, x.shape[0])
        if s is not None:
            h = h * s.astype(dt)[:, :, None, None]
        dy = jnp.einsum("brhw,ro->bohw", h, b).astype(y.dtype)
        y = y + dy * scaling
    return y


# --------------------------------------------------------------------------- #
# blocks
# --------------------------------------------------------------------------- #

def bottleneck(p, bn, stat, x, stride, train, policy,
               lora=None, attr_mix=None, lora_scaling=0.0):
    """CLIP Bottleneck (clip/model.py:11-60). Returns (y, new_stats)."""
    new_stats = {}
    out = conv1x1_with_lora(x, p["conv1"], None if lora is None else lora.get("conv1"),
                            attr_mix, lora_scaling, policy)
    out, new_stats["bn1"] = batch_norm(bn["bn1"], stat["bn1"], out, train)
    out = jax.nn.relu(out)
    out = conv2d(out, p["conv2"], padding=1, policy=policy)
    out, new_stats["bn2"] = batch_norm(bn["bn2"], stat["bn2"], out, train)
    out = jax.nn.relu(out)
    out = avg_pool(out, stride)
    out = conv1x1_with_lora(out, p["conv3"], None if lora is None else lora.get("conv3"),
                            attr_mix, lora_scaling, policy)
    out, new_stats["bn3"] = batch_norm(bn["bn3"], stat["bn3"], out, train)

    if "downsample" in p:
        identity = avg_pool(x, stride)
        identity = conv2d(identity, p["downsample"], policy=policy)
        identity, new_stats["downsample_bn"] = batch_norm(
            bn["downsample_bn"], stat["downsample_bn"], identity, train)
    else:
        identity = x
    return jax.nn.relu(out + identity), new_stats


def attention_pool(p, x, num_heads, policy, lora=None, attr=None,
                   num_groups=1, lora_scaling=0.0, return_tokens=False):
    """QKV attention pooling (AttentionPool2d, clip/model.py:63-118).

    x: [B, C, H, W].  Returns pooled [B, out] or all tokens [B, HW+1, out].
    With ``lora`` (plain LoRA on q/k/v/c projections — the reference wraps
    attnpool Linears with LoRALinear, GLP_OT_SVLoRA.py:558-561) the adapter
    delta is added to each projection; plain LoRA is sample-independent so the
    batched-weight path of the reference collapses to a single weight update.
    """
    b, c, h, w = x.shape
    t = x.reshape(b, c, h * w).transpose(0, 2, 1)  # [B, HW, C]
    t = jnp.concatenate([t.mean(axis=1, keepdims=True), t], axis=1)  # [B, HW+1, C]
    t = t + p["positional_embedding"].astype(t.dtype)[None]

    def proj(name, inp):
        w_ = p[name]["weight"].astype(inp.dtype)
        out = jnp.einsum("bld,od->blo", inp, w_, preferred_element_type=jnp.float32).astype(inp.dtype)
        out = out + p[name]["bias"].astype(inp.dtype)
        if lora is not None and name in lora:
            out = out + lora_delta(lora[name], inp, None, lora_scaling)
        return out

    q = proj("q_proj", t)
    k = proj("k_proj", t)
    v = proj("v_proj", t)
    L = t.shape[1]
    dh = c // num_heads

    def heads(z):
        return z.reshape(b, L, num_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * (dh ** -0.5)
    attn = jax.nn.softmax(scores, axis=-1).astype(t.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32).astype(t.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, L, c)
    out = proj("c_proj", out)
    return out if return_tokens else out[:, 0]


def resnet_encode(params, bn_params, stats, x, cfg: ResNetConfig, policy: Policy,
                  train: bool = False, return_tokens: bool = False,
                  lora=None, attnpool_lora=None, attr_mix=None,
                  lora_scaling: float = 0.0):
    """Full ModifiedResNet forward. Returns (features, new_stats).

    features: [B, output_dim] pooled, or [B, HW+1, output_dim] tokens for the
    GLP_OT variant (ModifiedResNet_GLP_OT.forward returns the attnpool's full
    token output, clip/model.py:290-301)."""
    new_stats = {"stem": {}}
    h = x.astype(policy.compute_dtype)
    # 3-conv stem
    h = conv2d(h, params["stem"]["conv1"], stride=2, padding=1, policy=policy)
    h, new_stats["stem"]["bn1"] = batch_norm(bn_params["stem"]["bn1"], stats["stem"]["bn1"], h, train)
    h = jax.nn.relu(h)
    h = conv2d(h, params["stem"]["conv2"], padding=1, policy=policy)
    h, new_stats["stem"]["bn2"] = batch_norm(bn_params["stem"]["bn2"], stats["stem"]["bn2"], h, train)
    h = jax.nn.relu(h)
    h = conv2d(h, params["stem"]["conv3"], padding=1, policy=policy)
    h, new_stats["stem"]["bn3"] = batch_norm(bn_params["stem"]["bn3"], stats["stem"]["bn3"], h, train)
    h = jax.nn.relu(h)
    h = avg_pool(h, 2)

    for li in range(4):
        lname = f"layer{li + 1}"
        new_stats[lname] = []
        for bi, block in enumerate(params[lname]):
            stride = 2 if (li > 0 and bi == 0) else 1
            block_lora = None
            if lora is not None:
                block_lora = lora[lname][bi]
            h, st = bottleneck(block, bn_params[lname][bi], stats[lname][bi], h,
                               stride, train, policy,
                               lora=block_lora, attr_mix=attr_mix,
                               lora_scaling=lora_scaling)
            new_stats[lname].append(st)

    feats = attention_pool(params["attnpool"], h, cfg.heads, policy,
                           lora=attnpool_lora, lora_scaling=lora_scaling,
                           return_tokens=return_tokens)
    return feats, new_stats


# --------------------------------------------------------------------------- #
# initialisation
# --------------------------------------------------------------------------- #

def _bn_init(dim):
    return ({"weight": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)},
            {"mean": jnp.zeros((dim,), jnp.float32), "var": jnp.ones((dim,), jnp.float32)})


def _conv_init(key, cout, cin, k):
    fan = cin * k * k
    return jax.random.normal(key, (cout, cin, k, k)) * (2.0 / fan) ** 0.5


def init_modified_resnet(rng, cfg: ResNetConfig):
    """Random init. Returns (params, bn_params, stats)."""
    w = cfg.width
    keys = iter(jax.random.split(rng, 256))
    params = {"stem": {
        "conv1": _conv_init(next(keys), w // 2, 3, 3),
        "conv2": _conv_init(next(keys), w // 2, w // 2, 3),
        "conv3": _conv_init(next(keys), w, w // 2, 3),
    }}
    bn = {"stem": {}}
    stats = {"stem": {}}
    for i, dim in (("bn1", w // 2), ("bn2", w // 2), ("bn3", w)):
        bn["stem"][i], stats["stem"][i] = _bn_init(dim)

    inplanes = w
    for li, nblocks in enumerate(cfg.layers):
        planes = w * (2 ** li)
        lname = f"layer{li + 1}"
        params[lname], bn[lname], stats[lname] = [], [], []
        for bi in range(nblocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            block = {
                "conv1": _conv_init(next(keys), planes, inplanes, 1),
                "conv2": _conv_init(next(keys), planes, planes, 3),
                "conv3": _conv_init(next(keys), planes * EXPANSION, planes, 1),
            }
            bblock, sblock = {}, {}
            for n, dim in (("bn1", planes), ("bn2", planes), ("bn3", planes * EXPANSION)):
                bblock[n], sblock[n] = _bn_init(dim)
            if stride > 1 or inplanes != planes * EXPANSION:
                block["downsample"] = _conv_init(next(keys), planes * EXPANSION, inplanes, 1)
                bblock["downsample_bn"], sblock["downsample_bn"] = _bn_init(planes * EXPANSION)
            params[lname].append(block)
            bn[lname].append(bblock)
            stats[lname].append(sblock)
            inplanes = planes * EXPANSION

    ed = cfg.embed_dim
    spacial = cfg.input_resolution // 32
    std = ed ** -0.5
    params["attnpool"] = {
        "positional_embedding": jax.random.normal(next(keys), (spacial ** 2 + 1, ed)) / ed ** 0.5,
        "q_proj": {"weight": jax.random.normal(next(keys), (ed, ed)) * std, "bias": jnp.zeros((ed,))},
        "k_proj": {"weight": jax.random.normal(next(keys), (ed, ed)) * std, "bias": jnp.zeros((ed,))},
        "v_proj": {"weight": jax.random.normal(next(keys), (ed, ed)) * std, "bias": jnp.zeros((ed,))},
        "c_proj": {"weight": jax.random.normal(next(keys), (cfg.output_dim, ed)) * std,
                   "bias": jnp.zeros((cfg.output_dim,))},
    }
    return params, bn, stats


def convert_resnet_visual(sd: dict, cfg: ResNetConfig, dtype=jnp.float32):
    """torch state_dict (visual.* keys) → (params, bn, stats) pytrees."""
    import numpy as np

    a = lambda k: jnp.asarray(np.asarray(sd[f"visual.{k}"]), dtype)

    def bn_of(prefix):
        return (
            {"weight": a(f"{prefix}.weight"), "bias": a(f"{prefix}.bias")},
            {"mean": a(f"{prefix}.running_mean"), "var": a(f"{prefix}.running_var")},
        )

    params = {"stem": {"conv1": a("conv1.weight"), "conv2": a("conv2.weight"),
                       "conv3": a("conv3.weight")}}
    bn, stats = {"stem": {}}, {"stem": {}}
    for n in ("bn1", "bn2", "bn3"):
        bn["stem"][n], stats["stem"][n] = bn_of(n)

    for li, nblocks in enumerate(cfg.layers):
        lname = f"layer{li + 1}"
        params[lname], bn[lname], stats[lname] = [], [], []
        for bi in range(nblocks):
            pre = f"{lname}.{bi}"
            block = {"conv1": a(f"{pre}.conv1.weight"), "conv2": a(f"{pre}.conv2.weight"),
                     "conv3": a(f"{pre}.conv3.weight")}
            bblock, sblock = {}, {}
            for n in ("bn1", "bn2", "bn3"):
                bblock[n], sblock[n] = bn_of(f"{pre}.{n}")
            if f"visual.{pre}.downsample.0.weight" in sd:
                block["downsample"] = a(f"{pre}.downsample.0.weight")
                bblock["downsample_bn"], sblock["downsample_bn"] = bn_of(f"{pre}.downsample.1")
            params[lname].append(block)
            bn[lname].append(bblock)
            stats[lname].append(sblock)

    params["attnpool"] = {
        "positional_embedding": a("attnpool.positional_embedding"),
        "q_proj": {"weight": a("attnpool.q_proj.weight"), "bias": a("attnpool.q_proj.bias")},
        "k_proj": {"weight": a("attnpool.k_proj.weight"), "bias": a("attnpool.k_proj.bias")},
        "v_proj": {"weight": a("attnpool.v_proj.weight"), "bias": a("attnpool.v_proj.bias")},
        "c_proj": {"weight": a("attnpool.c_proj.weight"), "bias": a("attnpool.c_proj.bias")},
    }
    return params, bn, stats
