"""Functional CLIP (ViT + text transformer) for TPU.

Re-implements the capability of the reference CLIP (clip/model.py:305-606) as
pure functions over parameter pytrees:

* transformer blocks are STACKED along a leading layer axis and executed with
  ``lax.scan`` — one compiled block body regardless of depth;
* matmuls run in the policy compute dtype (bf16 on TPU) with fp32 accumulation
  (``preferred_element_type``), LayerNorm/softmax in fp32 — the TPU analogue of
  the reference's fp16 weights + fp32 LayerNorm islands (clip/model.py:304-310);
* the GLP_OT "ModifiedVisionTransformer" behaviour (return all patch tokens for
  OT matching, clip/model.py:413-449) is a ``return_tokens`` flag, not a class
  fork;
* LoRA-family adapters on the MLP sublayers (the reference wraps both ``c_fc``
  and ``c_proj`` Linears of every resblock, GLP_OT_SVLoRA.py:503-543) are an
  optional stacked adapter pytree threaded through the same scan.

Weight layout follows torch convention ([out, in] linear weights) so the OpenAI
checkpoint converter is a direct reshape-free mapping.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..adapters.lora import lora_delta
from ..core.precision import Policy


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 16
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def vision_heads(self) -> int:
        return self.vision_width // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size


PRESETS = {
    "ViT-B/16": CLIPConfig(),
    "ViT-B/32": CLIPConfig(vision_patch_size=32),
    "ViT-L/14": CLIPConfig(embed_dim=768, vision_layers=24, vision_width=1024,
                           vision_patch_size=14, transformer_width=768,
                           transformer_heads=12, transformer_layers=12),
}


# --------------------------------------------------------------------------- #
# primitive layers
# --------------------------------------------------------------------------- #

def dense(x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """y = x @ W^T + b with torch-convention W [out, in]; fp32 MXU accumulation."""
    y = jax.lax.dot_general(
        x, weight.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm computed in fp32 regardless of input dtype (clip/model.py:304-310)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: x * sigmoid(1.702 x) (clip/model.py:312-314)."""
    return x * jax.nn.sigmoid(1.702 * x)


_PALLAS_ATTN: Optional[bool] = None


def _use_pallas_attn() -> bool:
    """Opt-in Pallas fused attention (FFM_PALLAS_ATTN=1).

    Default is the XLA einsum path: at CLIP's short sequences (197/77) XLA's
    fusion of attention with the surrounding residual/LN ops beats the opaque
    kernel boundary (measured 906 vs 726 img/s on the v5e train step; the
    kernel wins in isolation but blocks cross-op fusion).  Re-measured in
    round 2 across the 3D-OCT effective batches (vision-tower fwd+bwd, seq
    197): XLA wins at every size — B=64: 945 vs 771, B=256: 788 vs 594,
    B=1024: 661 vs 548 seq/s — so the default stays XLA everywhere; the
    kernel remains correct (tested incl. custom VJP) for longer sequences.
    """
    global _PALLAS_ATTN
    if _PALLAS_ATTN is None:
        import os

        _PALLAS_ATTN = os.environ.get("FFM_PALLAS_ATTN") in ("1", "true", "True")
    return _PALLAS_ATTN


def multi_head_attention(
    p: dict,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Self-attention matching torch nn.MultiheadAttention with packed in_proj.

    x: [B, L, D].  Softmax in fp32.  On TPU the score/softmax/PV chain runs as
    one Pallas kernel (ops/attention.py) — HBM traffic O(L·dh) instead of the
    unfused O(L²) score round-trips.
    """
    from jax.ad_checkpoint import checkpoint_name

    b, l, d = x.shape
    dh = d // num_heads
    qkv = dense(x, p["in_proj_weight"], p["in_proj_bias"])  # [B, L, 3D]
    # no-op identity unless an enclosing remat policy names it (see transformer)
    qkv = checkpoint_name(qkv, "attn_qkv")
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)  # [B, H, L, dh]

    q, k, v = heads(q), heads(k), heads(v)
    if _use_pallas_attn():
        from ..ops.attention import flash_attention

        out = flash_attention(q, k, v, mask=mask).astype(x.dtype)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (dh ** -0.5)
        if mask is not None:
            scores = scores + mask.astype(scores.dtype)
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = checkpoint_name(attn, "attn_probs")
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
    return dense(out, p["out_proj"]["weight"], p["out_proj"]["bias"])


def mlp_block(
    p: dict,
    x: jnp.ndarray,
    lora: Optional[dict] = None,
    attr_mix: Optional[jnp.ndarray] = None,
    lora_scaling: float = 0.0,
) -> jnp.ndarray:
    """c_proj(QuickGELU(c_fc(x))) with optional LoRA deltas on both linears."""
    h = dense(x, p["c_fc"]["weight"], p["c_fc"]["bias"])
    if lora is not None and "c_fc" in lora:
        h = h + lora_delta(lora["c_fc"], x, attr_mix, lora_scaling)
    h = quick_gelu(h)
    y = dense(h, p["c_proj"]["weight"], p["c_proj"]["bias"])
    if lora is not None and "c_proj" in lora:
        y = y + lora_delta(lora["c_proj"], h, attr_mix, lora_scaling)
    return y


def transformer(
    blocks: dict,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    lora: Optional[dict] = None,
    attr_mix: Optional[jnp.ndarray] = None,
    lora_scaling: float = 0.0,
    remat="attn_res",
) -> jnp.ndarray:
    """Scan one residual block body over layer-stacked params (and adapters).

    ``remat`` selects the rematerialization policy per block:

    * ``"attn_res"`` (default) — save ONLY the post-attention residual
      stream ([B, L, D] per layer, ~10 MB/layer at batch 32): the backward
      MLP recompute starts from the saved tensor instead of first replaying
      attention, cutting the serial recompute chain.  Measured on TPU v5e it
      beats full-block remat at every batch (b32 972→1048, b64 807→847,
      b128 701→739 img/s) and still compiles at batch 128 where ``"none"``
      OOMs;
    * ``"attn_all"`` — additionally save attention's qkv and softmax probs
      (~60 MB/layer at batch 32) so backward recomputes ONLY the MLP;
      trades ~45% of the recompute FLOPs for extra saved-activation HBM
      traffic, and LOSES on v5e (b32 987 vs 1038, b64 778 vs 828 img/s) —
      kept as an opt-in data point on the remat frontier;
    * ``"full"`` (or True) — checkpoint everything: without it the scan saves
      every layer's [B, L, 4D] MLP activations for backward (~18 GB for
      ViT-B/16 at batch 128 — OOM on a 16 GB chip); recomputing costs ~⅓
      extra FLOPs and lets batch scale to the MXU-efficient regime;
    * ``"dots"`` — save matmul outputs, recompute only elementwise ops
      (LayerNorm/GELU/softmax): nearly the FLOPs of no-remat at a fraction
      of its memory;
    * ``"none"`` (or False) — save everything.

    Policies change WHAT is saved for backward, never the primal math: every
    policy runs the identical forward graph (parity axes re-validated).
    """
    if remat is True:
        remat = "full"
    if remat is False or remat is None:
        remat = "none"
    if remat == "full":
        wrap = lambda f: jax.checkpoint(f, prevent_cse=False)
    elif remat == "attn_res":
        wrap = lambda f: jax.checkpoint(
            f, prevent_cse=False,
            policy=jax.checkpoint_policies.save_only_these_names("attn_res"))
    elif remat == "attn_all":
        # additionally keep qkv + softmax probs so backward recomputes ONLY
        # the MLP (attention backward reuses its saved internals)
        wrap = lambda f: jax.checkpoint(
            f, prevent_cse=False,
            policy=jax.checkpoint_policies.save_only_these_names(
                "attn_res", "attn_qkv", "attn_probs"))
    elif remat == "dots":
        wrap = lambda f: jax.checkpoint(
            f, prevent_cse=False,
            policy=jax.checkpoint_policies.checkpoint_dots)
    elif remat == "none":
        wrap = lambda f: f
    else:
        raise ValueError(f"unknown remat policy {remat!r}")

    # the tag is a no-op identity unless a name-saving policy selects it
    from jax.ad_checkpoint import checkpoint_name

    if lora is None:
        def body(h, bp):
            h = h + multi_head_attention(bp["attn"], layer_norm(bp["ln_1"], h), num_heads, mask)
            h = checkpoint_name(h, "attn_res")
            h = h + mlp_block(bp["mlp"], layer_norm(bp["ln_2"], h))
            return h, None
        x, _ = jax.lax.scan(wrap(body), x, blocks)
    else:
        def body_lora(h, layer):
            bp, lp = layer
            h = h + multi_head_attention(bp["attn"], layer_norm(bp["ln_1"], h), num_heads, mask)
            h = checkpoint_name(h, "attn_res")
            h = h + mlp_block(bp["mlp"], layer_norm(bp["ln_2"], h), lp, attr_mix, lora_scaling)
            return h, None
        x, _ = jax.lax.scan(wrap(body_lora), x, (blocks, lora))
    return x


# --------------------------------------------------------------------------- #
# encoders
# --------------------------------------------------------------------------- #

def vit_encode(
    visual: dict,
    image: jnp.ndarray,
    cfg: CLIPConfig,
    policy: Policy,
    return_tokens: bool = False,
    lora: Optional[dict] = None,
    attr_mix: Optional[jnp.ndarray] = None,
    lora_scaling: float = 0.0,
    remat="attn_res",
) -> jnp.ndarray:
    """ViT image encoder.

    image: [B, 3, H, W].  Returns [B, embed_dim] (pooled, clip/model.py:377-411)
    or [B, 1+L, embed_dim] with CLS first when ``return_tokens`` (the GLP_OT
    ModifiedVisionTransformer path, clip/model.py:413-449).  ``remat`` selects
    the per-block rematerialization policy (see :func:`transformer`).
    """
    x = image.astype(policy.compute_dtype)
    p = cfg.vision_patch_size
    # patch embedding: conv with stride=kernel=p == unfold + matmul (MXU-friendly)
    w = visual["conv1"]["weight"].astype(policy.compute_dtype)  # [D, 3, p, p]
    b, _, h, wdt = x.shape
    gh, gw = h // p, wdt // p
    x = x.reshape(b, 3, gh, p, gw, p).transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, 3 * p * p)
    x = jax.lax.dot_general(
        x, w.reshape(cfg.vision_width, 3 * p * p),
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(policy.compute_dtype)  # [B, L, D]

    cls = visual["class_embedding"].astype(x.dtype)
    cls = jnp.broadcast_to(cls, (b, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + visual["positional_embedding"].astype(x.dtype)
    x = layer_norm(visual["ln_pre"], x)

    x = transformer(
        visual["blocks"], x, cfg.vision_heads,
        lora=lora, attr_mix=attr_mix, lora_scaling=lora_scaling, remat=remat,
    )

    proj = visual["proj"].astype(x.dtype)
    if return_tokens:
        x = layer_norm(visual["ln_post"], x)
        return jax.lax.dot_general(
            x, proj, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    x = layer_norm(visual["ln_post"], x[:, 0, :])
    return (x @ proj).astype(x.dtype)


def causal_mask(length: int) -> jnp.ndarray:
    """Additive causal mask (clip/model.py:562-568)."""
    return jnp.triu(jnp.full((length, length), -jnp.inf, dtype=jnp.float32), k=1)


def text_encode(
    params: dict,
    prompt_embeds: jnp.ndarray,
    eot_indices: jnp.ndarray,
    cfg: CLIPConfig,
    policy: Policy,
) -> jnp.ndarray:
    """Text transformer over pre-built prompt embeddings.

    prompt_embeds: [N, 77, width] (token embeddings with learned context rows
    already spliced in — see prompt_learner); eot_indices: [N] argmax of the
    tokenized prompt, used for EOT pooling (GLP_OT_SVLoRA.py:55-66).

    EOT truncation: only the EOT position's activation is pooled, and under
    CAUSAL attention no position ≤ EOT ever attends to a later one — so
    tokens after the last EOT (the bulk of the 77-token context: padding)
    cannot influence the output.  When the EOT indices are static (host
    numpy, the prompt-learner contract) the sequence is truncated to the
    last EOT, bit-identical and ~5x less text-tower work per train step.
    """
    text = params["text"]
    x = prompt_embeds.astype(policy.compute_dtype)
    if isinstance(eot_indices, jax.core.Tracer):
        # traced indices (no known caller does this) can't be truncated on:
        # fall through with the full context rather than guessing a bound
        l_eff = x.shape[1]
    else:
        import numpy as _np

        l_eff = int(_np.max(_np.asarray(eot_indices))) + 1
        l_eff = min(x.shape[1], max(8, -(-l_eff // 8) * 8))  # lane-align
    if l_eff < x.shape[1]:
        x = x[:, :l_eff]
    x = x + text["positional_embedding"][: x.shape[1]].astype(x.dtype)
    x = transformer(text["blocks"], x, cfg.transformer_heads, mask=causal_mask(x.shape[1]))
    x = layer_norm(text["ln_final"], x)
    pooled = jnp.take_along_axis(x, eot_indices[:, None, None], axis=1)[:, 0]
    return (pooled @ text["text_projection"].astype(pooled.dtype)).astype(x.dtype)


def embed_tokens(params: dict, token_ids: jnp.ndarray) -> jnp.ndarray:
    """Token embedding lookup [N, 77] → [N, 77, width]."""
    return params["text"]["token_embedding"][token_ids]


# --------------------------------------------------------------------------- #
# initialisation
# --------------------------------------------------------------------------- #

def _ln_init(dim):
    return {"weight": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def _init_blocks(rng, layers, width, attn_std, fc_std, proj_std):
    """Stacked residual-block params, init per CLIP.initialize_parameters
    (clip/model.py:533-546)."""
    ks = jax.random.split(rng, 4)
    shape = lambda *s: (layers, *s)
    return {
        "ln_1": {"weight": jnp.ones(shape(width)), "bias": jnp.zeros(shape(width))},
        "ln_2": {"weight": jnp.ones(shape(width)), "bias": jnp.zeros(shape(width))},
        "attn": {
            "in_proj_weight": jax.random.normal(ks[0], shape(3 * width, width)) * attn_std,
            "in_proj_bias": jnp.zeros(shape(3 * width)),
            "out_proj": {
                "weight": jax.random.normal(ks[1], shape(width, width)) * proj_std,
                "bias": jnp.zeros(shape(width)),
            },
        },
        "mlp": {
            "c_fc": {
                "weight": jax.random.normal(ks[2], shape(4 * width, width)) * fc_std,
                "bias": jnp.zeros(shape(4 * width)),
            },
            "c_proj": {
                "weight": jax.random.normal(ks[3], shape(width, 4 * width)) * proj_std,
                "bias": jnp.zeros(shape(width)),
            },
        },
    }


def init_clip_params(rng: jax.Array, cfg: CLIPConfig, dtype=jnp.float32) -> dict:
    """Random CLIP init (used when no OpenAI checkpoint is supplied)."""
    # one key PER tensor: with threefry, normal(key, shape) depends only on
    # (key, flat index), so reusing a key makes distinct tensors literal
    # prefixes of each other's draws — pathologically correlated random init
    (k_cls, k_posv, k_conv, k_blkv, k_projv,
     k_tok, k_post, k_blkt, k_tproj) = jax.random.split(rng, 9)
    vw, tw = cfg.vision_width, cfg.transformer_width
    n_tokens = cfg.grid_size ** 2 + 1

    visual = {
        "class_embedding": jax.random.normal(k_cls, (vw,)) * vw ** -0.5,
        "positional_embedding": jax.random.normal(k_posv, (n_tokens, vw)) * vw ** -0.5,
        "conv1": {"weight": jax.random.normal(k_conv, (vw, 3, cfg.vision_patch_size, cfg.vision_patch_size)) * vw ** -0.5},
        "ln_pre": _ln_init(vw),
        "blocks": _init_blocks(k_blkv, cfg.vision_layers, vw,
                               attn_std=vw ** -0.5,
                               fc_std=(2 * vw) ** -0.5,
                               proj_std=(vw ** -0.5) * ((2 * cfg.vision_layers) ** -0.5)),
        "ln_post": _ln_init(vw),
        "proj": jax.random.normal(k_projv, (vw, cfg.embed_dim)) * vw ** -0.5,
    }
    text = {
        "token_embedding": jax.random.normal(k_tok, (cfg.vocab_size, tw)) * 0.02,
        "positional_embedding": jax.random.normal(k_post, (cfg.context_length, tw)) * 0.01,
        "blocks": _init_blocks(k_blkt, cfg.transformer_layers, tw,
                               attn_std=tw ** -0.5,
                               fc_std=(2 * tw) ** -0.5,
                               proj_std=(tw ** -0.5) * ((2 * cfg.transformer_layers) ** -0.5)),
        "ln_final": _ln_init(tw),
        "text_projection": jax.random.normal(k_tproj, (tw, cfg.embed_dim)) * tw ** -0.5,
    }
    params = {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(jnp.log(1 / 0.07), jnp.float32),
    }
    return jax.tree_util.tree_map(lambda a: a.astype(dtype), params)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(x32 * x32, axis=axis, keepdims=True))
    return (x32 / jnp.maximum(n, eps)).astype(x.dtype)
