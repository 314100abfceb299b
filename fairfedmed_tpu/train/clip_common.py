"""Shared CLIP model assembly for the method trainers.

``load_clip_bundle`` plays the role of load_clip_to_cpu + clip.build_model
(trainers/GLP_OT_SVLoRA.py:23-43, clip/model.py:633-670): resolve the backbone
name to a checkpoint (``~/.cache/clip`` or DATASET.ROOT) and convert it to a
pytree; fall back to random initialisation when no checkpoint exists (this
offline environment cannot download the OpenAI weights).

Tiny ``test-vit`` presets keep unit/e2e tests fast.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.precision import Policy, policy_from_prec
from ..models import converter
from ..models.clip_model import PRESETS, CLIPConfig, init_clip_params
from ..utils.profiling import stamp

TEST_PRESETS = {
    "test-vit": CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, transformer_width=32, transformer_heads=4,
        transformer_layers=2,
    ),
    "test-vit-224": CLIPConfig(
        embed_dim=64, image_resolution=224, vision_layers=2, vision_width=64,
        vision_patch_size=32, transformer_width=64, transformer_heads=4,
        transformer_layers=2,
    ),
}


RN_TEXT_CONFIGS = {
    # text towers paired with the ResNet visual encoders (clip/model.py:633-656)
    "RN50": CLIPConfig(embed_dim=1024, transformer_width=512, transformer_heads=8,
                       transformer_layers=12),
    "RN101": CLIPConfig(embed_dim=512, transformer_width=512, transformer_heads=8,
                        transformer_layers=12),
    "RN50x4": CLIPConfig(embed_dim=640, image_resolution=288, transformer_width=640,
                         transformer_heads=10, transformer_layers=12),
    "RN50x16": CLIPConfig(embed_dim=768, image_resolution=384, transformer_width=768,
                          transformer_heads=12, transformer_layers=12),
    "test-rn": CLIPConfig(embed_dim=64, image_resolution=32, transformer_width=64,
                          transformer_heads=4, transformer_layers=2),
}


@dataclasses.dataclass
class CLIPBundle:
    params: dict  # frozen backbone pytree (policy.param_dtype)
    clip_cfg: CLIPConfig
    policy: Policy
    pretrained: bool
    backbone_type: str = "vit"  # 'vit' | 'resnet'
    rn_cfg: object = None       # ResNetConfig for resnet backbones
    visual_bn: dict = None      # BN affine tree (goes into the TRAINABLE set)
    visual_stats: dict = None   # BN running stats (mutable buffers)


def _is_resnet(name: str) -> bool:
    return name.startswith("RN") or name == "test-rn"


def load_clip_bundle(cfg, prec: str) -> CLIPBundle:
    from ..models import resnet_clip

    name = cfg.MODEL.BACKBONE.NAME
    policy = policy_from_prec(prec)
    seed_key = jax.random.PRNGKey(cfg.SEED if cfg.SEED >= 0 else 0)

    if _is_resnet(name):
        ckpt = converter.find_checkpoint(name, root=cfg.DATASET.ROOT) \
            if (cfg.MODEL.BACKBONE.PRETRAINED and not name.startswith("test")) else None
        if ckpt is not None:
            print(f"Loading CLIP (backbone: {name}) from {ckpt}")
            sd = converter.load_torch_state_dict(ckpt)
            # any RN variant loads via shape inference (clip/model.py:643-656)
            # — no preset required, RN50x4/x16 included
            rn_cfg, clip_cfg = converter.infer_rn_config(sd)
            visual, bn, stats = resnet_clip.convert_resnet_visual(sd, rn_cfg)
            text_params = converter.convert_text_tower(sd)
            params = {"visual": visual, "text": text_params["text"],
                      "logit_scale": text_params["logit_scale"]}
            pretrained = True
        else:
            rn_cfg = resnet_clip.RN_PRESETS[name]
            clip_cfg = RN_TEXT_CONFIGS[name]
            if not name.startswith("test"):
                print(f"WARNING: no checkpoint found for {name}; using random init")
            # one jitted program: eager per-leaf init round-trips per op,
            # which is pathological on a remote-TPU attachment
            @jax.jit
            def _init_rn(key):
                kv, kt = jax.random.split(key)
                visual, bn, stats = resnet_clip.init_modified_resnet(kv, rn_cfg)
                text_full = init_clip_params(kt, clip_cfg)
                return visual, bn, stats, text_full

            visual, bn, stats, text_full = _init_rn(seed_key)
            params = {"visual": visual, "text": text_full["text"],
                      "logit_scale": text_full["logit_scale"]}
            pretrained = False
        # ONE jitted cast program (see the ViT path below: eager per-leaf
        # casts are hundreds of tunnel round-trips); BN affine + stats stay
        # fp32 (numerics)
        params, bn, stats = jax.jit(lambda p, b, s: (
            jax.tree_util.tree_map(lambda a: jnp.asarray(a, policy.param_dtype), p),
            jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), b),
            jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), s),
        ))(params, bn, stats)
        params["logit_scale"] = jnp.asarray(params["logit_scale"], jnp.float32)
        stamp("clip_bundle:params_cast_done")
        return CLIPBundle(params=params, clip_cfg=clip_cfg, policy=policy,
                          pretrained=pretrained, backbone_type="resnet",
                          rn_cfg=rn_cfg, visual_bn=bn, visual_stats=stats)

    if name in TEST_PRESETS:
        clip_cfg = TEST_PRESETS[name]
        params = jax.jit(lambda k: init_clip_params(k, clip_cfg))(seed_key)
        pretrained = False
    else:
        ckpt = converter.find_checkpoint(name, root=cfg.DATASET.ROOT) if cfg.MODEL.BACKBONE.PRETRAINED else None
        if ckpt is not None:
            print(f"Loading CLIP (backbone: {name}) from {ckpt}")
            sd = converter.load_torch_state_dict(ckpt)
            params, clip_cfg = converter.convert_vit_clip(sd)
            pretrained = True
        else:
            clip_cfg = PRESETS.get(name)
            if clip_cfg is None:
                raise ValueError(f"Unknown CLIP backbone: {name}")
            print(f"WARNING: no checkpoint found for {name}; using random init "
                  f"(place the OpenAI .pt under ~/.cache/clip to enable pretrained weights)")
            params = jax.jit(lambda k: init_clip_params(k, clip_cfg))(seed_key)
            pretrained = False

    # storage in param_dtype (the reference keeps fp16 storage with fp32
    # LayerNorm compute); logit_scale is a scalar used in fp32 loss math.
    # ONE jitted cast program: an eager per-leaf asarray is ~200 device
    # dispatches, each a remote-TPU tunnel round-trip (latency + stall
    # exposure); host-numpy leaves (checkpoint path) batch-transfer as jit
    # arguments the same way.
    params = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, policy.param_dtype), p))(params)
    params["logit_scale"] = jnp.asarray(params["logit_scale"], jnp.float32)
    stamp("clip_bundle:params_cast_done")
    return CLIPBundle(params=params, clip_cfg=clip_cfg, policy=policy,
                      pretrained=pretrained, backbone_type="vit")


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    return nll.mean()


def fairness_confidence_loss(logits, labels, attr, num_groups: int,
                             differentiable: bool = False,
                             axis_name=None) -> jnp.ndarray:
    """Confidence-gap fairness regulariser (GLP_OT_SVLoRA.py:908-948).

    Per group g: c_g = 1 − mean_{i∈g} p_i[y_i]; loss = mean_g |c_g − mean(c)|.
    The reference builds the group vector via ``torch.tensor(list(...))``
    which DETACHES it — the regulariser contributes no gradient (quirk noted
    in SURVEY §2.4).  ``differentiable=False`` reproduces that; True enables
    the intended gradient.

    ``axis_name`` names a mesh axis the batch is sharded over (within-client
    data parallelism).  The group means are NONLINEAR in the batch partition
    — a per-shard loss pmean-ed over shards is NOT the full-batch loss (a
    shard containing one group has gap 0 regardless of the other shards) —
    so the per-group sums/counts are psum-ed over the axis before forming
    the gaps, making every shard compute the sequential full-batch value.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    correct = jnp.take_along_axis(probs, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    one_hot = jax.nn.one_hot(attr, num_groups, dtype=jnp.float32)  # [B, G]
    count = one_hot.sum(0)  # [G]
    sum_conf = (one_hot * correct[:, None]).sum(0)  # [G]
    if axis_name is not None:
        count = jax.lax.psum(count, axis_name)
        sum_conf = jax.lax.psum(sum_conf, axis_name)
    present = count > 0
    conf = 1.0 - sum_conf / jnp.maximum(count, 1.0)
    mean_conf = jnp.sum(jnp.where(present, conf, 0.0)) / jnp.maximum(present.sum(), 1)
    gaps = jnp.where(present, jnp.abs(conf - mean_conf), 0.0)
    loss = jnp.sum(gaps) / jnp.maximum(present.sum(), 1)
    if not differentiable:
        loss = jax.lax.stop_gradient(loss)
    # differentiable + axis_name needs NO extra scaling under the product's
    # shard_map(check_vma=False): psum transposes to psum, so each shard's
    # backward sees the cross-shard cotangent sum (n_shards x the global
    # sensitivity for this replicated loss) through only its own samples,
    # and the caller's pmean over the axis lands on exactly the full-batch
    # gradient — verified numerically against the unsharded oracle (loss and
    # grad both exact; under check_vma=True semantics the scaling differs).
    return loss


def accuracy_from_logits(logits, labels) -> jnp.ndarray:
    return (jnp.argmax(logits, -1) == labels).astype(jnp.float32).mean() * 100.0
