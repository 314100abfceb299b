"""GLP-OT and FairLoRA (GLP_OT_SVLoRA) method trainers.

Capability match of trainers/GLP_OT.py:390-568 and
trainers/GLP_OT_SVLoRA.py:575-1054 — CLIP with a multi-prompt learner, optional
Sinkhorn/COT optimal-transport alignment between image patch tokens and
prompts, and (SVLoRA variant) LoRA/SVLoRA/FairLoRA adapters on the image
encoder MLPs with demographic-group singular values.

TPU-native structure: ``build_model`` assembles frozen/trainable pytrees and
compiles ONE train-step program (value_and_grad → optax update, with on-device
preprocessing fused into the forward); the 3D-OCT slice split is a batch-axis
reshape inside the same jitted function (SURVEY §5 long-context note).
The transport plan is a ``lax.while_loop`` under stop_gradient; an invalid
(NaN) plan skips the whole optimizer step — parameters, momentum and weight
decay all stay untouched (GLP_OT_SVLoRA.py:738-743 returns None and never
steps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...adapters.lora import group_mix, init_lora
from ...evaluation import metrics as eval_metrics
from ...models.clip_model import l2_normalize, text_encode, vit_encode
from ...models.prompt_learner import assemble_prompts, init_prompt_learner
from ...ops.sinkhorn import entropic_cot, sinkhorn
from ...utils.profiling import stamp
from ...utils.registry import TRAINER_REGISTRY
from ..clip_common import (
    accuracy_from_logits,
    cross_entropy,
    fairness_confidence_loss,
    load_clip_bundle,
)
from ..engine import TrainerX
from ..optim import build_lr_scheduler, build_optimizer, set_learning_rate

MEDICAL_DATASETS = ("FairFedMed", "FedChexMimic", "WangGrant")
MODALITY_3D = ("oct_bscans", "oct_bscans_3d", "mac_onh", "onh_mac")

# per-dataset demographic group tables (GLP_OT_SVLoRA.py:775-790)
GROUP_TABLES = {
    "FairFedMed": {
        "race": ["Asian", "Black", "White"],
        "language": ["English", "Spanish", "Others"],
        "ethnicity": ["Non-hispanic", "Hispanic"],
        "gender": ["Male", "Female"],
    },
    "FedChexMimic": {
        "race": ["White", "Asian", "Black"],
        "gender": ["Male", "Female"],
        "age": ["0-60", "60+"],
    },
}


def _apply_opt(tx, grads, opt_state, params, n: int):
    """Apply ``tx`` ``n`` times with the SAME grads (params/momentum/WD state
    threading through) — torch semantics of calling optimizer.step() per
    registered model name on one backward (Dassl trainer.py:333-342)."""
    for _ in range(n):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    return params, opt_state


def _redictify_like(template, rebuilt):
    """Map an unflatten_paths dict (string int keys) back onto the template's
    list/dict structure."""
    if isinstance(template, list):
        return [_redictify_like(template[i], rebuilt[str(i)]) for i in range(len(template))]
    if isinstance(template, dict):
        return {k: _redictify_like(v, rebuilt[k]) for k, v in template.items()}
    return rebuilt


class GLPOTBase(TrainerX):
    """Shared machinery; GLP_OT sets use_lora=False, GLP_OT_SVLoRA True."""

    use_lora = False

    def check_cfg(self, cfg):
        assert cfg.TRAINER.GLP_OT.PREC in ["fp16", "fp32", "amp"]

    def retrieval_attributes(self, attr_name):
        table = GROUP_TABLES.get(self.cfg.DATASET.NAME)
        if table is None:
            raise NotImplementedError(self.cfg.DATASET.NAME)
        return table[attr_name]

    # ------------------------------------------------------------- build
    def build_model(self):
        cfg = self.cfg
        t = cfg.TRAINER.GLP_OT
        bundle = load_clip_bundle(cfg, t.PREC)
        self.bundle = bundle
        self.policy = bundle.policy
        classnames = list(self.dm.dataset.classnames)
        self.n_cls = len(classnames)
        self.N = t.N

        clip_res = bundle.clip_cfg.image_resolution
        cfg_size = cfg.INPUT.SIZE[0] if not isinstance(cfg.INPUT.SIZE, str) else 224
        assert cfg_size == clip_res, f"cfg_imsize ({cfg_size}) must equal to clip_imsize ({clip_res})"

        rng = jax.random.PRNGKey(cfg.SEED if cfg.SEED >= 0 else 0)
        k_pl, k_lora, k_proj = jax.random.split(rng, 3)

        print("Building custom CLIP")
        stamp("build:clip_bundle_done")
        pl_params, self.prompt_state = init_prompt_learner(
            k_pl, classnames, bundle.params["text"]["token_embedding"].astype(jnp.float32),
            bundle.clip_cfg, n_ctx=t.N_CTX, n_prompts=t.N,
            ctx_init=t.CTX_INIT, csc=t.CSC, class_token_position=t.CLASS_TOKEN_POSITION,
        )

        stamp("build:prompt_learner_done")
        trainable = {"prompt_learner": pl_params}

        # LayerNorm unfreezing (GLP_OT.py:414-426,444-453): without LoRA,
        # UNFREEZE_IMAGE_ENCODER trains visual ln_pre (the only grad-enabled
        # image-encoder param handed to the optimizer).  UNFREEZE_TEXT_ENCODER
        # is a reference NO-OP: it sets requires_grad on text ln_ params but
        # never passes any text-encoder param to the optimizer (GLP_OT.py:444)
        # — we reproduce that (flag parsed, nothing trained).
        lc0 = cfg.TRAINER.GLP_OT_LORA
        if lc0.UNFREEZE_IMAGE_ENCODER and not self.use_lora \
                and bundle.backbone_type == "vit":
            trainable["visual_ln_pre"] = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32), bundle.params["visual"]["ln_pre"])

        # demographic groups
        self.disable_attr = bool(cfg.TRAINER.GLP_OT_LORA.DISABLE_ATTR) if self.use_lora else True
        if self.use_lora and not cfg.TRAINER.GLP_OT_LORA.DISABLE_ATTR \
                and cfg.DATASET.NAME in GROUP_TABLES:
            self.num_groups = len(self.retrieval_attributes(cfg.DATASET.ATTRIBUTE_TYPE))
            self.disable_attr = False
        else:
            self.num_groups = 1

        # LoRA adapters (apply_lora_to_model, GLP_OT_SVLoRA.py:503-573):
        # ViT — every resblock's mlp.c_fc / mlp.c_proj;
        # RN  — every bottleneck's 1×1 convs (FairLoRA) + attnpool projections
        #       (plain LoRA), with all BatchNorms unfrozen.
        self.backbone_type = bundle.backbone_type
        self.stats = bundle.visual_stats if bundle.backbone_type == "resnet" else {}
        if bundle.backbone_type == "resnet":
            # only GLP_OT_SVLoRA unfreezes BatchNorms (GLP_OT_SVLoRA.py:825-827);
            # plain GLP_OT keeps BN affine frozen (GLP_OT.py:416-429)
            if self.use_lora:
                trainable["visual_bn"] = bundle.visual_bn
            else:
                bundle.params["visual_bn"] = bundle.visual_bn

        self.lora_scaling = 0.0
        if self.use_lora and cfg.TRAINER.GLP_OT_LORA.UNFREEZE_IMAGE_ENCODER:
            lc = cfg.TRAINER.GLP_OT_LORA
            self.lora_scaling = lc.ALPHA / lc.RANK
            if bundle.backbone_type == "vit":
                vw = bundle.clip_cfg.vision_width
                L = bundle.clip_cfg.vision_layers

                # ONE jitted init program: the eager per-layer loop is ~100
                # device dispatches (tunnel round-trips on a remote TPU)
                @jax.jit
                def _init_vit_lora(k):
                    keys = jax.random.split(k, 2 * L)
                    def stacked(din, dout, key_offset):
                        per_layer = [
                            init_lora(keys[key_offset * L + i], din, dout, lc.RANK,
                                      lora_type=lc.TYPE, num_groups=self.num_groups,
                                      global_s=lc.GLOBAL_S)
                            for i in range(L)
                        ]
                        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
                    return {
                        "c_fc": stacked(vw, 4 * vw, 0),
                        "c_proj": stacked(4 * vw, vw, 1),
                    }

                trainable["image_encoder_lora"] = _init_vit_lora(k_lora)
            else:  # resnet: per-bottleneck 1x1 conv FairLoRA
                rn = bundle.rn_cfg

                # ONE jitted init program (same dispatch-batching rationale as
                # the ViT branch above)
                @jax.jit
                def _init_rn_lora(k):
                    keys = iter(jax.random.split(k, 4 * sum(rn.layers) + 8))
                    lora_tree = {}
                    inplanes = rn.width
                    for li, nblocks in enumerate(rn.layers):
                        planes = rn.width * (2 ** li)
                        blocks = []
                        for bi in range(nblocks):
                            blocks.append({
                                "conv1": init_lora(next(keys), inplanes, planes, lc.RANK,
                                                   lora_type=lc.TYPE, num_groups=self.num_groups,
                                                   global_s=lc.GLOBAL_S),
                                "conv3": init_lora(next(keys), planes, planes * 4, lc.RANK,
                                                   lora_type=lc.TYPE, num_groups=self.num_groups,
                                                   global_s=lc.GLOBAL_S),
                            })
                            inplanes = planes * 4
                        lora_tree[f"layer{li + 1}"] = blocks
                    ed = rn.embed_dim
                    attnpool = {
                        name: init_lora(next(keys), ed,
                                        rn.output_dim if name == "c_proj" else ed,
                                        lc.RANK, lora_type="LoRA")
                        for name in ("q_proj", "k_proj", "v_proj", "c_proj")
                    }
                    return lora_tree, attnpool

                (trainable["image_encoder_lora"],
                 trainable["attnpool_lora"]) = _init_rn_lora(k_lora)

        stamp("build:lora_init_done")
        # 3D slice projector (GLP_OT_SVLoRA.py:584-595)
        self.is_3d_input = cfg.DATASET.MODALITY_TYPE in MODALITY_3D
        if self.is_3d_input:
            d = cfg.DATASET.DIM_PER_3D_SLICE
            std = d ** -0.5
            trainable["proj_per_3d_slice"] = {
                "weight": (jax.random.normal(k_proj, (3, d, 5, 5)) * std).astype(jnp.float32),
                "bias": jnp.zeros((3,), jnp.float32),
            }
            self.dim_per_3d_slice = d

        self.trainable = trainable
        self.frozen = bundle.params

        self.tx = build_optimizer(cfg.OPTIM)
        # jitted: optax init is one eager zeros_like PER LEAF otherwise
        self.opt_state = jax.jit(self.tx.init)(self.trainable)
        stamp("build:opt_init_done")
        self.lr_sched = build_lr_scheduler(cfg.OPTIM)
        # Reference quirk, reproduced for metric parity: with
        # UNFREEZE_IMAGE_ENCODER the reference registers prompt_learner AND
        # image_encoder with the SAME optimizer+scheduler
        # (GLP_OT_SVLoRA.py:868-881, GLP_OT.py:456-460), and TrainerBase
        # loops step()/sched.step() once PER REGISTERED NAME
        # (Dassl trainer.py:333-342, :253-258) — so every batch applies the
        # optimizer update TWICE (momentum/weight-decay recomputed against
        # the once-updated params) and every local epoch advances the LR
        # schedule by two.  Verified empirically via tools/ref_parity.py:
        # with a single step, our lora_A update is exactly half the
        # reference's.  TRAINER.GLP_OT_LORA.SINGLE_OPT_STEP opts out of the
        # quirk (documented deviation, like DIFFERENTIABLE_FAIRNESS).
        single = bool(getattr(cfg.TRAINER.GLP_OT_LORA, "SINGLE_OPT_STEP", False))
        self.opt_steps_per_batch = (
            1 if single or not cfg.TRAINER.GLP_OT_LORA.UNFREEZE_IMAGE_ENCODER
            else 2)
        self.lr_step_multiplier = self.opt_steps_per_batch
        # start at the schedule's epoch-0 LR (warmup): the injected optimizer
        # LR otherwise stays at base OPTIM.LR for the whole first epoch
        self.opt_state = set_learning_rate(self.opt_state, self.lr_sched.lr(0))

        self._compile_steps()

    # ------------------------------------------------------------- forward
    def _preprocess(self, trainable, image):
        """On-device preprocessing fused into the jitted step
        (CustomCLIP.forward head, GLP_OT_SVLoRA.py:677-693)."""
        cfg = self.cfg
        mean = jnp.asarray(cfg.INPUT.PIXEL_MEAN, jnp.float32).reshape(1, -1, 1, 1)
        std = jnp.asarray(cfg.INPUT.PIXEL_STD, jnp.float32).reshape(1, -1, 1, 1)
        x = image.astype(jnp.float32)
        if cfg.DATASET.NAME in MEDICAL_DATASETS:
            if self.is_3d_input:
                # conv(x/255, W) == conv(x, W/255): fold the /255 into the
                # (tiny) weight instead of a full elementwise pass over the
                # volume batch.  bf16 rounding is scale-invariant, so raw
                # 0-255 pixels round with the same relative error as /255-ed
                # ones; in fp32 the fold is exact to ~1 ulp.
                b, c, h, w = x.shape
                x = x.reshape(-1, self.dim_per_3d_slice, h, w)
                p = trainable["proj_per_3d_slice"]
                x = jax.lax.conv_general_dilated(
                    x.astype(self.policy.compute_dtype),
                    (p["weight"] / 255.0).astype(self.policy.compute_dtype),
                    window_strides=(1, 1), padding=[(2, 2), (2, 2)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                ).astype(jnp.float32) + p["bias"].reshape(1, -1, 1, 1)
                mn = x.min(axis=(1, 2, 3), keepdims=True)
                mx = x.max(axis=(1, 2, 3), keepdims=True)
                x = (x - mn) / (mx - mn + 1e-5)
            else:
                x = x / 255.0
            x = (x - mean) / std
        elif cfg.DATASET.NAME in ("Cifar10", "Cifar100"):
            from ...data.datasets.cifar import CIFAR10_MEAN, CIFAR10_STD, CIFAR100_MEAN, CIFAR100_STD
            m, s = (CIFAR10_MEAN, CIFAR10_STD) if cfg.DATASET.NAME == "Cifar10" else (CIFAR100_MEAN, CIFAR100_STD)
            # loader yields uint8 HWC; normalize then bilinear-resize on device
            x = x / 255.0
            x = (x - jnp.asarray(m)) / jnp.asarray(s)
            x = x.transpose(0, 3, 1, 2)
            size = cfg.INPUT.SIZE[0] if not isinstance(cfg.INPUT.SIZE, str) else 224
            x = jax.image.resize(x, (x.shape[0], x.shape[1], size, size), method="bilinear")
        return x

    def _forward(self, trainable, frozen, stats, image, attr, train):
        """Full CustomCLIP forward (GLP_OT_SVLoRA.py:677-757): returns
        (logits [b, n_cls], OT-validity flag, new BN stats)."""
        cfg_t = self.cfg.TRAINER.GLP_OT
        policy = self.policy
        # trainable LayerNorm overrides (GLP_OT.py:414-426)
        if "visual_ln_pre" in trainable:
            frozen = dict(frozen)
            frozen["visual"] = {**frozen["visual"],
                                "ln_pre": trainable["visual_ln_pre"]}
        x = self._preprocess(trainable, image)

        lora = trainable.get("image_encoder_lora")
        attr_mix = None
        if lora is not None:
            attr_mix = group_mix(attr, self.num_groups, x.shape[0] if attr is None else attr.shape[0], jnp.float32)

        if self.backbone_type == "resnet":
            from ...models.resnet_clip import resnet_encode

            tokens, new_stats = resnet_encode(
                frozen["visual"],
                trainable.get("visual_bn", frozen.get("visual_bn")), stats, x,
                self.bundle.rn_cfg, policy, train=train, return_tokens=True,
                lora=lora, attnpool_lora=trainable.get("attnpool_lora"),
                attr_mix=attr_mix, lora_scaling=self.lora_scaling,
            )
        else:
            if self.is_3d_input and x.shape[0] > image.shape[0]:
                # 3D volumes slice-expand the image batch (B' = b·num_slices,
                # GLP_OT_SVLoRA.py:684-693).  Per-image ViT compute is
                # independent — the batch nonlinearities (fairness loss,
                # softmax) all come after feature extraction — so run the
                # tower in volume-batch-sized chunks via lax.map (a scan
                # inside the same program, zero dispatch cost).  Measured on
                # v5e: the b32 step regime is ~25% faster per image than
                # b64+ (saved-activation HBM traffic grows with batch), so
                # chunking the slice-doubled batch recovers the optimal
                # regime.  Bit-identical grouping: slices of volume v are
                # consecutive rows (2v, 2v+1), and the pre-expanded attr_mix
                # is chunked by the same reshape.
                b = image.shape[0]
                num_slices = x.shape[0] // b
                xs = x.reshape(num_slices, b, *x.shape[1:])

                def _enc(x_c, mix_c):
                    return vit_encode(
                        frozen["visual"], x_c, self.bundle.clip_cfg, policy,
                        return_tokens=True, lora=lora, attr_mix=mix_c,
                        lora_scaling=self.lora_scaling)

                if attr_mix is not None:
                    # group_mix is per-volume ([b, G]) when attrs exist and
                    # already slice-expanded ([B', G]) when attr is None
                    mixs = (jnp.repeat(attr_mix, num_slices, axis=0)
                            if attr_mix.shape[0] == b else attr_mix)
                    mixs = mixs.reshape(num_slices, b, -1)
                else:
                    mixs = [None] * num_slices
                if num_slices <= 4:
                    # unrolled, with an optimization_barrier CHAINING chunk
                    # i+1's input on chunk i's output: the chunks are
                    # otherwise independent subgraphs and XLA's latency-
                    # hiding scheduler interleaves them, which lands the
                    # step in the slower large-batch regime (saved-residual
                    # HBM traffic doubles; see the remat frontier table in
                    # CLAUDE.md).  The barrier forces back-to-back b32
                    # chunks — measured on v5e at num_slices=2: 944 vs 898
                    # img-equiv/s unchained (b64 monolith: 840; chunk-level
                    # jax.checkpoint: 758).  Identity on values (and its
                    # transpose is a barrier too, so the backward chunks
                    # stay sequenced) — bit-exact vs the unchained form.
                    # Still faster than lax.map at num_slices=2 (no carry
                    # stacking).
                    outs = []
                    x_c = xs[0]
                    for i in range(num_slices):
                        o = _enc(x_c, mixs[i])
                        outs.append(o)
                        if i + 1 < num_slices:
                            x_c, outs[-1] = jax.lax.optimization_barrier(
                                (xs[i + 1], o))
                    tokens = jnp.concatenate(outs)
                elif attr_mix is not None:
                    tokens = jax.lax.map(lambda a: _enc(*a), (xs, mixs))
                    tokens = tokens.reshape(x.shape[0], *tokens.shape[2:])
                else:
                    tokens = jax.lax.map(lambda x_c: _enc(x_c, None), xs)
                    tokens = tokens.reshape(x.shape[0], *tokens.shape[2:])
            else:
                tokens = vit_encode(
                    frozen["visual"], x, self.bundle.clip_cfg, policy,
                    return_tokens=True, lora=lora, attr_mix=attr_mix,
                    lora_scaling=self.lora_scaling,
                )  # [B', 1+M, d]
            new_stats = stats
        image_feats = l2_normalize(tokens[:, 1:])          # [B', M, d]
        Bp, M, d = image_feats.shape

        ctx = trainable["prompt_learner"]["ctx"].astype(policy.compute_dtype)
        prompts = assemble_prompts(ctx, self.prompt_state)
        text_feats = text_encode(frozen, prompts, self.prompt_state.eot_indices,
                                 self.bundle.clip_cfg, policy)
        text_feats = l2_normalize(text_feats.reshape(self.N, self.n_cls, d))

        # sim: [B', M, N, n_cls] → [B'·n_cls, M, N]
        sim = jnp.einsum("bmd,ncd->bmnc", image_feats, text_feats.astype(image_feats.dtype),
                         preferred_element_type=jnp.float32)
        sim = sim.transpose(0, 3, 1, 2).reshape(Bp * self.n_cls, M, self.N)
        wdist = 1.0 - sim

        valid = jnp.bool_(True)
        if cfg_t.OT == "Sinkhorn":
            xx = jnp.full((sim.shape[0], M), 1.0 / M, jnp.float32)
            yy = jnp.full((sim.shape[0], self.N), 1.0 / self.N, jnp.float32)
            KK = jnp.exp(-wdist / cfg_t.EPS)
            T, valid = sinkhorn(KK, xx, yy, thresh=cfg_t.THRESH, max_iter=cfg_t.MAX_ITER)
            sim_op = (T * sim).sum((1, 2))
        elif cfg_t.OT == "COT":
            xx = jnp.full((sim.shape[0], M), 1.0 / M, jnp.float32)
            # reference caps at sum(xx) = number of rows, NOT at 1.0
            # (torch.sum of a [rows, M] tensor of 1/M entries, :726)
            top_percent = min(float(sim.shape[0]), cfg_t.TOP_PERCENT)
            yy = jnp.full((sim.shape[0], self.N), 1.0 / self.N, jnp.float32) * top_percent
            KK = jnp.exp(-wdist / cfg_t.EPS)
            T, valid = entropic_cot(KK, xx, yy, max_iter=cfg_t.MAX_ITER, thresh=cfg_t.THRESH)
            sim_op = (T * sim).sum((1, 2))
        elif cfg_t.OT == "None":
            sim_op = sim.mean((1, 2))
        else:
            raise NotImplementedError(cfg_t.OT)

        # [B'·n_cls] → [b, slices, n_cls] → mean over slices
        # (B' = b·num_slices for 3D volumes, B' = b otherwise;
        #  GLP_OT_SVLoRA.py:753-754)
        sim_op = sim_op.reshape(image.shape[0], -1, self.n_cls).mean(1)
        logit_scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
        logits = logit_scale * sim_op.astype(jnp.float32)
        return logits, valid, new_stats

    # ------------------------------------------------------------- steps
    def _build_loss_fn(self, data_axis=None):
        cfg = self.cfg
        lam = cfg.TRAINER.LAMBDA_FAIRNESS if self.use_lora else 0.0
        has_attr = not self.disable_attr
        # the reference's regulariser is accidentally detached (quirk, SURVEY
        # §2.4); this knob enables the INTENDED differentiable version
        diff_fair = bool(getattr(cfg.TRAINER.GLP_OT_LORA,
                                 "DIFFERENTIABLE_FAIRNESS", False))
        diff_prox = bool(getattr(cfg.TRAINER, "DIFFERENTIABLE_FEDPROX", False))

        def loss_fn(trainable, frozen, stats, image, label, attr, ctx_global, mu):
            logits, valid, new_stats = self._forward(trainable, frozen, stats, image, attr, train=True)
            cls_loss = cross_entropy(logits, label)
            loss = cls_loss
            if has_attr and lam != 0.0:
                # data_axis: group sums/counts psum over the shard axis —
                # the per-group means are nonlinear in the batch partition,
                # so a per-shard loss would NOT pmean to the full-batch value
                loss = loss + lam * fairness_confidence_loss(
                    logits, label, attr, self.num_groups,
                    differentiable=diff_fair, axis_name=data_axis)
            if ctx_global is not None:
                # FedProx proximal term (promptfl.py:290-293). The reference
                # builds it from detached state_dict() tensors, so it raises
                # the reported loss with ZERO gradient; default mirrors that
                # (extension here — the reference GLP trainers reject the
                # fedprox kwargs outright), --differentiable_fedprox opts in
                diff = trainable["prompt_learner"]["ctx"].astype(jnp.float32) - ctx_global
                term = (mu / 2.0) * jnp.sum(diff * diff)
                if not diff_prox:
                    term = jax.lax.stop_gradient(term)
                loss = loss + term
            return loss, (logits, valid, new_stats)

        return loss_fn

    def make_parallel_local_step(self, data_axis=None, fedprox_mu=None):
        """Functional per-batch local step for the client-parallel mesh round
        (fed/parallel_driver.py): ``(trainable, opt_state, frozen, batch) ->
        (trainable, opt_state, metrics[loss, valid, acc])``.

        ResNet backbones thread their per-client BatchNorm statistics inside
        the trainable tree under ``__bn_stats__`` (see
        :meth:`parallel_trainable`): split out before the grad so the
        optimizer tree matches, then overwritten with the forward's updated
        running stats — UNMASKED by OT validity, mirroring the sequential
        step (torch updates running stats during the forward even when the
        reference aborts the optimizer step).  The aggregation program then
        averages them with every other non-special key, matching the
        reference's buffer-averaging state_dict semantics.  When ``data_axis``
        is given, gradients/metrics are pmean-ed over that mesh axis
        (within-client data parallelism) and OT validity combines with AND so
        every data shard takes the same skip decision.  ``fedprox_mu`` enables
        the FedProx proximal pull toward ``frozen['__ctx_global__']``.
        """
        if self.backbone_type == "resnet" and data_axis is not None:
            # per-shard BN batch statistics would diverge from the sequential
            # oracle; the runner builds (clients, 1) meshes for RN instead
            raise NotImplementedError(
                "RN parallel rounds do not shard the within-client batch")
        loss_fn = self._build_loss_fn(data_axis=data_axis)
        tx = self.tx
        n_opt = self.opt_steps_per_batch
        has_stats = self.backbone_type == "resnet"

        def local_step(trainable, opt_state, frozen, batch):
            ctx_g = frozen["__ctx_global__"] if fedprox_mu is not None else None
            if has_stats:
                stats = trainable["__bn_stats__"]
                params = {k: v for k, v in trainable.items()
                          if k != "__bn_stats__"}
            else:
                stats, params = {}, trainable
            (loss, (logits, valid, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, frozen, stats, batch["img"], batch["label"],
                batch.get("attr"), ctx_g,
                jnp.float32(0.0 if fedprox_mu is None else fedprox_mu))
            acc = accuracy_from_logits(logits, batch["label"])
            if data_axis is not None:
                grads = jax.lax.pmean(grads, data_axis)
                loss = jax.lax.pmean(loss, data_axis)
                acc = jax.lax.pmean(acc, data_axis)
                valid = jax.lax.pmin(valid.astype(jnp.int32), data_axis).astype(jnp.bool_)
            new_trainable, new_opt_state = _apply_opt(
                tx, grads, opt_state, params, n_opt)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(valid, a, b), new, old)
            trainable = keep(new_trainable, params)
            opt_state = keep(new_opt_state, opt_state)
            if has_stats:
                trainable = dict(trainable, __bn_stats__=new_stats)
            # zero BOTH loss and acc on an invalid (NaN-OT) step: the round
            # runner divides each by the valid count, so an unmasked acc
            # would inflate the per-client average exactly when OT diverges
            metrics = jnp.stack([jnp.where(valid, loss, 0.0),
                                 valid.astype(jnp.float32),
                                 jnp.where(valid, acc, 0.0)])
            return trainable, opt_state, metrics

        return local_step

    def make_parallel_infer(self):
        """Functional eval forward for the client-parallel batched eval
        (fed/parallel_driver.py): ``(trainable, frozen, image, attr) ->
        logits``.  RN trees carry their running stats under ``__bn_stats__``
        (parallel_trainable) and evaluate with them."""

        def infer(trainable, frozen, image, attr):
            if "__bn_stats__" in trainable:
                stats = trainable["__bn_stats__"]
                trainable = {k: v for k, v in trainable.items()
                             if k != "__bn_stats__"}
            else:
                stats = {}
            logits, _, _ = self._forward(trainable, frozen, stats, image, attr,
                                         train=False)
            return logits

        return infer

    def parallel_trainable(self):
        """The pytree the client-parallel runner stacks per client: for RN
        backbones the BatchNorm running statistics ride along under
        ``__bn_stats__`` so each client's stats stream stays personal and
        aggregates with the state (reference buffers travel in state_dict,
        fed_utils.py:6-40)."""
        if self.backbone_type == "resnet":
            return dict(self.trainable, __bn_stats__=self.stats)
        return self.trainable

    def adopt_parallel_trainable(self, tree):
        """Install a tree produced by :meth:`parallel_trainable` (or one
        client's row of the stacked state) back into the trainer."""
        if isinstance(tree, dict) and "__bn_stats__" in tree:
            self.stats = tree["__bn_stats__"]
            tree = {k: v for k, v in tree.items() if k != "__bn_stats__"}
        self.trainable = tree

    @property
    def supports_data_axis(self):
        """RN BatchNorm batch statistics are per-shard; within-client data
        sharding would change them vs the sequential oracle."""
        return self.backbone_type == "vit"

    def _compile_steps(self):
        loss_fn = self._build_loss_fn()

        def train_step(trainable, opt_state, stats, frozen, image, label, attr, ctx_global, mu):
            (loss, (logits, valid, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, frozen, stats, image, label, attr, ctx_global, mu)
            new_trainable, new_opt_state = _apply_opt(
                self.tx, grads, opt_state, trainable, self.opt_steps_per_batch)
            # an invalid (NaN) OT plan skips the WHOLE optimizer step — the
            # reference returns None from forward and never steps
            # (GLP_OT_SVLoRA.py:738-743); selecting only the grads would
            # still let weight decay and momentum mutate every parameter
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(valid, a, b), new, old)
            trainable = keep(new_trainable, trainable)
            opt_state = keep(new_opt_state, opt_state)
            # metrics packed into ONE array so the host needs a single
            # fetch per step: [loss, valid, acc, probs.ravel()]
            metrics = jnp.concatenate([
                jnp.stack([jnp.where(valid, loss, jnp.nan),
                           valid.astype(jnp.float32),
                           accuracy_from_logits(logits, label)]),
                label.astype(jnp.float32),
                jax.nn.softmax(logits.astype(jnp.float32), -1).ravel(),
            ])
            return trainable, opt_state, new_stats, metrics

        def infer(trainable, frozen, stats, image, attr):
            logits, _, _ = self._forward(trainable, frozen, stats, image, attr, train=False)
            return logits

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        self._infer = jax.jit(infer)

    # ------------------------------------------------------------- hot loop
    def forward_backward(self, batch):
        if self.cfg.DATASET.NAME in MEDICAL_DATASETS:
            image, label, attrs, tgt_attr = self.parse_batch_train(batch)
        else:
            image, label = self.parse_batch_train(batch)
            tgt_attr = None

        ctx_global = getattr(self, "_fedprox_ctx_global", None) if getattr(self, "fedprox", False) else None
        mu = getattr(self, "mu", 0.5)

        self.trainable, self.opt_state, self.stats, metrics = self._train_step(
            self.trainable, self.opt_state, self.stats, self.frozen,
            image, label, tgt_attr, ctx_global, jnp.float32(mu))

        m = np.asarray(metrics)  # one host fetch: [loss, valid, acc, label, probs]
        loss, valid, acc = float(m[0]), bool(m[1]), float(m[2])
        if valid:
            # genuine NaN/Inf divergence raises like the reference's
            # detect_anomaly (trainer.py:260-262); an invalid OT plan is the
            # only sanctioned NaN (its step was skipped above)
            self.detect_anomaly(loss)
        loss_summary = {"loss": loss, "acc": acc}

        if self.cfg.DATASET.NAME in MEDICAL_DATASETS and valid:
            B = int(label.shape[0])
            label_h = m[3 : 3 + B].astype(np.int64)  # from the same fetch
            probs = m[3 + B :].reshape(-1, self.n_cls)
            if len(set(label_h.tolist())) == 1:
                loss_summary["auc"] = 1
            else:
                loss_summary["auc"] = eval_metrics.compute_auc(probs, label_h,
                                                               num_classes=self.n_cls)

        if (self.batch_idx + 1) == self.num_batches:
            self.update_lr()
            self.opt_state = set_learning_rate(self.opt_state, self.get_current_lr())
        return loss_summary

    def parse_batch_train(self, batch):
        image = jnp.asarray(batch["img"])
        label = jnp.asarray(batch["label"])
        if self.cfg.DATASET.NAME in MEDICAL_DATASETS:
            attrs = jnp.asarray(batch["attrs"])  # [B, A]
            if self.disable_attr:
                tgt_attr = None
            else:
                idx = list(self.cfg.DATASET.ATTRIBUTES).index(self.cfg.DATASET.ATTRIBUTE_TYPE)
                tgt_attr = attrs[:, idx]
            return image, label, attrs, tgt_attr
        return image, label

    def parse_batch_test(self, batch):
        image = jnp.asarray(batch["img"])
        label = batch["label"]
        if self.cfg.DATASET.NAME in MEDICAL_DATASETS:
            attrs = batch["attrs"]
            if self.disable_attr:
                tgt_attr = None
            else:
                idx = list(self.cfg.DATASET.ATTRIBUTES).index(self.cfg.DATASET.ATTRIBUTE_TYPE)
                tgt_attr = jnp.asarray(attrs[:, idx])
            return image, label, attrs, tgt_attr
        return image, label, None, None

    def model_inference(self, inp, attr=None):
        return self._infer(self.trainable, self.frozen, self.stats, inp, attr)

    # ------------------------------------------------------------- weights
    def state_dict(self):
        """Flat numpy dict with reference-style key names.

        LoRA leaves are UNSTACKED to per-layer keys
        ``image_encoder.transformer.resblocks.{i}.mlp.{c_fc,c_proj}.{lora_*}.weight``
        so lora_S keeps shape [num_groups, rank] — the group-weighted FedAvg
        predicate (`'lora_S' in key and shape[0]==n_groups`, fed_utils.py:29)
        applies verbatim.
        """
        from ...core.pytree import flatten_paths, pack_named_arrays, unpack_named_arrays

        # 1) collect DEVICE arrays under internal names (stacked lora stays
        #    stacked — unstacking happens on host after the single pull)
        dev = {"prompt_learner.ctx": self.trainable["prompt_learner"]["ctx"]}
        if "visual_ln_pre" in self.trainable:
            dev["image_encoder.ln_pre.weight"] = self.trainable["visual_ln_pre"]["weight"]
            dev["image_encoder.ln_pre.bias"] = self.trainable["visual_ln_pre"]["bias"]
        if "proj_per_3d_slice" in self.trainable:
            dev["proj_per_3d_slice.weight"] = self.trainable["proj_per_3d_slice"]["weight"]
            dev["proj_per_3d_slice.bias"] = self.trainable["proj_per_3d_slice"]["bias"]
        lora = self.trainable.get("image_encoder_lora")
        if lora is not None and self.backbone_type == "vit":
            for part in ("c_fc", "c_proj"):
                for leaf, arr in lora[part].items():
                    dev[f"__stacked_lora__.{part}.{leaf}"] = arr
        elif lora is not None:  # resnet
            for lname, blocks in lora.items():
                for bi, block in enumerate(blocks):
                    for conv, leaves in block.items():
                        for leaf, arr in leaves.items():
                            dev[f"image_encoder.{lname}.{bi}.{conv}.{leaf}.weight"] = arr
        ap_lora = self.trainable.get("attnpool_lora")
        if ap_lora is not None:
            for name, leaves in ap_lora.items():
                for leaf, arr in leaves.items():
                    dev[f"image_encoder.attnpool.{name}.{leaf}.weight"] = arr
        if self.backbone_type == "resnet":
            # BN affine (trainable) + running stats (buffers) both travel in
            # the federated state, as in save_model_with_grad (trainer.py:177-186)
            bn_tree = self.trainable.get("visual_bn", self.frozen.get("visual_bn", {}))
            for k, v in flatten_paths(bn_tree).items():
                dev[f"image_encoder.{k}"] = v
            for k, v in flatten_paths(self.stats).items():
                suffix = "running_mean" if k.endswith(".mean") else "running_var"
                dev[f"image_encoder.{k.rsplit('.', 1)[0]}.{suffix}"] = v

        # 2) ONE device→host transfer for the whole state (a pull per leaf is
        #    a blocking round-trip each — the dominant cost of a federated
        #    round on a remote-TPU attachment)
        flat, meta = pack_named_arrays(dev)
        host = unpack_named_arrays(flat, meta)

        # 3) expand internal names to reference-style keys
        out = {}
        for key, arr in host.items():
            if key.startswith("__stacked_lora__."):
                _, part, leaf = key.split(".", 2)
                for i in range(arr.shape[0]):
                    out[f"image_encoder.transformer.resblocks.{i}.mlp.{part}.{leaf}.weight"] = arr[i]
            else:
                out[key] = arr
        return out

    def load_state_dict(self, state, strict=False):
        t = jax.tree_util.tree_map(lambda x: x, self.trainable)  # shallow copy
        if "prompt_learner.ctx" in state:
            t["prompt_learner"]["ctx"] = jnp.asarray(state["prompt_learner.ctx"],
                                                     t["prompt_learner"]["ctx"].dtype)
        if "visual_ln_pre" in t and "image_encoder.ln_pre.weight" in state:
            t["visual_ln_pre"] = {
                "weight": jnp.asarray(state["image_encoder.ln_pre.weight"], jnp.float32),
                "bias": jnp.asarray(state["image_encoder.ln_pre.bias"], jnp.float32),
            }
        if "proj_per_3d_slice" in t and "proj_per_3d_slice.weight" in state:
            t["proj_per_3d_slice"] = {
                "weight": jnp.asarray(state["proj_per_3d_slice.weight"], jnp.float32),
                "bias": jnp.asarray(state["proj_per_3d_slice.bias"], jnp.float32),
            }
        lora = t.get("image_encoder_lora")
        if lora is not None and self.backbone_type == "vit":
            L = self.bundle.clip_cfg.vision_layers
            new_lora = {}
            for part in ("c_fc", "c_proj"):
                new_part = {}
                for leaf, arr in lora[part].items():
                    keys = [f"image_encoder.transformer.resblocks.{i}.mlp.{part}.{leaf}.weight"
                            for i in range(L)]
                    if all(k in state for k in keys):
                        new_part[leaf] = jnp.asarray(np.stack([state[k] for k in keys]), arr.dtype)
                    else:
                        if strict:
                            missing = [k for k in keys if k not in state]
                            raise KeyError(f"Missing keys: {missing[:3]}...")
                        new_part[leaf] = arr
                new_lora[part] = new_part
            t["image_encoder_lora"] = new_lora
        elif lora is not None:  # resnet
            new_lora = {}
            for lname, blocks in lora.items():
                new_blocks = []
                for bi, block in enumerate(blocks):
                    nb = {}
                    for conv, leaves in block.items():
                        nb[conv] = {}
                        for leaf, arr in leaves.items():
                            key = f"image_encoder.{lname}.{bi}.{conv}.{leaf}.weight"
                            nb[conv][leaf] = jnp.asarray(state[key], arr.dtype) if key in state else arr
                    new_blocks.append(nb)
                new_lora[lname] = new_blocks
            t["image_encoder_lora"] = new_lora
        ap_lora = t.get("attnpool_lora")
        if ap_lora is not None:
            new_ap = {}
            for name, leaves in ap_lora.items():
                new_ap[name] = {}
                for leaf, arr in leaves.items():
                    key = f"image_encoder.attnpool.{name}.{leaf}.weight"
                    new_ap[name][leaf] = jnp.asarray(state[key], arr.dtype) if key in state else arr
            t["attnpool_lora"] = new_ap
        if self.backbone_type == "resnet":
            from ...core.pytree import flatten_paths, unflatten_paths

            # BN affine lives in the trainable tree for SVLoRA, in frozen for
            # plain GLP_OT (reference freezes it there, GLP_OT.py:416-429) —
            # load into whichever holds it
            bn_trainable = "visual_bn" in t
            bn_tree = t["visual_bn"] if bn_trainable else self.frozen["visual_bn"]
            bn_flat = flatten_paths(bn_tree)
            for k in list(bn_flat):
                sk = f"image_encoder.{k}"
                if sk in state:
                    bn_flat[k] = jnp.asarray(state[sk], jnp.float32)
            new_bn = unflatten_paths(bn_flat)
            stats_flat = flatten_paths(self.stats)
            for k in list(stats_flat):
                suffix = "running_mean" if k.endswith(".mean") else "running_var"
                sk = f"image_encoder.{k.rsplit('.', 1)[0]}.{suffix}"
                if sk in state:
                    stats_flat[k] = jnp.asarray(state[sk], jnp.float32)
            new_stats = unflatten_paths(stats_flat)
            # unflatten rebuilds dicts; restore list-of-blocks structure
            if bn_trainable:
                t["visual_bn"] = _redictify_like(t["visual_bn"], new_bn)
            else:
                self.frozen["visual_bn"] = _redictify_like(
                    self.frozen["visual_bn"], new_bn)
            self.stats = _redictify_like(self.stats, new_stats)
        self.trainable = t

    def set_fedprox_global(self, state):
        self._fedprox_ctx_global = jnp.asarray(state["prompt_learner.ctx"], jnp.float32)

    def named_parameters(self):
        """All params (frozen + trainable) with reference-ish dotted names —
        used by the CLI's count_parameters tables (utils/fed_utils.py:103)."""
        from ...core.pytree import flatten_paths

        out = {}
        for k, v in flatten_paths({"image_encoder": self.frozen["visual"],
                                   "text_encoder": self.frozen["text"]}).items():
            out[k] = v
        out.update(self.state_dict())
        return out

    def optimizer_state_dict(self):
        return jax.tree_util.tree_map(np.asarray, self.opt_state)

    def load_optimizer_state_dict(self, state):
        self.opt_state = jax.tree_util.tree_map(
            lambda cur, new: jnp.asarray(new, cur.dtype) if hasattr(cur, "dtype") else new,
            self.opt_state, state)


@TRAINER_REGISTRY.register()
class GLP_OT(GLPOTBase):
    """Prompt-only GLP-OT (trainers/GLP_OT.py:390-568)."""

    use_lora = False


@TRAINER_REGISTRY.register()
class GLP_OT_SVLoRA(GLPOTBase):
    """FairLoRA: GLP-OT + grouped low-rank adapters
    (trainers/GLP_OT_SVLoRA.py:767-1054)."""

    use_lora = True
