"""PromptFL, zero-shot CLIP, and Baseline method trainers.

Capability match of trainers/promptfl.py:228-372 and trainers/clip.py:76-231:

* ``PromptFL`` — learnable single prompt bank, cosine logits over pooled CLIP
  features, CE loss with optional FedProx proximal term.
* ``CLIP`` — frozen zero-shot baseline: prompts initialised from
  "a photo of a" and never trained; eval-only.
* ``Baseline`` — plain supervised backbone+linear-head (SimpleNet,
  Dassl/dassl/engine/trainer.py:48-105) on a small conv net.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...models.clip_model import l2_normalize, text_encode, vit_encode
from ...models.prompt_learner import assemble_prompts, init_prompt_learner
from ...utils.registry import TRAINER_REGISTRY
from ..clip_common import accuracy_from_logits, cross_entropy, load_clip_bundle
from ..engine import TrainerX
from ..optim import build_lr_scheduler, build_optimizer, set_learning_rate


class _CosineCLIPTrainer(TrainerX):
    """Shared: pooled-feature cosine logits with a learnable prompt."""

    prec_node = "PROMPTFL"
    trainable_prompt = True

    def check_cfg(self, cfg):
        assert cfg.TRAINER[self.prec_node].PREC in ["fp16", "fp32", "amp"]

    def build_model(self):
        cfg = self.cfg
        node = cfg.TRAINER[self.prec_node]
        bundle = load_clip_bundle(cfg, node.PREC)
        self.bundle = bundle
        self.policy = bundle.policy
        classnames = list(self.dm.dataset.classnames)
        self.n_cls = len(classnames)

        rng = jax.random.PRNGKey(cfg.SEED if cfg.SEED >= 0 else 0)
        ctx_init = node.CTX_INIT if node.CTX_INIT else (
            "a photo of a" if not self.trainable_prompt else False)
        pl_params, self.prompt_state = init_prompt_learner(
            rng, classnames, bundle.params["text"]["token_embedding"].astype(jnp.float32),
            bundle.clip_cfg, n_ctx=node.N_CTX, n_prompts=1,
            ctx_init=ctx_init, csc=node.CSC,
            class_token_position=node.CLASS_TOKEN_POSITION,
        )
        self.trainable = {"prompt_learner": pl_params}
        self.frozen = bundle.params
        if bundle.backbone_type == "resnet":
            # BN trees ride the frozen pytree as jit ARGUMENTS — closing over
            # device arrays embeds them as MLIR constants and forces a host
            # materialization per trace (see CLAUDE.md / clip_model.py)
            self.frozen["visual_bn"] = bundle.visual_bn
            self.frozen["visual_stats"] = bundle.visual_stats

        self.tx = build_optimizer(cfg.OPTIM)
        self.opt_state = self.tx.init(self.trainable)
        self.lr_sched = build_lr_scheduler(cfg.OPTIM)
        # start at the schedule's epoch-0 LR (warmup): the injected optimizer
        # LR otherwise stays at base OPTIM.LR for the whole first epoch
        self.opt_state = set_learning_rate(self.opt_state, self.lr_sched.lr(0))
        self._compile()

    def _device_preprocess(self, image):
        cfg = self.cfg
        x = image.astype(jnp.float32)
        if cfg.DATASET.NAME in ("FairFedMed", "FedChexMimic", "WangGrant"):
            # the medical loaders bypass host transforms, and the reference
            # PromptFL/CLIP forward consumes the RAW 0-255 tensor as-is
            # (promptfl.py:211-224, clip.py:218-231 — only the GLP models
            # normalize inside forward).  Mirror that by default;
            # TRAINER.PROMPTFL.NORMALIZE_MEDICAL_INPUT opts into CLIP's
            # standard preprocessing
            if getattr(cfg.TRAINER[self.prec_node], "NORMALIZE_MEDICAL_INPUT",
                       False):
                mean = jnp.asarray(cfg.INPUT.PIXEL_MEAN, jnp.float32).reshape(1, -1, 1, 1)
                std = jnp.asarray(cfg.INPUT.PIXEL_STD, jnp.float32).reshape(1, -1, 1, 1)
                x = (x / 255.0 - mean) / std
        elif cfg.DATASET.NAME in ("Cifar10", "Cifar100"):
            from ...data.datasets.cifar import CIFAR10_MEAN, CIFAR10_STD, CIFAR100_MEAN, CIFAR100_STD
            m, s = (CIFAR10_MEAN, CIFAR10_STD) if cfg.DATASET.NAME == "Cifar10" else (CIFAR100_MEAN, CIFAR100_STD)
            x = x / 255.0
            x = (x - jnp.asarray(m)) / jnp.asarray(s)
            x = x.transpose(0, 3, 1, 2)
            size = cfg.INPUT.SIZE[0] if not isinstance(cfg.INPUT.SIZE, str) else 224
            x = jax.image.resize(x, (x.shape[0], x.shape[1], size, size), method="bilinear")
        return x

    def _forward(self, trainable, frozen, image):
        x = self._device_preprocess(image)
        if self.bundle.backbone_type == "resnet":
            # RN50 CLIP path (the reference's CustomCLIP uses clip_model.visual
            # generically, clip/model.py:574-580); BN runs in inference mode
            # here — PromptFL/CLIP freeze the image encoder entirely
            from ...models.resnet_clip import resnet_encode

            pooled, _ = resnet_encode(
                frozen["visual"], frozen["visual_bn"], frozen["visual_stats"],
                x, self.bundle.rn_cfg, self.policy,
                train=False, return_tokens=False)
        else:
            pooled = vit_encode(frozen["visual"], x, self.bundle.clip_cfg, self.policy)
        pooled = l2_normalize(pooled)
        ctx = trainable["prompt_learner"]["ctx"].astype(self.policy.compute_dtype)
        prompts = assemble_prompts(ctx, self.prompt_state)
        text = text_encode(frozen, prompts, self.prompt_state.eot_indices,
                           self.bundle.clip_cfg, self.policy)
        text = l2_normalize(text)
        logit_scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
        return logit_scale * (pooled @ text.T).astype(jnp.float32)

    def _compile(self):
        diff_prox = bool(getattr(self.cfg.TRAINER, "DIFFERENTIABLE_FEDPROX", False))

        def loss_fn(trainable, frozen, image, label, ctx_global, mu):
            logits = self._forward(trainable, frozen, image)
            loss = cross_entropy(logits, label)
            if ctx_global is not None:
                # reference promptfl.py:290-293 builds the proximal term from
                # state_dict() tensors, which torch DETACHES — it raises the
                # reported loss but contributes ZERO gradient; default mirrors
                # that, --differentiable_fedprox enables the intended pull
                diff = trainable["prompt_learner"]["ctx"].astype(jnp.float32) - ctx_global
                term = (mu / 2.0) * jnp.sum(diff * diff)
                if not diff_prox:
                    term = jax.lax.stop_gradient(term)
                loss = loss + term
            return loss, logits

        def train_step(trainable, opt_state, frozen, image, label, ctx_global, mu):
            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, frozen, image, label, ctx_global, mu)
            updates, opt_state = self.tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            # [loss, acc] packed: one host fetch per step
            return trainable, opt_state, jnp.stack(
                [loss, accuracy_from_logits(logits, label)])

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._infer = jax.jit(lambda t, f, img: self._forward(t, f, img))

    def make_parallel_local_step(self, data_axis=None, fedprox_mu=None):
        """Functional per-batch step for the client-parallel mesh round
        (fed/parallel_driver.py).  Works for both backbones: PromptFL keeps
        the image encoder (incl. BN stats) frozen, so there is no mutable
        per-client state beyond (trainable, opt_state).  With ``fedprox_mu``
        the FedProx proximal term pulls toward ``frozen['__ctx_global__']``
        (the round's global prompt, threaded by the runner)."""
        tx = self.tx
        diff_prox = bool(getattr(self.cfg.TRAINER, "DIFFERENTIABLE_FEDPROX", False))

        def loss_fn(trainable, frozen, image, label):
            logits = self._forward(trainable, frozen, image)
            loss = cross_entropy(logits, label)
            if fedprox_mu is not None:
                # detached by default — see _compile (reference quirk)
                diff = (trainable["prompt_learner"]["ctx"].astype(jnp.float32)
                        - frozen["__ctx_global__"])
                term = (fedprox_mu / 2.0) * jnp.sum(diff * diff)
                if not diff_prox:
                    term = jax.lax.stop_gradient(term)
                loss = loss + term
            return loss, logits

        def local_step(trainable, opt_state, frozen, batch):
            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, frozen, batch["img"], batch["label"])
            acc = accuracy_from_logits(logits, batch["label"])
            if data_axis is not None:
                grads = jax.lax.pmean(grads, data_axis)
                loss = jax.lax.pmean(loss, data_axis)
                acc = jax.lax.pmean(acc, data_axis)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, jnp.stack([loss, jnp.float32(1.0), acc])

        return local_step

    def make_parallel_infer(self):
        """Eval forward for the client-parallel batched eval."""
        def infer(trainable, frozen, image, attr):
            return self._forward(trainable, frozen, image)

        return infer

    def forward_backward(self, batch):
        image, label = self.parse_batch_train(batch)
        ctx_global = getattr(self, "_fedprox_ctx_global", None) if getattr(self, "fedprox", False) else None
        mu = getattr(self, "mu", 0.5)
        self.trainable, self.opt_state, metrics = self._train_step(
            self.trainable, self.opt_state, self.frozen, image, label,
            ctx_global, jnp.float32(mu))
        m = np.asarray(metrics)
        loss = float(m[0])
        self.detect_anomaly(loss)
        if (self.batch_idx + 1) == self.num_batches:
            self.update_lr()
            self.opt_state = set_learning_rate(self.opt_state, self.get_current_lr())
        return {"loss": loss, "acc": float(m[1])}

    def parse_batch_train(self, batch):
        return jnp.asarray(batch["img"]), jnp.asarray(batch["label"])

    def model_inference(self, inp, attr=None):
        return self._infer(self.trainable, self.frozen, inp)

    def set_fedprox_global(self, state):
        self._fedprox_ctx_global = jnp.asarray(state["prompt_learner.ctx"], jnp.float32)

    def state_dict(self):
        return {"prompt_learner.ctx": np.asarray(self.trainable["prompt_learner"]["ctx"], np.float32)}

    def load_state_dict(self, state, strict=False):
        if "prompt_learner.ctx" in state:
            cur = self.trainable["prompt_learner"]["ctx"]
            new = jnp.asarray(state["prompt_learner.ctx"], cur.dtype)
            if new.ndim == cur.ndim - 1:
                # reference PromptFL checkpoints store ctx [n_ctx, dim]
                # (promptfl.py:76-198, no prompt-bank axis); here the bank
                # always carries a leading prompt axis of size 1
                new = new[None]
            self.trainable["prompt_learner"]["ctx"] = new

    def named_parameters(self):
        from ...core.pytree import flatten_paths

        out = dict(flatten_paths({"image_encoder": self.frozen["visual"],
                                  "text_encoder": self.frozen["text"]}))
        out.update(self.state_dict())
        return out

    def optimizer_state_dict(self):
        return jax.tree_util.tree_map(np.asarray, self.opt_state)

    def load_optimizer_state_dict(self, state):
        self.opt_state = jax.tree_util.tree_map(
            lambda cur, new: jnp.asarray(new, cur.dtype) if hasattr(cur, "dtype") else new,
            self.opt_state, state)


@TRAINER_REGISTRY.register()
class PromptFL(_CosineCLIPTrainer):
    """Prompt-only federated learning (trainers/promptfl.py:228-345)."""


@TRAINER_REGISTRY.register()
class CLIP(_CosineCLIPTrainer):
    """Zero-shot CLIP baseline, eval-only (trainers/clip.py:76-231)."""

    trainable_prompt = False

    def forward_backward(self, batch):  # frozen model: nothing to train
        image, label = self.parse_batch_train(batch)
        logits = self._infer(self.trainable, self.frozen, image)
        return {"loss": 0.0, "acc": float(accuracy_from_logits(logits, label))}


@TRAINER_REGISTRY.register()
class Baseline(TrainerX):
    """Supervised backbone (+MLP head) + linear classifier — SimpleNet parity
    (trainers/promptfl.py:348-372 + Dassl/dassl/engine/trainer.py:48-105).

    Honors ``MODEL.BACKBONE.NAME`` (functional registry in
    models/backbones.py: resnet18/34/50, cnn3 default) and ``MODEL.HEAD.*``
    (mlp).  BatchNorm running stats thread through the jitted step and travel
    in the federated state dict."""

    def build_model(self):
        cfg = self.cfg
        self.n_cls = self.dm.num_classes
        rng = jax.random.PRNGKey(cfg.SEED if cfg.SEED >= 0 else 0)
        kb, kh, kc = jax.random.split(rng, 3)
        from ...models.backbones import build_backbone, build_head

        name = cfg.MODEL.BACKBONE.NAME or "cnn3"
        if cfg.MODEL.BACKBONE.PRETRAINED and name != "cnn3":
            print(f"NOTE: pretrained {name} weights unavailable offline; "
                  f"using random init")
        bb_init, bb_apply, fdim = build_backbone(name)
        head_apply = None
        head_init = None
        if cfg.MODEL.HEAD.NAME and cfg.MODEL.HEAD.HIDDEN_LAYERS:
            head_init, head_apply, fdim = build_head(
                cfg.MODEL.HEAD.NAME, fdim, cfg.MODEL.HEAD.HIDDEN_LAYERS,
                activation=cfg.MODEL.HEAD.ACTIVATION, bn=cfg.MODEL.HEAD.BN,
                dropout=cfg.MODEL.HEAD.DROPOUT)
        n_cls = self.n_cls

        # ONE jitted init program (CLAUDE.md rule): eager per-leaf init costs
        # one tunnel round-trip per parameter on a remote-TPU attachment
        @jax.jit
        def _init_all(kb, kh, kc):
            bb_params, bb_stats = bb_init(kb)
            trainable = {"backbone": bb_params}
            stats = {"backbone": bb_stats}
            if head_init is not None:
                trainable["head"], stats["head"] = head_init(kh)
            trainable["classifier"] = {
                "weight": jax.random.normal(kc, (n_cls, fdim)) * 0.01,
                "bias": jnp.zeros((n_cls,)),
            }
            return trainable, stats

        self.trainable, self.stats = _init_all(kb, kh, kc)
        self.frozen = {}
        self.fdim = fdim
        self.tx = build_optimizer(cfg.OPTIM)
        self.opt_state = self.tx.init(self.trainable)
        self.lr_sched = build_lr_scheduler(cfg.OPTIM)
        # start at the schedule's epoch-0 LR (warmup): the injected optimizer
        # LR otherwise stays at base OPTIM.LR for the whole first epoch
        self.opt_state = set_learning_rate(self.opt_state, self.lr_sched.lr(0))

        def forward(t, stats, image, train):
            x = image.astype(jnp.float32)
            if x.ndim == 4 and x.shape[-1] in (1, 3):
                x = x.transpose(0, 3, 1, 2) / 255.0
            f, new_bb = bb_apply(t["backbone"], stats["backbone"], x, train)
            new_stats = {"backbone": new_bb}
            if head_apply is not None:
                f, new_h = head_apply(t["head"], stats["head"], f, train)
                new_stats["head"] = new_h
            logits = f @ t["classifier"]["weight"].T + t["classifier"]["bias"]
            return logits, new_stats

        def train_step(t, opt_state, stats, image, label):
            def loss_fn(t):
                logits, new_stats = forward(t, stats, image, True)
                return cross_entropy(logits, label), (logits, new_stats)
            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(t)
            updates, opt_state = self.tx.update(grads, opt_state, t)
            t = optax.apply_updates(t, updates)
            return t, opt_state, new_stats, {
                "loss": loss, "acc": accuracy_from_logits(logits, label)}

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        self._infer = jax.jit(lambda t, stats, img: forward(t, stats, img, False)[0])

    def forward_backward(self, batch):
        image, label = jnp.asarray(batch["img"]), jnp.asarray(batch["label"])
        self.trainable, self.opt_state, self.stats, m = self._train_step(
            self.trainable, self.opt_state, self.stats, image, label)
        loss = float(m["loss"])
        self.detect_anomaly(loss)
        if (self.batch_idx + 1) == self.num_batches:
            self.update_lr()
            self.opt_state = set_learning_rate(self.opt_state, self.get_current_lr())
        return {"loss": loss, "acc": float(m["acc"])}

    def model_inference(self, inp, attr=None):
        return self._infer(self.trainable, self.stats, jnp.asarray(inp))

    def state_dict(self):
        from ...core.pytree import flatten_paths

        out = {k: np.asarray(v, np.float32)
               for k, v in flatten_paths(self.trainable).items()}
        # BN running stats travel with the federated state (cf. the GLP RN
        # path; averaging running stats across clients is the FedAvg norm)
        out.update({f"stats.{k}": np.asarray(v, np.float32)
                    for k, v in flatten_paths(self.stats).items()})
        return out

    def load_state_dict(self, state, strict=False):
        from ...core.pytree import replace_leaves_by_path

        self.trainable = replace_leaves_by_path(self.trainable, state)
        self.stats = replace_leaves_by_path(
            self.stats, {k[len("stats."):]: v for k, v in state.items()
                         if k.startswith("stats.")})

    def named_parameters(self):
        return self.state_dict()
