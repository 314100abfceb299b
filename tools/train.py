"""Standalone (non-federated) training CLI — Dassl's ``tools/train.py``.

Reference surface: ``/root/reference/Dassl/tools/train.py:1-190`` — the
generic single-site trainer driver: argparse → ``setup_cfg`` (dataset cfg
file → method cfg file → ``reset_cfg`` → opts → ``clean_cfg`` → freeze) →
seed/logger/diagnostics → ``build_trainer(cfg)`` → ``--eval-only`` |
``--no-train`` | ``trainer.train()``.

Standalone here means ONE site: the whole train split is client 0
(``cfg.DATASET.USERS = 1``) and the trainer runs its epoch loop once,
outside any aggregation — semantically Dassl's plain supervised loop
(Dassl trainer.py:281-291 generic train). Deliberate deltas from the
reference file, both documented inline:

* ``extend_cfg`` is NOT a no-op: the registered trainers (PromptFL / CLIP /
  Baseline / GLP_OT*) read the method config nodes that the federated CLI
  installs (reference federated_main.py:60-127), so we install the same
  nodes from the federated parser's defaults.  In the reference, Dassl's
  train.py cannot actually run those trainers for the same reason — its
  empty ``extend_cfg`` is a hook, not a capability.
* ``clean_cfg`` keeps any ``TRAINER.<X>`` node whose name prefixes the
  selected trainer (GLP_OT_SVLoRA reads ``TRAINER.GLP_OT``) plus the
  non-prefix shared nodes in ``_EXTRA_TRAINER_NODES`` (CLIP/Baseline read
  ``TRAINER.PROMPTFL``); the reference version
  (dassl/config/__init__.py:8-21) pops every non-exact match, which is
  display-only hygiene there because those trainers never run under it.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import federated_main  # noqa: E402  (extend_cfg/print_args live there)
from fairfedmed_tpu.config import get_cfg_default  # noqa: E402
from fairfedmed_tpu.train import build_trainer  # noqa: E402
from fairfedmed_tpu.utils.logger import setup_logger  # noqa: E402
from fairfedmed_tpu.utils.tools import set_random_seed  # noqa: E402


# Nodes a trainer reads beyond its own name: CLIP/Baseline share PromptFL's
# precision node (promptfl.py:31 ``prec_node = "PROMPTFL"``), the GLP_OT
# family reads both TRAINER.GLP_OT and TRAINER.GLP_OT_LORA (glp_ot.py).
_EXTRA_TRAINER_NODES = {
    "CLIP": ("PROMPTFL",),
    "BASELINE": ("PROMPTFL",),
    "GLP_OT": ("GLP_OT_LORA",),
    "GLP_OT_SVLORA": ("GLP_OT", "GLP_OT_LORA"),
}


def clean_cfg(cfg, trainer):
    """Remove other trainers' config nodes (reference
    dassl/config/__init__.py:8-21), keeping the nodes the selected trainer
    actually reads: any node whose name PREFIXES the trainer name (GLP_OT
    for GLP_OT_SVLORA — covers future family variants without a table
    entry), plus the non-prefix shared nodes listed in
    ``_EXTRA_TRAINER_NODES`` (CLIP/Baseline read TRAINER.PROMPTFL, the
    GLP_OT family reads TRAINER.GLP_OT_LORA)."""
    if not trainer:
        return
    want = trainer.upper()
    keep = {"NAME", want, *_EXTRA_TRAINER_NODES.get(want, ())}
    for key in list(cfg.TRAINER.keys()):
        if key not in keep and not want.startswith(key):
            dict.pop(cfg.TRAINER, key, None)


def reset_cfg(cfg, args):
    """Arg→cfg overrides (reference Dassl/tools/train.py:23-52)."""
    if args.root:
        cfg.DATASET.ROOT = args.root
    if args.output_dir:
        cfg.OUTPUT_DIR = args.output_dir
    if args.resume:
        cfg.RESUME = args.resume
    if args.seed is not None and args.seed >= 0:
        cfg.SEED = args.seed
    if args.source_domains:
        cfg.DATASET.SOURCE_DOMAINS = args.source_domains
    if args.target_domains:
        cfg.DATASET.TARGET_DOMAINS = args.target_domains
    if args.transforms:
        cfg.INPUT.TRANSFORMS = args.transforms
    if args.trainer:
        cfg.TRAINER.NAME = args.trainer
    if args.backbone:
        cfg.MODEL.BACKBONE.NAME = args.backbone
    if args.head:
        cfg.MODEL.HEAD.NAME = args.head


def _fed_defaults(args):
    """The federated parser's default namespace, used to install the method
    config nodes that registered trainers read (federated_main.py:60-127).
    Only the schema keys shared with this CLI are carried over."""
    fed = federated_main.build_arg_parser().parse_args([])
    if args.backbone:
        fed.backbone = args.backbone
    if args.trainer:
        fed.trainer = args.trainer
    fed.num_users = 1
    fed.frac = 1.0
    return fed


def setup_cfg(args):
    cfg = get_cfg_default()
    federated_main.extend_cfg(cfg, _fed_defaults(args))
    if args.dataset_config_file:
        cfg.merge_from_file(args.dataset_config_file)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    reset_cfg(cfg, args)
    if args.opts:
        cfg.merge_from_list(args.opts)
    # standalone = one site holding the full train split — forced AFTER the
    # file/opts merges so a reused federated config (DATASET.USERS 10) can't
    # silently shard the data and train on shard 0 only
    if cfg.DATASET.USERS != 1:
        if cfg.DATASET.USERS > 1:
            print(f"Note: overriding DATASET.USERS={cfg.DATASET.USERS} -> 1 "
                  "(standalone CLI trains the whole split as one site; use "
                  "federated_main.py for federated runs)")
        cfg.DATASET.USERS = 1
    clean_cfg(cfg, args.trainer)
    cfg.freeze()
    return cfg


def load_model(trainer, directory, epoch=None):
    """Load weights for ``--eval-only`` from a checkpoint directory: either
    the full format written by ``save_checkpoint`` (``model.pth.tar-N`` +
    ``checkpoint`` pointer, reference torchtools.py:27-82) or a grad-only
    ``.npz`` from ``save_model``."""
    if not directory:
        print("Note: model directory empty, evaluating the built model as-is")
        return
    if epoch is not None:
        path = os.path.join(directory, f"model.pth.tar-{epoch}")
        if os.path.exists(path):
            import pickle

            with open(path, "rb") as f:
                ckpt = pickle.load(f)
            trainer.load_state_dict(ckpt["state_dict"], strict=False)
            print(f"Loaded {path} (epoch={ckpt['epoch']})")
            return
        raise FileNotFoundError(f'No checkpoint "model.pth.tar-{epoch}" '
                                f"under {directory}")
    if os.path.exists(os.path.join(directory, "checkpoint")):
        trainer.resume_from_checkpoint(directory)
        return
    npzs = sorted(p for p in os.listdir(directory) if p.endswith(".npz"))
    if not npzs:
        raise FileNotFoundError(f"No checkpoint found under {directory}")
    path = os.path.join(directory, npzs[-1])
    with np.load(path) as z:
        trainer.load_state_dict({k: z[k] for k in z.files}, strict=False)
    print(f"Loaded {path}")


def main(args):
    cfg = setup_cfg(args)
    if cfg.SEED >= 0:
        print("Setting fixed seed: {}".format(cfg.SEED))
        set_random_seed(cfg.SEED)
    setup_logger(cfg.OUTPUT_DIR)
    federated_main.print_args(args, cfg)

    trainer = build_trainer(cfg)

    if args.eval_only:
        load_model(trainer, args.model_dir, epoch=args.load_epoch)
        result = trainer.test(idx=0)
        return {"test": result}

    out = {}
    if not args.no_train:
        trainer.fed_before_train()
        if cfg.RESUME:
            trainer.start_epoch = trainer.resume_from_checkpoint(cfg.RESUME)
        trainer.train(idx=0, global_epoch=0, is_fed=False)
        trainer.fed_after_train()
        ckpt_dir = os.path.join(cfg.OUTPUT_DIR, "checkpoints")
        trainer.save_checkpoint(trainer.max_epoch - 1, ckpt_dir)
        if not cfg.TEST.NO_TEST:
            out["test"] = trainer.test(idx=0, current_epoch=trainer.max_epoch)
    return out


def build_arg_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", type=str, default="", help="path to dataset")
    parser.add_argument("--output-dir", type=str, default="",
                        help="output directory")
    parser.add_argument("--resume", type=str, default="",
                        help="checkpoint directory (from which the training "
                             "resumes)")
    parser.add_argument("--seed", type=int, default=-1,
                        help="only positive value enables a fixed seed")
    parser.add_argument("--source-domains", type=str, nargs="+",
                        help="source domains for DA/DG")
    parser.add_argument("--target-domains", type=str, nargs="+",
                        help="target domains for DA/DG")
    parser.add_argument("--transforms", type=str, nargs="+",
                        help="data augmentation methods")
    parser.add_argument("--config-file", type=str, default="",
                        help="path to config file")
    parser.add_argument("--dataset-config-file", type=str, default="",
                        help="path to config file for dataset setup")
    parser.add_argument("--trainer", type=str, default="",
                        help="name of trainer")
    parser.add_argument("--backbone", type=str, default="",
                        help="name of CNN backbone")
    parser.add_argument("--head", type=str, default="", help="name of head")
    parser.add_argument("--eval-only", action="store_true",
                        help="evaluation only")
    parser.add_argument("--model-dir", type=str, default="",
                        help="load model from this directory for eval-only "
                             "mode")
    parser.add_argument("--load-epoch", type=int,
                        help="load model weights at this epoch for evaluation")
    parser.add_argument("--no-train", action="store_true",
                        help="do not call trainer.train()")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="modify config options using the command-line")
    return parser


if __name__ == "__main__":
    main(build_arg_parser().parse_args())
