"""Trainer engine (capability match of Dassl/dassl/engine/trainer.py:108-751).

Redesigned for JAX/TPU:

* model state is a pair of pytrees — ``frozen`` (CLIP backbone, never updated)
  and ``trainable`` (prompt ctx, adapters, projections, norm stats) — instead
  of an nn.Module with requires_grad flags;
* ``forward_backward`` is a single jit-compiled step: value_and_grad over the
  trainable tree, optax update, metrics — one compiled program per batch shape;
* the federated weight exchange (``state_dict``/``load_state_dict``) moves only
  the trainable tree + mutable stats, as dotted-path numpy dicts with the SAME
  key naming as the reference's torch state_dicts (so aggregation predicates
  like `'lora_S' in key` carry over).  Aggregating only this subset is
  numerically identical to the reference's full-dict averaging because frozen
  leaves are equal across clients (average of equal values is the value).

Lifecycle hooks (train/test/run_epoch/before|after_epoch/save/load) mirror the
reference so the FL server loop reads the same.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Dict, Optional

import numpy as np

from ..data.manager import DataManager
from ..evaluation.evaluator import build_evaluator
from ..utils.meters import AverageMeter, MetricMeter
from ..utils.registry import TRAINER_REGISTRY
from ..utils.tools import mkdir_if_missing
from .optim import LRSchedule


def build_trainer(cfg):
    trainer_cls = TRAINER_REGISTRY.get(cfg.TRAINER.NAME)
    return trainer_cls(cfg)


class TrainerBase:
    """Generic lifecycle + checkpointing over named model parts."""

    def __init__(self):
        self._models: Dict[str, dict] = {}  # name -> metadata (paths handled by subclass)
        self._writer = None
        self.epoch = 0
        self.start_epoch = 0
        self.max_epoch = 0

    # -- tensorboard -------------------------------------------------------
    def init_writer(self, log_dir):
        if self._writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                mkdir_if_missing(log_dir)
                self._writer = SummaryWriter(log_dir=log_dir)
                print(f"Initialize tensorboard (log_dir={log_dir})")
            except Exception as e:  # tensorboard optional
                print(f"TensorBoard unavailable ({e}); scalars will not be written")

    def close_writer(self):
        if self._writer is not None:
            self._writer.close()

    def write_scalar(self, tag, value, step):
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    # -- train loop --------------------------------------------------------
    def train(self, idx=-1, global_epoch=0, is_fed=False, is_last_client=False,
              global_weight=None, fedprox=False, mu=0.5):
        """Run MAX_EPOCH local epochs for client ``idx``
        (TrainerBase.train, trainer.py:281-291)."""
        self.set_model_mode("train")
        self.fedprox = fedprox
        self.mu = mu
        if fedprox and global_weight is not None and hasattr(self, "set_fedprox_global"):
            self.set_fedprox_global(global_weight)
        for self.epoch in range(self.start_epoch, self.max_epoch):
            self.before_epoch()
            self.run_epoch(idx, global_epoch)
            self.after_epoch(idx, global_epoch, is_last_client)

    def before_epoch(self):
        pass

    def after_epoch(self, idx, global_epoch, is_last_client):
        pass

    def run_epoch(self, idx, global_epoch):
        raise NotImplementedError

    def set_model_mode(self, mode="train"):
        self._mode = mode

    def detect_anomaly(self, loss):
        if not np.isfinite(loss):
            raise FloatingPointError("Loss is infinite or NaN!")

    # -- checkpointing -----------------------------------------------------
    def state_dict(self) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def load_state_dict(self, state: Dict[str, np.ndarray], strict: bool = False):
        raise NotImplementedError

    def save_model(self, epoch, directory, idx=None, is_best=False, name_suffix=""):
        """Grad-only checkpoint ``epoch{g}_client{i}`` (save_model_with_grad,
        trainer.py:177-186) as a flat .npz + metadata."""
        mkdir_if_missing(directory)
        tag = f"epoch{epoch}_client{idx}{name_suffix}" if idx is not None else f"epoch{epoch}"
        path = os.path.join(directory, f"{tag}.npz")
        np.savez(path, **{k: np.asarray(v) for k, v in self.state_dict().items()})
        return path

    def save_checkpoint(self, epoch, directory, name="model"):
        """Full-format checkpoint incl. optimizer state (torchtools.py:27-82)."""
        mkdir_if_missing(directory)
        fpath = os.path.join(directory, f"{name}.pth.tar-{epoch}")
        with open(fpath, "wb") as f:
            pickle.dump({
                "state_dict": {k: np.asarray(v) for k, v in self.state_dict().items()},
                "epoch": epoch + 1,
                "optimizer": self.optimizer_state_dict(),
            }, f)
        with open(os.path.join(directory, "checkpoint"), "w") as f:
            f.write(os.path.basename(fpath))
        return fpath

    def resume_from_checkpoint(self, directory, name="model"):
        pointer = os.path.join(directory, "checkpoint")
        if not os.path.exists(pointer):
            return 0
        with open(pointer) as f:
            fname = f.read().strip()
        with open(os.path.join(directory, fname), "rb") as f:
            ckpt = pickle.load(f)
        self.load_state_dict(ckpt["state_dict"], strict=False)
        if ckpt.get("optimizer") is not None:
            self.load_optimizer_state_dict(ckpt["optimizer"])
        print(f"Resumed from {fname} (epoch={ckpt['epoch']})")
        return int(ckpt["epoch"])

    def optimizer_state_dict(self):
        return None

    def load_optimizer_state_dict(self, state):
        pass


class SimpleTrainer(TrainerBase):
    """Builds data manager, model, evaluator; federated train/test lifecycle
    (SimpleTrainer, trainer.py:345-589)."""

    def __init__(self, cfg):
        super().__init__()
        self.check_cfg(cfg)
        self.cfg = cfg
        self.start_epoch = self.epoch = 0
        self.max_epoch = cfg.OPTIM.MAX_EPOCH
        self.output_dir = cfg.OUTPUT_DIR

        self.build_data_loader()
        self.build_model()
        self.evaluator = build_evaluator(cfg, lab2cname=self.lab2cname)

        # LR stepping counter: the reference steps its scheduler once per
        # client-local-epoch (update_lr at the last batch of each epoch)
        self.lr_sched: Optional[LRSchedule] = getattr(self, "lr_sched", None)
        self._lr_steps = 0

        self.global_time_start = time.time()

    def check_cfg(self, cfg):
        pass

    def build_data_loader(self):
        dm = DataManager(self.cfg)
        self.dm = dm
        self.fed_train_loader_x_dict = dm.fed_train_loader_x_dict
        self.fed_test_loader_x_dict = dm.fed_test_loader_x_dict
        self.num_classes = dm.num_classes
        self.lab2cname = dm.lab2cname

    def build_model(self):
        raise NotImplementedError

    # -- fed lifecycle -----------------------------------------------------
    def fed_before_train(self, is_global=False):
        writer_dir = os.path.join(self.output_dir, "tensorboard")
        self.init_writer(writer_dir)
        self.time_start = time.time()

    def fed_after_train(self):
        print("Finish training")
        elapsed = round(time.time() - self.time_start)
        import datetime

        print(f"Elapsed: {datetime.timedelta(seconds=elapsed)}")
        self.close_writer()

    def after_epoch(self, idx, global_epoch, is_last_client):
        """Per-client grad-only checkpointing (trainer.py:497-521): save at a
        LOCAL-epoch CHECKPOINT_FREQ cadence or unconditionally at the last
        local epoch of the round.  The file name carries the FEDERATED round
        (``epoch{global_epoch}_client{idx}``), so within one round a later
        qualifying local epoch overwrites the same path and the final state
        survives — same redundancy the reference has."""
        last_epoch = (self.epoch + 1) == self.max_epoch
        freq = self.cfg.TRAIN.CHECKPOINT_FREQ
        meet_freq = (self.epoch + 1) % freq == 0 if freq > 0 else False
        if meet_freq or last_epoch:
            path = self.save_model(
                global_epoch, os.path.join(self.output_dir, "checkpoints"),
                idx=idx)
            print("Save checkpoint to", path)

    # -- evaluation --------------------------------------------------------
    def test(self, idx=-1, current_epoch=0, split=None):
        """Evaluate client ``idx``; returns list(results.values()) positionally
        (trainer.py:523-569 + federated_main.py:686-690)."""
        self.set_model_mode("eval")
        self.evaluator.reset()
        loader = self.fed_test_loader_x_dict[idx]
        # header format is parsed by tools/get_mean_std.py (trainer.py:539)
        print(f"Evaluate on the client{idx}_test set")
        for batch in loader:
            inp, label, attrs, tgt_attr = self.parse_batch_test(batch)
            output = self.model_inference(inp, tgt_attr)
            n = batch["n_valid"]
            output = np.asarray(output, np.float32)[:n]
            label_h = np.asarray(label)[:n]
            attrs_h = None if attrs is None else np.asarray(attrs)[:n].T  # [A, B]
            self.evaluator.process(output, label_h, attrs_h)
        results = self.evaluator.evaluate()
        for k, v in results.items():
            if np.isscalar(v):
                self.write_scalar(f"test/{k}/{idx}", v, current_epoch)
        return list(results.values())

    def model_inference(self, inp, attr=None):
        raise NotImplementedError

    def parse_batch_test(self, batch):
        return batch["img"], batch["label"], batch.get("attrs"), None


class TrainerX(SimpleTrainer):
    """Supervised epoch loop over one client's loader
    (TrainerX.run_epoch, trainer.py:685-741)."""

    def run_epoch(self, idx, global_epoch):
        profile_dir = getattr(self.cfg.TRAIN, "PROFILE_DIR", "")
        if profile_dir and not getattr(self, "_profiled", False):
            self._profiled = True
            from ..utils.profiling import profile_trace

            with profile_trace(profile_dir):
                return self._run_epoch_inner(idx, global_epoch)
        return self._run_epoch_inner(idx, global_epoch)

    def _run_epoch_inner(self, idx, global_epoch):
        self.set_model_mode("train")
        losses = MetricMeter()
        batch_time = AverageMeter()
        data_time = AverageMeter()

        loader = self.fed_train_loader_x_dict[idx]
        self.num_batches = len(loader)
        # software pipeline: keep 2 batches resident on device while the host
        # decodes ahead (data_manager.py prefetch_to_device) — overlaps NPZ/
        # JPEG decode + transfer with the compiled step
        from ..data.manager import prefetch_to_device

        lr_steps_before = self._lr_steps
        n_seen = 0
        end = time.time()
        for self.batch_idx, batch in enumerate(prefetch_to_device(loader, size=2)):
            n_seen += 1
            data_time.update(time.time() - end)
            loss_summary = self.forward_backward(batch)
            batch_time.update(time.time() - end)
            if loss_summary:
                losses.update(loss_summary)

            meet_freq = (self.batch_idx + 1) % self.cfg.TRAIN.PRINT_FREQ == 0
            only_few_batches = self.num_batches < self.cfg.TRAIN.PRINT_FREQ
            if meet_freq or only_few_batches:
                nb_remain = self.num_batches - self.batch_idx - 1
                eta_seconds = batch_time.avg * nb_remain
                import datetime

                eta = str(datetime.timedelta(seconds=int(eta_seconds)))
                print(
                    f"epoch [{self.epoch + 1}/{self.max_epoch}]"
                    f"[{self.batch_idx + 1}/{self.num_batches}]"
                    f"\ttime {batch_time.val:.3f} ({batch_time.avg:.3f})"
                    f"\tdata {data_time.val:.3f} ({data_time.avg:.3f})"
                    f"\teta {eta}"
                    f"\t{losses}"
                    f"\tlr {self.get_current_lr():.6e}"
                )
            # reference x-axis (trainer.py:729-734): local-epoch term + the
            # federated round offset spans ALL local epochs — dropping
            # self.epoch collides scalar steps when OPTIM.MAX_EPOCH > 1
            n_iter = self.epoch * self.num_batches + self.batch_idx
            if global_epoch >= 0:
                n_iter += global_epoch * self.max_epoch * self.num_batches
            if loss_summary:
                for name, meter in losses.meters.items():
                    self.write_scalar(f"train/{name}/{idx}", meter.avg, n_iter)
            self.write_scalar(f"train/lr/{idx}", self.get_current_lr(), n_iter)
            end = time.time()

        # The trainers step the LR schedule on the batch where
        # (batch_idx + 1) == num_batches — but num_batches = len(loader) is
        # an ESTIMATE for structured samplers (RandomDomainSampler freezes
        # its length at construction while each epoch's actual stream
        # varies, data/manager.py).  If the stream ended short of the
        # estimate, the gate never fired and the schedule would silently
        # stall at a stale LR for the rest of the run — step it here
        # instead.  An empty epoch intentionally does NOT step (matching
        # the reference's never-firing last-batch gate on an empty loader).
        if n_seen and self._lr_steps == lr_steps_before:
            self.update_lr()
            if getattr(self, "opt_state", None) is not None:
                from .optim import set_learning_rate

                self.opt_state = set_learning_rate(
                    self.opt_state, self.get_current_lr())

    def get_current_lr(self) -> float:
        if self.lr_sched is None:
            return float(self.cfg.OPTIM.LR)
        return self.lr_sched.lr(self._lr_steps)

    def update_lr(self):
        """Advance the per-epoch LR step counter (trainer.py:253-258) — once
        per registered model name: the reference loops sched.step() over the
        registry, so GLP trainers with an unfrozen image encoder advance the
        schedule by TWO per local epoch (see glp_ot.py opt_steps_per_batch)."""
        self._lr_steps += getattr(self, "lr_step_multiplier", 1)

    def forward_backward(self, batch):
        raise NotImplementedError
