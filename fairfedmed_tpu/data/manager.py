"""DataManager and per-client batch loaders.

Replaces Dassl/dassl/data/data_manager.py:62-239's torch DataLoader machinery
with host-side numpy batching designed for jit-compiled TPU steps:

* static batch shapes — train loaders drop the last incomplete batch exactly
  like the reference (drop_last=is_train when the client has ≥ batch_size
  samples); test loaders PAD the final batch to full size and report
  ``n_valid`` so the compiled forward runs at one shape and the evaluator
  slices on host;
* per-client loaders exposed as ``fed_train_loader_x_dict`` /
  ``fed_test_loader_x_dict`` keyed by client index, same as the reference;
* shuffling uses the global numpy RNG (seeded by set_random_seed), matching
  the reference's reliance on seeded global state.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..utils.registry import DATASET_REGISTRY
from ..utils.tools import ascii_table
from .transforms import build_transform


def build_dataset(cfg):
    return DATASET_REGISTRY.get(cfg.DATASET.NAME)(cfg)


class ClientLoader:
    """Batches one client's dataset.

    ``dataset`` needs ``__len__`` and ``load_item(i) -> (img, label, attrs|None)``;
    optional ``labels``/``attrs_matrix``/``count_by_attribute`` pass through.
    """

    def __init__(self, dataset, batch_size: int, is_train: bool,
                 transform=None, pad_final: bool = True, sampler=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.is_train = is_train
        self.transform = transform
        self.pad_final = pad_final and not is_train
        self.sampler = sampler

    def _drop_last(self, n_stream: int) -> bool:
        # the drop-last decision follows the ACTUAL index stream, not
        # len(dataset): a structured sampler can yield fewer than batch_size
        # indices (e.g. RandomClassSampler on a client owning one class), and
        # dataset-length-based dropping would silently train zero batches
        return self.is_train and n_stream >= self.batch_size

    def __len__(self):
        # for structured samplers whose stream length varies per epoch
        # (RandomDomainSampler re-rolls each draw) this is an estimate based
        # on the sampler's reported length; __iter__ recomputes from the
        # actual stream
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self._drop_last(n):
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        if self.sampler is not None:
            return np.asarray(list(self.sampler))
        n = len(self.dataset)
        if self.is_train:
            return np.random.permutation(n)
        return np.arange(n)

    def __iter__(self):
        idxs = self._indices()
        n = len(idxs)
        bs = self.batch_size
        stop = (n // bs) * bs if self._drop_last(n) else n
        can_prefetch = hasattr(self.dataset, "prefetch")
        try:
            if can_prefetch and stop > 0:
                self.dataset.prefetch([int(i) for i in idxs[:bs]])
            for start in range(0, stop, bs):
                chunk = idxs[start : start + bs]
                if can_prefetch and start + bs < stop:
                    # queue the NEXT batch on the native decode pool while this
                    # one is processed / the device is busy
                    self.dataset.prefetch([int(i) for i in idxs[start + bs : start + 2 * bs]])
                n_valid = len(chunk)
                if self.pad_final and n_valid < bs and n_valid > 0:
                    pad = np.resize(chunk, bs)  # cycle earlier indices as padding
                    chunk = pad
                imgs, labels, attrs = [], [], []
                for i in chunk:
                    img, label, attr = self.dataset.load_item(int(i))
                    if self.transform is not None:
                        img = self.transform(img)
                    imgs.append(img)
                    labels.append(label)
                    if attr is not None:
                        attrs.append(attr)
                batch = {
                    "img": np.stack(imgs),
                    "label": np.asarray(labels, np.int32),
                    "n_valid": n_valid,
                }
                if attrs:
                    if len(attrs) != len(chunk):
                        # a mixed None/non-None attr stream would emit an
                        # attrs array misaligned with img/label rows, silently
                        # pairing samples with other samples' demographics
                        raise ValueError(
                            f"dataset returned attrs for {len(attrs)} of "
                            f"{len(chunk)} items in one batch; per-item attrs "
                            "must be uniformly present or uniformly None")
                    batch["attrs"] = np.stack(attrs).astype(np.int32)
                yield batch
        finally:
            # an interrupted epoch leaves queued tickets whose decoded
            # payloads would otherwise sit in the native ticket map forever
            if can_prefetch and hasattr(self.dataset, "clear_prefetch"):
                self.dataset.clear_prefetch()


class DataManager:
    """Builds the dataset and one train + one test loader per client."""

    def __init__(self, cfg, custom_tfm_train=None, custom_tfm_test=None):
        self.cfg = cfg
        dataset = build_dataset(cfg)
        self.dataset = dataset

        tfm_train = custom_tfm_train if custom_tfm_train is not None else build_transform(cfg, is_train=True)
        tfm_test = custom_tfm_test if custom_tfm_test is not None else build_transform(cfg, is_train=False)

        self.fed_train_loader_x_dict = {}
        self.fed_test_loader_x_dict = {}
        warned_sampler = False
        for idx in range(cfg.DATASET.USERS):
            client_ds = dataset.federated_train_x[idx]
            sampler = None
            # structured samplers need Datum lists (ImageListSplit.items);
            # Random/Sequential fall through to the built-in index paths
            stype = cfg.DATALOADER.TRAIN_X.SAMPLER
            if stype not in ("RandomSampler", "SequentialSampler"):
                if hasattr(client_ds, "items"):
                    from .samplers import build_sampler
                    sampler = build_sampler(
                        stype, cfg, data_source=client_ds.items,
                        batch_size=cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
                        n_domain=cfg.DATALOADER.TRAIN_X.N_DOMAIN,
                        n_ins=cfg.DATALOADER.TRAIN_X.N_INS)
                elif not warned_sampler:  # warn once, not per client — but
                    # on the FIRST affected client, whichever that is
                    warned_sampler = True
                    print(f"WARNING: sampler {stype!r} requires a Datum-list "
                          f"dataset (.items); {type(client_ds).__name__} has "
                          f"none (client {idx}) — falling back to random "
                          "shuffling")
            self.fed_train_loader_x_dict[idx] = ClientLoader(
                client_ds,
                batch_size=cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
                is_train=True,
                transform=tfm_train,
                sampler=sampler,
            )
            self.fed_test_loader_x_dict[idx] = ClientLoader(
                dataset.federated_test_x[idx],
                batch_size=cfg.DATALOADER.TEST.BATCH_SIZE,
                is_train=False,
                transform=tfm_test,
            )

        self._num_classes = dataset.num_classes
        self._lab2cname = dataset.lab2cname
        if cfg.VERBOSE:
            self.show_dataset_summary(cfg)

    @property
    def num_classes(self):
        return self._num_classes

    @property
    def lab2cname(self):
        return self._lab2cname

    def show_dataset_summary(self, cfg):
        rows = [
            ["Dataset", cfg.DATASET.NAME],
            ["# classes", f"{self.num_classes:,}"],
            ["# clients", f"{cfg.DATASET.USERS:,}"],
        ]
        for idx in range(cfg.DATASET.USERS):
            rows.append([
                f"client {idx} train/test",
                f"{len(self.fed_train_loader_x_dict[idx].dataset):,} / "
                f"{len(self.fed_test_loader_x_dict[idx].dataset):,}",
            ])
        print(ascii_table(["Field", "Value"], rows))


def prefetch_to_device(loader, size: int = 2):
    """Software pipeline: keep ``size`` batches resident on device while the
    host decodes the next ones (overlaps NPZ/JPEG decode with TPU compute)."""
    import collections

    import jax

    it = iter(loader)
    queue = collections.deque()

    def enqueue(n):
        for _ in range(n):
            try:
                batch = next(it)
            except StopIteration:
                return
            queue.append({k: (jax.device_put(v) if hasattr(v, "shape") else v)
                          for k, v in batch.items()})

    enqueue(size)
    while queue:
        out = queue.popleft()
        enqueue(1)
        yield out
