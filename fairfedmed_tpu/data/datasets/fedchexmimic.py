"""FairFedMed-Chest: CheXpert (site 1) + MIMIC-CXR (site 2).

Mirrors FedChexMimicDataset (utils/data_utils.py:729-790): per-site CSV
``meta_{chexpert,mimic}_{attr}_{train,test}.csv`` with ``filename``,
``{attr}_label`` columns and ``disease_label``; grayscale JPEG → resize →
repeat to 3 channels, raw 0-255 scale (the model normalises in-graph).
"""

from __future__ import annotations

import os
from typing import List

import cv2
import numpy as np
from PIL import Image

from ...utils.registry import DATASET_REGISTRY


class FedChexMimicDataset:
    def __init__(self, base_path: str, site: int, attribute_type: str,
                 attributes: List[str], resolution: int = 224, depth: int = 3,
                 train: bool = True):
        import pandas as pd

        self.base_path = base_path
        if site == 1:
            site_name = "chexpert"
            self.data_path = base_path
        elif site == 2:
            site_name = "mimic"
            self.data_path = os.path.join(base_path, "files_336p")
        else:
            raise NotImplementedError(f"FedChexMimic has 2 sites, got {site}")
        self.attribute_type = attribute_type
        self.attributes = list(attributes)
        self.resolution = resolution
        self.depth = depth

        split = "train" if train else "test"
        csv_path = os.path.join(base_path, f"meta_{site_name}_{attribute_type}_{split}.csv")
        df = pd.read_csv(csv_path)
        assert "filename" in df.columns, "filename must be included in the head"
        self.data_files = list(df["filename"])
        self.data_attrs = np.asarray(df[attribute_type + "_label"], np.int32)
        self.disease_labels = np.asarray(df["disease_label"], np.int32)
        self.data_attributes = np.stack(
            [np.asarray(df[k + "_label"], np.int32) for k in self.attributes], axis=1
        ) if self.attributes else np.zeros((len(self.data_files), 0), np.int32)

    def __len__(self):
        return len(self.data_files)

    @property
    def labels(self) -> np.ndarray:
        return self.disease_labels

    @property
    def attrs_matrix(self) -> np.ndarray:
        return self.data_attributes

    def count_by_attribute(self, attr: str) -> List[int]:
        from .fairfedmed import group_histogram

        return group_histogram(self.data_attributes[:, self.attributes.index(attr)])

    _pool = None  # shared native prefetch pool (lazy), like FairFedMedDataset

    @classmethod
    def _get_pool(cls):
        if cls._pool is None:
            from ...native import PrefetchPool
            cls._pool = PrefetchPool(n_threads=2)
        return cls._pool

    def prefetch(self, idxs):
        """Queue upcoming X-rays on the native JPEG decode pool (GIL-free
        libjpeg + bilinear resize in C++ threads).  No-op without the
        JPEG-enabled native build — load_item then decodes lazily via PIL."""
        pool = self._get_pool()
        if not pool.supports_jpeg:
            return
        if not hasattr(self, "_tickets"):
            self._tickets = {}
        for i in idxs:
            i = int(i)
            if i in self._tickets:
                continue
            path = os.path.join(self.data_path, self.data_files[i])
            self._tickets[i] = pool.submit_jpeg(path, self.resolution)

    def clear_prefetch(self):
        """Drop uncollected tickets (interrupted epoch)."""
        tickets = getattr(self, "_tickets", None)
        if not tickets:
            return
        pool = self._get_pool()
        for t in tickets.values():
            pool.discard(t)
        tickets.clear()

    def _decode(self, i: int) -> np.ndarray:
        # prefetched tickets decode on GIL-free C++ threads, OVERLAPPING the
        # trainer's host work; the synchronous fallback stays PIL+cv2 (its
        # SIMD resize beats the scalar native kernel when nothing overlaps —
        # measured 74 vs 90 ms / 64 images)
        path = os.path.join(self.data_path, self.data_files[i])
        tickets = getattr(self, "_tickets", None)
        if tickets and i in tickets:
            try:
                return self._get_pool().collect(tickets.pop(i))
            except (IOError, OSError):
                # files libjpeg rejects (CMYK, PNG-with-.jpg, truncation)
                # fall through to PIL, which handled them before prefetch
                pass
        image = np.array(Image.open(path).convert("L"), dtype=np.float32)
        if image.shape[0] != self.resolution or image.shape[1] != self.resolution:
            image = cv2.resize(image, (self.resolution, self.resolution),
                               interpolation=cv2.INTER_LINEAR)
        return image

    def load_item(self, i: int):
        img = self._decode(int(i))[None]
        if self.depth > 1:
            img = np.repeat(img, self.depth, axis=0)
        attrs = self.data_attributes[i]
        return img.astype(np.float32), int(self.disease_labels[i]), attrs.astype(np.int32)


@DATASET_REGISTRY.register()
class FedChexMimic:
    """2-site cross-institutional chest X-ray FL (datasets/FedChexMimic.py)."""

    dataset_dir = "fedchexmimic"

    def __init__(self, cfg):
        root = os.path.abspath(os.path.expanduser(cfg.DATASET.ROOT))
        self.dataset_dir = os.path.join(root, self.dataset_dir)
        self.num_classes = 2

        self.federated_train_x = []
        self.federated_test_x = []
        for net_id in range(cfg.DATASET.USERS):
            size = cfg.INPUT.SIZE[0] if not isinstance(cfg.INPUT.SIZE, str) else 224
            common = dict(
                base_path=self.dataset_dir,
                site=net_id + 1,
                attribute_type=cfg.DATASET.ATTRIBUTE_TYPE,
                attributes=cfg.DATASET.ATTRIBUTES,
                resolution=size,
                depth=3,
            )
            self.federated_train_x.append(FedChexMimicDataset(train=True, **common))
            self.federated_test_x.append(FedChexMimicDataset(train=False, **common))

        self.lab2cname = {0: "NOT Pleural Effusion", 1: "Pleural Effusion"}
        self.classnames = ["NOT Pleural Effusion", "Pleural Effusion"]
