"""Synthetic dataset fixtures replicating the reference on-disk layouts
(README.md:54-93 for FairFedMed; standard CIFAR pickle batches)."""

from __future__ import annotations

import os
import pickle

import numpy as np
import pandas as pd


def make_fairfedmed_fixture(root: str, n_sites: int = 2, n_train: int = 12,
                            n_test: int = 8, size: int = 224, seed: int = 0,
                            oct_depth: int = 128, oct_hw: int = 32,
                            attributes=("gender", "race", "ethnicity", "language", "maritalstatus")):
    """Write NPZ samples + per-site meta CSVs under root/fairfedmed/."""
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "fairfedmed")
    all_dir = os.path.join(base, "all")
    os.makedirs(all_dir, exist_ok=True)
    n_groups = {"gender": 2, "race": 3, "ethnicity": 2, "language": 3, "maritalstatus": 5}

    counter = 0
    for site in range(1, n_sites + 1):
        for split, n in (("train", n_train), ("test", n_test)):
            fnames = []
            for _ in range(n):
                label = int(rng.integers(0, 2))
                attrs = {a: int(rng.integers(0, n_groups.get(a, 2))) for a in attributes}
                # 2D SLO fundus (stored transposed; real sites ship uint8
                # pixel payloads — integral values also let the runner keep
                # its device cache in uint8, 4x less tunnel transfer)
                slo = rng.integers(0, 256, size=(size, size), dtype=np.int64).astype(np.uint8)
                # small 3D OCT volume (depth x H x W)
                oct_vol = rng.integers(0, 256, size=(oct_depth, oct_hw, oct_hw), dtype=np.int64).astype(np.uint8)
                fname = f"data_{counter:05d}.npz"
                counter += 1
                np.savez(os.path.join(all_dir, fname), slo_fundus=slo,
                         oct_bscans=oct_vol, glaucoma=np.asarray(label), **attrs)
                fnames.append(fname)
            for attr in attributes:
                pd.DataFrame({"filename": fnames}).to_csv(
                    os.path.join(base, f"meta_site{site}_{attr}_{split}.csv"), index=False)
    return base


def make_cifar10_fixture(root: str, n_train: int = 100, n_test: int = 40, seed: int = 0):
    """Write tiny CIFAR-10-format pickle batches under root/cifar-10/."""
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "cifar-10", "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    per_batch = n_train // 5
    for i in range(1, 6):
        data = rng.integers(0, 256, size=(per_batch, 3072), dtype=np.int64).astype(np.uint8)
        labels = rng.integers(0, 10, size=per_batch).tolist()
        with open(os.path.join(d, f"data_batch_{i}"), "wb") as f:
            pickle.dump({"data": data, "labels": labels}, f)
    data = rng.integers(0, 256, size=(n_test, 3072), dtype=np.int64).astype(np.uint8)
    labels = rng.integers(0, 10, size=n_test).tolist()
    with open(os.path.join(d, "test_batch"), "wb") as f:
        pickle.dump({"data": data, "labels": labels}, f)
    with open(os.path.join(d, "batches.meta"), "wb") as f:
        pickle.dump({"label_names": [
            "airplane", "automobile", "bird", "cat", "deer",
            "dog", "frog", "horse", "ship", "truck"]}, f)
    return os.path.join(root, "cifar-10")


def make_imagefolder_fixture(root: str, dataset_dir: str = "caltech-101",
                             image_subdir: str = "101_ObjectCategories",
                             n_classes: int = 4, n_per_class: int = 10,
                             size: int = 24, seed: int = 0):
    """Tiny images/<class>/<img>.jpg tree for the CoOp-style datasets."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    image_dir = os.path.join(root, dataset_dir, image_subdir)
    for c in range(n_classes):
        cdir = os.path.join(image_dir, f"class_{c}")
        os.makedirs(cdir, exist_ok=True)
        for i in range(n_per_class):
            arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(cdir, f"img_{i}.jpg"))
    return image_dir


def make_domain_fixture(root: str, pkl_subdir: str = "DomainNet",
                        sites=("clipart", "infograph", "painting",
                               "quickdraw", "real", "sketch"),
                        label_names=("bird", "feather", "headphones",
                                     "ice_cream", "teapot", "tiger", "whale",
                                     "windmill", "wine_glass", "zebra"),
                        n_train: int = 40, n_test: int = 20, size: int = 24,
                        seed: int = 0):
    """{site}_{train,test}.pkl numpy pickles of (paths, text_labels) + JPEGs."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    pdir = os.path.join(root, pkl_subdir)
    os.makedirs(pdir, exist_ok=True)
    for site in sites:
        for split, n in (("train", n_train), ("test", n_test)):
            paths, labels = [], []
            for i in range(n):
                rel = os.path.join(pkl_subdir, "imgs", site, f"{split}_{i}.jpg")
                full = os.path.join(root, rel)
                os.makedirs(os.path.dirname(full), exist_ok=True)
                arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
                Image.fromarray(arr).save(full)
                paths.append(rel)
                labels.append(label_names[i % len(label_names)])
            with open(os.path.join(pdir, f"{site}_{split}.pkl"), "wb") as f:
                np.save(f, np.array([np.array(paths, dtype=object),
                                     np.array(labels, dtype=object)],
                                    dtype=object), allow_pickle=True)


def make_fedchexmimic_fixture(root: str, n_train: int = 8, n_test: int = 6,
                              size: int = 32, seed: int = 0,
                              attributes=("race", "gender", "age")):
    """CheXpert (site1) + MIMIC (site2) layout: per-site CSVs + gray JPEGs."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    base = os.path.join(root, "fedchexmimic")
    os.makedirs(os.path.join(base, "files_336p"), exist_ok=True)
    n_groups = {"race": 3, "gender": 2, "age": 3}
    counter = 0
    for site_name, img_dir in (("chexpert", base),
                               ("mimic", os.path.join(base, "files_336p"))):
        for split, n in (("train", n_train), ("test", n_test)):
            rows = {"filename": [], "disease_label": []}
            for a in attributes:
                rows[a + "_label"] = []
            for _ in range(n):
                fname = f"img_{counter:05d}.jpg"
                counter += 1
                arr = (rng.random((size, size)) * 255).astype(np.uint8)
                Image.fromarray(arr, mode="L").save(os.path.join(img_dir, fname))
                rows["filename"].append(fname)
                rows["disease_label"].append(int(rng.integers(0, 2)))
                for a in attributes:
                    rows[a + "_label"].append(int(rng.integers(0, n_groups[a])))
            for attr in attributes:
                pd.DataFrame(rows).to_csv(
                    os.path.join(base, f"meta_{site_name}_{attr}_{split}.csv"),
                    index=False)
    return base
