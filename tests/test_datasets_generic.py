"""Generic FL benchmark datasets (generic.py: idx readers, SVHN, FEMNIST,
CelebA labels, CharacterDataset)."""

import gzip
import os
import string
import struct

import numpy as np
import pytest

from fairfedmed_tpu.data.datasets.generic import (
    CharacterDataset, load_celeba_labels, load_mnist_arrays, read_idx,
)


def write_idx(path, arr):
    arr = np.asarray(arr, np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x0800 | arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


@pytest.fixture
def mnist_root(tmp_path):
    rng = np.random.default_rng(0)
    base = tmp_path / "MNIST" / "raw"
    base.mkdir(parents=True)
    Xtr = (rng.random((20, 28, 28)) * 255).astype(np.uint8)
    ytr = rng.integers(0, 10, 20).astype(np.uint8)
    Xte = (rng.random((8, 28, 28)) * 255).astype(np.uint8)
    yte = rng.integers(0, 10, 8).astype(np.uint8)
    write_idx(str(base / "train-images-idx3-ubyte"), Xtr)
    write_idx(str(base / "train-labels-idx1-ubyte"), ytr)
    write_idx(str(base / "t10k-images-idx3-ubyte"), Xte)
    write_idx(str(base / "t10k-labels-idx1-ubyte"), yte)
    return str(tmp_path), (Xtr, ytr, Xte, yte)


def test_read_idx_roundtrip(tmp_path):
    arr = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    p = str(tmp_path / "x-idx3-ubyte")
    write_idx(p, arr)
    np.testing.assert_array_equal(read_idx(p), arr)
    # gz variant
    with open(p, "rb") as f:
        raw = f.read()
    with gzip.open(p + "2.gz", "wb") as f:
        f.write(raw)
    np.testing.assert_array_equal(read_idx(p + "2"), arr)


def test_load_mnist_arrays(mnist_root):
    root, (Xtr, ytr, Xte, yte) = mnist_root
    X_train, y_train, X_test, y_test = load_mnist_arrays(root)
    np.testing.assert_array_equal(X_train, Xtr)
    np.testing.assert_array_equal(y_test, yte)


def test_mnist_federated(mnist_root):
    from fairfedmed_tpu.config import get_cfg_default
    from fairfedmed_tpu.data.datasets.generic import Mnist

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = mnist_root[0]
    cfg.DATASET.USERS = 2
    cfg.DATASET.PARTITION = "homo"
    ds = Mnist(cfg)
    assert len(ds.federated_train_x) == 2
    total = sum(len(c) for c in ds.federated_train_x)
    assert total == 20
    img, label, attr = ds.federated_train_x[0].load_item(0)
    assert img.shape == (28, 28, 1) and attr is None


def test_celeba_labels(tmp_path):
    files = [f"{i:06d}.jpg" for i in range(6)]
    male = [1, -1, 1, -1, 1, -1]
    with open(tmp_path / "list_attr_celeba.txt", "w") as f:
        f.write("6\n")
        f.write("Attractive Male Young\n")
        for fn, m in zip(files, male):
            f.write(f"{fn} -1 {m} 1\n")
    with open(tmp_path / "list_eval_partition.txt", "w") as f:
        for i, fn in enumerate(files):
            f.write(f"{fn} {0 if i < 4 else 2}\n")
    tr_f, y_tr, te_f, y_te = load_celeba_labels(str(tmp_path))
    assert len(tr_f) == 4 and len(te_f) == 2
    np.testing.assert_array_equal(y_tr, [1, 0, 1, 0])
    np.testing.assert_array_equal(y_te, [1, 0])


def test_character_dataset(tmp_path):
    text = "hello world, this is shakespeare."
    p = tmp_path / "corpus.txt"
    p.write_text(text)
    ds = CharacterDataset(str(p), chunk_len=5)
    assert len(ds) == len(text) - 5
    inp, tgt, idx = ds[0]
    printable = string.printable
    assert "".join(printable[i] for i in inp) == "hello"
    assert "".join(printable[i] for i in tgt) == "ello "
    assert ds.vocab_size == len(printable)
