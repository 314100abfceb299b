"""Few-shot federated datasets + domain datasets + splitters
(fewshot.py, domain.py, base.py splitters)."""

import os
import random

import numpy as np
import pytest

from fairfedmed_tpu.data.base import (
    Datum, assign_classes_to_users, generate_federated_dataset,
    generate_federated_fewshot_dataset,
)
from fairfedmed_tpu.data.datasets.fewshot import (
    read_and_split_data, read_split, save_split, subsample_classes,
)


def _datums(n_classes=6, per_class=8):
    out = []
    for c in range(n_classes):
        for i in range(per_class):
            out.append(Datum(impath=f"/x/{c}/{i}.jpg", label=c, classname=f"c{c}"))
    return out


def test_assign_classes_covers_all_classes():
    d, rep = assign_classes_to_users(10, 3, num_shots=2, is_iid=False, repeat_rate=0.0)
    owned = sorted(l for ls in d.values() for l in ls)
    assert owned == list(range(10))
    assert rep == []


def test_assign_classes_iid():
    d, _ = assign_classes_to_users(5, 4, 2, is_iid=True, repeat_rate=0.0)
    for i in range(4):
        assert d[i] == list(range(5))


def test_assign_classes_repeat_rate():
    d, rep = assign_classes_to_users(10, 2, num_shots=8, is_iid=False, repeat_rate=0.4)
    assert len(rep) == 4
    for i in range(2):
        assert set(rep) <= set(d[i])  # fold=0: all clients share repeat classes


def test_fewshot_split_shots_per_class():
    random.seed(0)
    data = _datums()
    clients = generate_federated_fewshot_dataset(data, num_users=3, num_shots=2)
    for items in clients:
        counts = {}
        for it in items:
            counts[it.label] = counts.get(it.label, 0) + 1
        assert all(v == 2 for v in counts.values())
    owned = set(l for items in clients for l in {i.label for i in items})
    assert owned == set(range(6))


def test_federated_dataset_useall_noniid_owns_full_classes():
    random.seed(0)
    data = _datums()
    clients = generate_federated_dataset(data, num_users=3, num_shots=2)
    total = sum(len(c) for c in clients)
    assert total == len(data)  # disjoint class ownership covers everything
    for items in clients:
        for label in {i.label for i in items}:
            assert sum(1 for i in items if i.label == label) == 8


def test_federated_dataset_iid_disjoint():
    random.seed(0)
    data = _datums(n_classes=2, per_class=9)
    clients = generate_federated_dataset(data, num_users=3, num_shots=2, is_iid=True)
    seen = set()
    for items in clients:
        paths = {i.impath for i in items}
        assert not (paths & seen)
        seen |= paths


def test_subsample_classes_relabels():
    data = _datums(n_classes=5, per_class=2)
    (base,) = subsample_classes(data, subsample="base")
    assert {i.label for i in base} == {0, 1, 2}
    (new,) = subsample_classes(data, subsample="new")
    assert {i.label for i in new} == {0, 1}  # 2 new classes relabelled


def test_read_and_split_data_roundtrip(tmp_path):
    from tests.fixtures import make_imagefolder_fixture

    random.seed(0)
    image_dir = make_imagefolder_fixture(str(tmp_path), n_classes=3, n_per_class=10)
    train, val, test = read_and_split_data(image_dir)
    assert len(train) == 15 and len(val) == 6 and len(test) == 9
    split_path = os.path.join(str(tmp_path), "split.json")
    save_split(train, val, test, split_path, image_dir)
    t2, v2, s2 = read_split(split_path, image_dir)
    assert [d.impath for d in t2] == [d.impath for d in train]
    assert [d.label for d in s2] == [d.label for d in test]


@pytest.fixture(scope="module")
def caltech_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("caltech")
    from tests.fixtures import make_imagefolder_fixture

    random.seed(0)
    make_imagefolder_fixture(str(root), n_classes=4, n_per_class=10)
    return str(root)


def test_caltech101_federated(caltech_root):
    from fairfedmed_tpu.config import get_cfg_default
    from fairfedmed_tpu.data.datasets.fewshot import Caltech101

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = caltech_root
    cfg.DATASET.NAME = "Caltech101"
    cfg.DATASET.USERS = 2
    cfg.DATASET.NUM_SHOTS = 2
    cfg.DATASET.USEALL = False
    cfg.DATASET.IID = False
    ds = Caltech101(cfg)
    assert len(ds.federated_train_x) == 2
    assert len(ds.classnames) == 4
    img, label, attr = ds.federated_train_x[0].load_item(0)
    assert img.shape == (24, 24, 3) and attr is None
    # split json was saved → second construction loads it
    assert os.path.exists(os.path.join(caltech_root, "caltech-101",
                                       "split_zhou_Caltech101.json"))
    ds2 = Caltech101(cfg)
    assert len(ds2.test) == len(ds.test)


@pytest.fixture(scope="module")
def office_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("office")
    from tests.fixtures import make_domain_fixture

    make_domain_fixture(
        str(root), pkl_subdir="office_caltech_10",
        sites=("amazon", "caltech", "dslr", "webcam"),
        label_names=("back_pack", "bike", "calculator", "headphones",
                     "keyboard", "laptop_computer", "monitor", "mouse",
                     "mug", "projector"),
        n_train=40, n_test=20)
    return str(root)


def test_office_one_client_per_domain(office_root):
    from fairfedmed_tpu.config import get_cfg_default
    from fairfedmed_tpu.data.datasets.domain import Office

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = office_root
    cfg.DATASET.NAME = "Office"
    cfg.DATASET.USERS = 4
    cfg.DATASET.IMBALANCE_TRAIN = False
    ds = Office(cfg)
    assert len(ds.federated_train_x) == 4
    assert all(len(c) == 40 for c in ds.federated_train_x)
    assert len(ds.classnames) == 10
    img, label, _ = ds.federated_train_x[1].load_item(0)
    assert img.shape == (24, 24, 3) and 0 <= label < 10


def test_office_split_client_dirichlet(office_root):
    from fairfedmed_tpu.config import get_cfg_default
    from fairfedmed_tpu.data.datasets.domain import Office

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = office_root
    cfg.DATASET.NAME = "Office"
    cfg.DATASET.USERS = 12
    cfg.DATASET.IMBALANCE_TRAIN = True
    cfg.DATASET.SPLIT_CLIENT = True
    cfg.DATASET.BETA = 0.5
    ds = Office(cfg)
    assert len(ds.federated_train_x) == 12  # 4 domains × 3 clients
    # all of each domain's train samples are dealt out
    assert sum(len(c) for c in ds.federated_train_x) == 4 * 40
    assert all(len(c) >= 2 for c in ds.federated_train_x)


def test_dirichlet_partition_pair_properties():
    from fairfedmed_tpu.data.datasets.domain import dirichlet_partition_pair

    y_tr = np.repeat(np.arange(10), 20)
    y_te = np.repeat(np.arange(10), 8)
    idx_tr, idx_te = dirichlet_partition_pair(y_tr, y_te, 0.5, 3, 10)
    flat = sorted(i for part in idx_tr for i in part)
    assert flat == list(range(200))  # exact cover, no dup/loss
    flat_te = sorted(i for part in idx_te for i in part)
    assert flat_te == list(range(80))
