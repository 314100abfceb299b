"""Non-IID partitioners (data/partition.py vs utils/datasplit.py:47-480)."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from fairfedmed_tpu.data.partition import (
    CIFAR100_COARSE, partition_indices, record_class_counts,
)


@pytest.fixture
def labels():
    rng = np.random.default_rng(0)
    y_train = rng.integers(0, 10, 600)
    y_test = rng.integers(0, 10, 200)
    return y_train, y_test


def _assert_exact_cover(idx_map, n):
    flat = sorted(int(i) for part in idx_map.values() for i in part)
    assert flat == list(range(n))


def test_homo(labels):
    y_train, y_test = labels
    np.random.seed(0)
    tr, te = partition_indices(y_train, y_test, "homo", 4, num_classes=10)
    _assert_exact_cover(tr, 600)
    _assert_exact_cover(te, 200)
    sizes = [len(v) for v in tr.values()]
    assert max(sizes) - min(sizes) <= 1


def test_label_strategies_cover(labels):
    y_train, y_test = labels
    np.random.seed(0)
    tr, te = partition_indices(y_train, y_test, "noniid-labeldir", 3,
                               beta=0.5, num_classes=10)
    _assert_exact_cover(tr, 600)
    _assert_exact_cover(te, 200)


def test_labeluni_classes_per_client(labels):
    """noniid-labeluni (datasplit.py:201-279): each client holds exactly
    `num`=2 classes (cifar10 rule) with uniform(0.4,0.6)-normalized
    per-claim proportions — a LABEL-SKEWED split, not an even division."""
    y_train, y_test = labels
    np.random.seed(0)
    import random as pyrandom
    pyrandom.seed(0)
    tr, te = partition_indices(y_train, y_test, "noniid-labeluni", 5,
                               num_classes=10)
    all_tr = []
    for part in tr.values():
        held = {int(y_train[i]) for i in part}
        assert len(held) == 2, held
        all_tr.extend(int(i) for i in part)
    # every class is claimed num*n/K = 1 time here, so each client owns its
    # 2 classes EXCLUSIVELY; assignments are disjoint
    assert len(all_tr) == len(set(all_tr))
    # truncation drops at most a few samples per claim, never whole classes
    assert len(all_tr) > 0.9 * len(y_train)
    # the test split follows the same per-client class ownership
    for u in tr:
        train_classes = {int(y_train[i]) for i in tr[u]}
        assert {int(y_test[i]) for i in te[u]} <= train_classes


def test_iid_label100_coarse_clusters():
    """iid-label100 (datasplit.py:123-199): clients 5i..5i+4 hold 5 fine
    labels of coarse group i, (N/n)//5 samples each, fixed seed 12345."""
    rng = np.random.default_rng(7)
    y_train = rng.permutation(np.repeat(np.arange(100), 30))
    y_test = rng.permutation(np.repeat(np.arange(100), 10))
    tr, te = partition_indices(y_train, y_test, "iid-label100", 100,
                               num_classes=100)
    for u in (0, 7, 42, 99):
        fines = {int(y_train[i]) for i in tr[u]}
        assert len(fines) == 5
        coarse = {int(CIFAR100_COARSE[f]) for f in fines}
        assert coarse == {u // 5}, (u, coarse)
        assert len(tr[u]) == 5 * ((3000 // 100) // 5)
        assert len(te[u]) == 5 * ((1000 // 100) // 5)
    # balanced CIFAR-100 shape drains exactly: full disjoint cover
    _assert_exact_cover(tr, 3000)
    _assert_exact_cover(te, 1000)


def test_label_quantity(labels):
    """noniid-#label{k}: each client holds exactly k classes."""
    y_train, y_test = labels
    np.random.seed(0)
    tr, te = partition_indices(y_train, y_test, "noniid-#label3", 3,
                               num_classes=10)
    for part in tr.values():
        held = {int(y_train[i]) for i in part}
        assert len(held) <= 3


def test_labeldir_skew(labels):
    """Dirichlet with small beta must produce skewed class histograms."""
    y_train, y_test = labels
    np.random.seed(0)
    tr, _ = partition_indices(y_train, y_test, "noniid-labeldir", 3, beta=0.1,
                              num_classes=10)
    counts = [np.bincount(y_train[v], minlength=10) for v in tr.values()]
    # at least one client must be visibly skewed (some class near-absent)
    assert any(c.min() * 5 < c.max() for c in counts)


def test_labeldir100_uses_coarse_hierarchy():
    rng = np.random.default_rng(1)
    y_train = rng.integers(0, 100, 2000)
    y_test = rng.integers(0, 100, 500)
    np.random.seed(0)
    tr, te = partition_indices(y_train, y_test, "noniid-labeldir100", 5,
                               beta=0.1, num_classes=100)
    _assert_exact_cover(tr, 2000)
    assert CIFAR100_COARSE.shape == (100,)
    assert CIFAR100_COARSE.max() == 19


def test_record_class_counts(labels):
    y_train, y_test = labels
    np.random.seed(0)
    tr, _ = partition_indices(y_train, y_test, "homo", 2, num_classes=10)
    counts = record_class_counts(y_train, tr)
    assert set(counts) == {0, 1}
    assert sum(sum(v.values()) for v in counts.values()) == 600
