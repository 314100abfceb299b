"""Domain/class-balanced samplers (samplers.py vs Dassl samplers.py:8-206)."""

import random

import numpy as np
import pytest

from fairfedmed_tpu.data.base import Datum
from fairfedmed_tpu.data.samplers import (
    RandomClassSampler, RandomDomainSampler, SeqDomainSampler, build_sampler,
)


def _source(n_domains=3, per_domain=12, n_classes=4):
    out = []
    for d in range(n_domains):
        for i in range(per_domain):
            out.append(Datum(impath=f"/x/{d}/{i}", label=i % n_classes, domain=d))
    return out


def test_random_domain_sampler_balanced_batches():
    random.seed(0)
    src = _source()
    s = RandomDomainSampler(src, batch_size=6, n_domain=3)
    idxs = list(s)
    assert len(idxs) % 6 == 0
    for start in range(0, len(idxs), 6):
        batch = idxs[start : start + 6]
        doms = [src[i].domain for i in batch]
        assert sorted(set(doms)) == [0, 1, 2]
        assert all(doms.count(d) == 2 for d in set(doms))


def test_seq_domain_sampler_order():
    random.seed(0)
    src = _source()
    s = SeqDomainSampler(src, batch_size=6)
    idxs = list(s)
    doms = [src[i].domain for i in idxs[:6]]
    assert doms == [0, 0, 1, 1, 2, 2]


def test_random_class_sampler_groups():
    random.seed(0)
    src = _source(n_domains=1, per_domain=40, n_classes=4)
    s = RandomClassSampler(src, batch_size=8, n_ins=4)
    idxs = list(s)
    for start in range(0, len(idxs) - 7, 8):
        batch = idxs[start : start + 8]
        labels = [src[i].label for i in batch]
        # two classes × four instances
        assert len(set(labels)) == 2
        assert all(labels.count(l) == 4 for l in set(labels))


def test_random_class_sampler_rejects_small_batch():
    with pytest.raises(ValueError):
        RandomClassSampler(_source(), batch_size=2, n_ins=4)


def test_build_sampler_dispatch():
    src = _source()
    assert len(list(build_sampler("SequentialSampler", data_source=src))) == len(src)
    assert sorted(build_sampler("RandomSampler", data_source=src)) == list(range(len(src)))
    with pytest.raises(ValueError):
        build_sampler("NopeSampler", data_source=src)


def test_client_loader_with_sampler():
    from fairfedmed_tpu.data.datasets.fewshot import ImageListSplit
    from fairfedmed_tpu.data.manager import ClientLoader

    random.seed(0)
    src = _source(n_domains=2, per_domain=8)

    class FakeSplit(ImageListSplit):
        def load_item(self, i):
            return np.zeros((4, 4, 3), np.uint8), self.items[i].label, None

    split = FakeSplit(src)
    sampler = SeqDomainSampler(src, batch_size=4)
    loader = ClientLoader(split, batch_size=4, is_train=True, sampler=sampler)
    batches = list(loader)
    assert batches and all(b["img"].shape[0] == 4 for b in batches)


def test_uneven_domain_pools_do_not_crash():
    """A short second domain mid-round must stop the draw, not raise
    ValueError out of random.sample."""
    random.seed(0)
    src = [Datum(impath=f"/x/0/{i}", label=0, domain=0) for i in range(12)]
    src += [Datum(impath=f"/x/1/{i}", label=0, domain=1) for i in range(5)]
    for _ in range(20):  # re-roll: every epoch draws fresh
        idxs = list(SeqDomainSampler(src, batch_size=4))
        assert all(0 <= i < len(src) for i in idxs)
        rds = RandomDomainSampler(src, batch_size=4, n_domain=2)
        assert all(0 <= i < len(rds.domain_dict[0]) + len(rds.domain_dict[1])
                   for i in list(rds))


def test_short_sampler_stream_trains_a_batch():
    """Sampler yielding fewer than batch_size indices must still produce one
    (short) train batch instead of silently training zero batches."""
    from fairfedmed_tpu.data.datasets.fewshot import ImageListSplit
    from fairfedmed_tpu.data.manager import ClientLoader

    random.seed(0)
    # 1 class × 4 instances but batch_size 8 → RandomClassSampler yields 4 idxs
    src = [Datum(impath=f"/x/0/{i}", label=0, domain=0) for i in range(40)]

    class FakeSplit(ImageListSplit):
        def load_item(self, i):
            return np.zeros((4, 4, 3), np.uint8), self.items[i].label, None

    class ShortSampler:
        def __iter__(self):
            return iter(range(4))

        def __len__(self):
            return 4

    split = FakeSplit(src)
    loader = ClientLoader(split, batch_size=8, is_train=True, sampler=ShortSampler())
    batches = list(loader)
    assert len(batches) == 1 and batches[0]["img"].shape[0] == 4
    assert len(loader) == 1
