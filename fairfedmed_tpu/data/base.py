"""Dataset base structures (mirrors Dassl/dassl/data/datasets/base_dataset.py
and utils/data_utils.py:20-60).

``Datum`` carries either an in-memory array (``data``) or an image path
(``impath``); federated datasets expose ``federated_train_x`` /
``federated_test_x`` as per-client lists.
"""

from __future__ import annotations

import random
from collections import defaultdict
from typing import List, Sequence


class Datum:
    """One sample: in-memory data or a path, plus label/domain/classname."""

    def __init__(self, impath: str = "", label: int = 0, domain: int = 0,
                 classname: str = "", data=None):
        self.impath = impath
        self.label = int(label)
        self.domain = int(domain)
        self.classname = classname
        self.data = data


class DatasetBase:
    """Federated dataset container.

    Sub-classes set ``federated_train_x``/``federated_test_x`` (lists of
    per-client sample lists or dataset objects), ``lab2cname`` and
    ``classnames``.
    """

    dataset_dir = ""

    def __init__(self, train_x=None, test=None, federated_train_x=None,
                 federated_test_x=None, lab2cname=None, classnames=None):
        self.train_x = train_x
        self.test = test
        self.federated_train_x = federated_train_x
        self.federated_test_x = federated_test_x
        self.lab2cname = lab2cname or {}
        self.classnames = classnames or []

    @property
    def num_classes(self) -> int:
        return len(self.classnames)

    @staticmethod
    def get_lab2cname(data_source: Sequence[Datum]):
        mapping = {item.label: item.classname for item in data_source}
        labels = sorted(mapping)
        lab2cname = {label: mapping[label] for label in labels}
        classnames = [mapping[label] for label in labels]
        return lab2cname, classnames


def split_dataset_by_label(data_source: Sequence[Datum]):
    out = defaultdict(list)
    for item in data_source:
        out[item.label].append(item)
    return out


def generate_fewshot_dataset(data_source: Sequence[Datum], num_shots: int,
                             repeat: bool = True) -> List[Datum]:
    """Sample a num_shots-per-class subset (base_dataset.py semantics)."""
    if num_shots < 1:
        return list(data_source)
    tracker = split_dataset_by_label(data_source)
    out = []
    for label, items in tracker.items():
        if len(items) >= num_shots:
            out.extend(random.sample(items, num_shots))
        elif repeat:
            out.extend(random.choices(items, k=num_shots))
        else:
            out.extend(items)
    return out


def generate_federated_fewshot_dataset(
    data_source: Sequence[Datum],
    num_users: int,
    num_shots: int = -1,
    is_iid: bool = False,
    repeat_rate: float = 0.0,
) -> List[List[Datum]]:
    """Federated few-shot splits (base_dataset.py:223-480 semantics).

    iid: every client samples num_shots per class from the full pool.
    non-iid: classes are partitioned across clients (with ``repeat_rate``
    overlap), each client samples num_shots from its own classes.
    """
    tracker = split_dataset_by_label(data_source)
    labels = sorted(tracker)
    per_client: List[List[Datum]] = [[] for _ in range(num_users)]

    if is_iid:
        for i in range(num_users):
            for label in labels:
                items = tracker[label]
                k = num_shots if num_shots > 0 else len(items)
                k = min(k, len(items))
                per_client[i].extend(random.sample(items, k))
        return per_client

    # non-iid: split the label set across clients
    n_overlap = int(len(labels) * repeat_rate)
    shared = labels[:n_overlap]
    rest = labels[n_overlap:]
    chunks = [list(rest[i::num_users]) for i in range(num_users)]
    for i in range(num_users):
        for label in chunks[i] + shared:
            items = tracker[label]
            k = num_shots if num_shots > 0 else len(items)
            k = min(k, len(items))
            per_client[i].extend(random.sample(items, k))
    return per_client
