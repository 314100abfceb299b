"""Utility modules: meters, logger tee, pytree helpers, tools."""

import math
import os
import sys

import numpy as np

from fairfedmed_tpu.core.pytree import (
    flatten_paths, merge_trees, select_by_path, tree_size, unflatten_paths,
)
from fairfedmed_tpu.utils.logger import setup_logger
from fairfedmed_tpu.utils.meters import AverageMeter, MetricMeter
from fairfedmed_tpu.utils.tools import ascii_table, count_parameters, set_random_seed


def test_average_meter_plain_and_ema():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.sum == 4.0 and m.count == 2
    e = AverageMeter(ema=True)
    e.update(10.0)
    assert abs(e.avg - 1.0) < 1e-9  # 0*0.9 + 10*0.1


def test_metric_meter_filters_nan():
    mm = MetricMeter()
    mm.update({"loss": 1.0, "bad": math.nan})
    mm.update({"loss": 3.0})
    assert mm.meters["loss"].avg == 2.0
    assert "bad" not in mm.meters or mm.meters["bad"].count == 0
    assert "loss" in str(mm)


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": np.ones(2), "c": [np.zeros(1), np.ones(1)]}, "d": np.ones(3)}
    flat = flatten_paths(tree)
    assert set(flat) == {"a.b", "a.c.0", "a.c.1", "d"}
    rebuilt = unflatten_paths(flat)
    assert set(rebuilt["a"]) == {"b", "c"}
    sel = select_by_path(tree, lambda p: p.startswith("a."))
    assert set(flatten_paths(sel)) == {"a.b", "a.c.0", "a.c.1"}
    assert tree_size(tree) == 2 + 1 + 1 + 3


def test_merge_trees():
    base = {"x": 1, "y": {"z": 2, "w": 3}}
    out = merge_trees(base, {"y": {"z": 9}})
    assert out["y"]["z"] == 9 and out["y"]["w"] == 3 and out["x"] == 1


def test_logger_tee(tmp_path):
    out_dir = str(tmp_path / "logdir")
    old_stdout = sys.stdout
    try:
        setup_logger(out_dir)
        print("hello-tee-check")
        # line-buffered: the tail must be on disk WITHOUT an explicit flush
        # (a preempted run keeps its log)
        with open(os.path.join(out_dir, "log.txt")) as f:
            assert "hello-tee-check" in f.read()
    finally:
        sys.stdout = old_stdout


def test_ascii_table_and_count_parameters():
    table = ascii_table(["A", "B"], [["x", 1], ["yy", 22]])
    assert "A" in table and "yy" in table
    params = {"prompt_learner.ctx": np.zeros((2, 4)),
              "image_encoder.w": np.zeros((3,))}
    assert count_parameters(params, "prompt_learner") == 8
    assert count_parameters(params, "image_encoder") == 3


def test_set_random_seed_deterministic():
    set_random_seed(123)
    a = np.random.rand(3)
    set_random_seed(123)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
