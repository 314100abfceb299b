"""Evaluator edge cases: empty client test sets and 1-D binary outputs.

The reference crashes on both (sklearn f1_score/concatenate raise on empty
input; Dassl's ``mo.max(1)`` raises on 1-D) — the rebuilt evaluators degrade
to zeroed metrics / thresholding instead, keeping the positional
[accuracy, error_rate, macro_f1, auc, ...] contract the FL server consumes.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from fairfedmed_tpu.config import get_cfg_default
from fairfedmed_tpu.evaluation.evaluator import build_evaluator


def _evaluator(name):
    cfg = get_cfg_default()
    cfg.TEST.EVALUATOR = name
    return build_evaluator(cfg, lab2cname={0: "healthy", 1: "glaucoma"})


def test_classification_empty_set_zeroed():
    r = _evaluator("Classification").evaluate()
    assert list(r) == ["accuracy", "error_rate", "macro_f1"]
    assert r["accuracy"] == 0.0 and r["error_rate"] == 100.0


def test_classification_oph_empty_set_zeroed():
    r = _evaluator("Classification_oph").evaluate()
    assert list(r) == ["accuracy", "error_rate", "macro_f1", "auc"]
    assert r["auc"] == 0.0


def test_classification_1d_binary_outputs_threshold_not_argmax():
    """argmax(-1) over a 1-D LOGIT batch collapses it to ONE index; the
    plain evaluator must sigmoid+threshold exactly like Classification_oph
    (the engine hands raw model logits to both).  Includes a logit in
    (0, 0.5): raw-value thresholding at 0.5 misclassifies it as negative."""
    ev = _evaluator("Classification")
    mo = np.array([2.0, -1.5, 0.3], np.float32)  # sigmoid: .88, .18, .57
    gt = np.array([1, 0, 1])
    ev.process(mo, gt)
    r = ev.evaluate()
    assert r["accuracy"] == 100.0
