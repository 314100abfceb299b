"""Brute-force property tests for the fairness-metric reimplementations.

fairlearn / aif360 are absent from this environment (reference
evaluation/metrics.py:5-11 imports them), so DPD / EOD / AOD are
reimplemented in fairfedmed_tpu/evaluation/metrics.py.  VERDICT r3 flagged
the single hand-computed cases as too thin an oracle ("a sign error in a
rate conditional would likely survive").  These tests pin each metric
against an INDEPENDENT, loop-by-loop transcription of its published
definition over hundreds of random datasets, including the edges the
reference trips try/except on (groups missing a class, -1 group codes,
single-group attributes, constant predictions).

The skip-undefined-rate convention (documented in the module docstring:
groups with no samples of a class are dropped via nan-aware reductions,
where the reference would propagate NaN or fall into its `except: 0`
branch, metrics.py:255-282) is part of the pinned contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from fairfedmed_tpu.evaluation.metrics import (
    average_odds_difference,
    demographic_parity_difference,
    demographic_parity_ratio,
    equalized_odds_difference,
    equalized_odds_ratio,
    evalute_comprehensive_perf_scores,
    multiclass_demographic_parity,
    multiclass_equalized_odds,
    num_to_onehot,
    prob_to_label,
)

pytestmark = pytest.mark.smoke


# --------------------------------------------------------------------------- #
# independent definition transcriptions (pure python loops, no numpy
# reductions shared with the implementation under test)
# --------------------------------------------------------------------------- #

def _sel_rate(y_pred, idx):
    return sum(y_pred[i] for i in idx) / len(idx)


def brute_dpd(y_true, y_pred, groups):
    """max_g P(yhat=1 | g)  -  min_g P(yhat=1 | g)."""
    sels = []
    for g in sorted(set(groups)):
        idx = [i for i in range(len(groups)) if groups[i] == g]
        sels.append(_sel_rate(y_pred, idx))
    return max(sels) - min(sels)


def brute_dpr(y_true, y_pred, groups):
    sels = []
    for g in sorted(set(groups)):
        idx = [i for i in range(len(groups)) if groups[i] == g]
        sels.append(_sel_rate(y_pred, idx))
    hi = max(sels)
    return min(sels) / hi if hi > 0 else 0.0


def brute_eod(y_true, y_pred, groups):
    """max over y in {0,1} of (max_g - min_g) P(yhat=1 | Y=y, g); groups with
    no samples of the conditioning class are skipped (documented convention)."""
    diffs = []
    for yv in (1, 0):  # tpr first, then fpr
        rates = []
        for g in sorted(set(groups)):
            idx = [i for i in range(len(groups))
                   if groups[i] == g and y_true[i] == yv]
            if idx:
                rates.append(_sel_rate(y_pred, idx))
        diffs.append(max(rates) - min(rates) if rates else 0.0)
    return max(diffs)


def brute_eor(y_true, y_pred, groups):
    ratios = []
    for yv in (1, 0):
        rates = []
        for g in sorted(set(groups)):
            idx = [i for i in range(len(groups))
                   if groups[i] == g and y_true[i] == yv]
            if idx:
                rates.append(_sel_rate(y_pred, idx))
        hi = max(rates) if rates else 0.0
        ratios.append(min(rates) / hi if hi > 0 else 0.0)
    return min(ratios)


def brute_aod(y_true, y_pred, groups, priv):
    """aif360: 1/2 [(FPR_unpriv - FPR_priv) + (TPR_unpriv - TPR_priv)];
    undefined rate pairs drop their term (documented convention)."""
    n = len(groups)

    def rate(is_priv, yv):
        idx = [i for i in range(n)
               if (groups[i] == priv) == is_priv and y_true[i] == yv]
        return _sel_rate(y_pred, idx) if idx else None

    tpr_p, tpr_u = rate(True, 1), rate(False, 1)
    fpr_p, fpr_u = rate(True, 0), rate(False, 0)
    terms = []
    if fpr_p is not None and fpr_u is not None:
        terms.append(fpr_u - fpr_p)
    if tpr_p is not None and tpr_u is not None:
        terms.append(tpr_u - tpr_p)
    return 0.5 * sum(terms) if terms else 0.0


# --------------------------------------------------------------------------- #
# random-dataset generators: plain, skewed (forced missing-class groups),
# and degenerate (single group / constant prediction / -1 codes)
# --------------------------------------------------------------------------- #

def _random_case(rng):
    n = int(rng.integers(6, 60))
    n_groups = int(rng.integers(2, 6))
    # sometimes use -1 as a live group code (the reference's unknown marker
    # flows through DPD/EOD/AOD like any other value, set(attr) includes it)
    offset = -1 if rng.random() < 0.3 else 0
    groups = rng.integers(0, n_groups, n) + offset
    y_true = rng.integers(0, 2, n)
    y_pred = rng.integers(0, 2, n).astype(float)
    kind = rng.random()
    if kind < 0.25:  # force a group with only positives (undefined FPR)
        g = groups[0]
        y_true[groups == g] = 1
    elif kind < 0.4:  # force a group with only negatives (undefined TPR)
        g = groups[0]
        y_true[groups == g] = 0
    elif kind < 0.5:  # constant prediction
        y_pred[:] = float(rng.integers(0, 2))
    elif kind < 0.6:  # single group
        groups[:] = groups[0]
    return y_true.tolist(), y_pred.tolist(), groups.tolist()


N_SEEDS = 300


def test_dpd_matches_bruteforce_definition():
    for seed in range(N_SEEDS):
        y, p, g = _random_case(np.random.default_rng(seed))
        got = demographic_parity_difference(y, p, sensitive_features=g)
        assert got == pytest.approx(brute_dpd(y, p, g), abs=1e-12), (seed, y, p, g)


def test_dpr_matches_bruteforce_definition():
    for seed in range(N_SEEDS):
        y, p, g = _random_case(np.random.default_rng(seed))
        got = demographic_parity_ratio(y, p, sensitive_features=g)
        assert got == pytest.approx(brute_dpr(y, p, g), abs=1e-12), (seed, y, p, g)


def test_eod_matches_bruteforce_definition():
    for seed in range(N_SEEDS):
        y, p, g = _random_case(np.random.default_rng(seed))
        got = equalized_odds_difference(y, p, sensitive_features=g)
        assert got == pytest.approx(brute_eod(y, p, g), abs=1e-12), (seed, y, p, g)


def test_eor_matches_bruteforce_definition():
    for seed in range(N_SEEDS):
        y, p, g = _random_case(np.random.default_rng(seed))
        got = equalized_odds_ratio(y, p, sensitive_features=g)
        assert got == pytest.approx(brute_eor(y, p, g), abs=1e-12), (seed, y, p, g)


def test_aod_matches_bruteforce_definition_every_priv_group():
    for seed in range(N_SEEDS):
        y, p, g = _random_case(np.random.default_rng(seed))
        for priv in sorted(set(g)):
            got = average_odds_difference(y, p, prot_attr=g, priv_group=priv)
            assert got == pytest.approx(brute_aod(y, p, g, priv), abs=1e-12), \
                (seed, priv, y, p, g)


def test_multiclass_dpd_eod_match_onevsrest_bruteforce():
    for seed in range(100):
        rng = np.random.default_rng(seed + 10_000)
        n, n_cls = int(rng.integers(8, 40)), int(rng.integers(3, 6))
        probs = rng.random((n, n_cls))
        probs /= probs.sum(1, keepdims=True)
        y = rng.integers(0, n_cls, n)
        g = rng.integers(0, 3, n)
        pred_1h = prob_to_label(probs)
        gt_1h = num_to_onehot(y, n_cls)
        want_dpd = np.mean([brute_dpd(gt_1h[:, c].tolist(),
                                      pred_1h[:, c].tolist(), g.tolist())
                            for c in range(n_cls)])
        want_eod = np.mean([brute_eod(gt_1h[:, c].tolist(),
                                      pred_1h[:, c].tolist(), g.tolist())
                            for c in range(n_cls)])
        # 1e-6 not 1e-12: the one-hot path reduces in float32 (num_to_onehot
        # returns float32, mirroring the reference); the brute force sums the
        # exact same values in float64
        assert multiclass_demographic_parity(probs, y, g) == pytest.approx(want_dpd, abs=1e-6)
        assert multiclass_equalized_odds(probs, y, g) == pytest.approx(want_eod, abs=1e-6)


def test_comprehensive_aod_averages_abs_over_privileged_groups():
    # the consumed block (reference metrics.py:285-292): AOD reported per
    # attribute = mean over every group as privileged of |AOD(priv=g)|
    for seed in range(60):
        y, p, g = _random_case(np.random.default_rng(seed + 20_000))
        probs = np.zeros((len(y), 2))
        probs[np.arange(len(y)), np.asarray(p, dtype=int)] = 1.0
        out = evalute_comprehensive_perf_scores(
            probs, np.asarray(y, dtype=float), np.asarray([g]), num_classes=2)
        aod = out[7][0]
        want = np.mean([abs(brute_aod(y, p, g, priv)) for priv in set(g)])
        assert aod == pytest.approx(want, abs=1e-12), (seed, y, p, g)


def test_single_class_dataset_edges():
    # every label identical: TPR (or FPR) undefined for ALL groups -> the
    # convention reports the other rate's spread, never NaN and never a crash
    y = [1, 1, 1, 1]
    p = [1.0, 0.0, 1.0, 0.0]
    g = [0, 0, 1, 1]
    assert equalized_odds_difference(y, p, sensitive_features=g) == pytest.approx(
        brute_eod(y, p, g))
    assert np.isfinite(average_odds_difference(y, p, prot_attr=g, priv_group=0))
    assert demographic_parity_difference(y, p, sensitive_features=g) == pytest.approx(0.0)
