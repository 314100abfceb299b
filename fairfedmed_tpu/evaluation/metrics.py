"""Fairness and classification metrics (host-side numpy/sklearn).

Numerically mirrors evaluation/metrics.py of the reference.  fairlearn and
aif360 are unavailable in this environment, so their two consumed functions —
demographic parity difference, equalized odds difference (fairlearn) and
average odds difference (aif360) — are reimplemented here with the same
definitions:

* DPD  = max_g P(ŷ=1 | g) − min_g P(ŷ=1 | g)
* EOD  = max over y∈{0,1} of (max_g − min_g) P(ŷ=1 | y, g)
* AOD(priv) = ½[(FPR_unpriv − FPR_priv) + (TPR_unpriv − TPR_priv)]; the
  reference averages |AOD| over each group as privileged
  (evaluation/metrics.py:285-292).

Groups with undefined rates (no samples of a class) are skipped via nan-aware
reductions — the reference would propagate NaN or trip its try/except fallback.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import rankdata as scipy_rankdata
from sklearn.metrics import f1_score

__all__ = [
    "accuracy",
    "compute_auc",
    "num_to_onehot",
    "prob_to_label",
    "demographic_parity_difference",
    "equalized_odds_difference",
    "average_odds_difference",
    "multiclass_demographic_parity",
    "multiclass_equalized_odds",
    "equity_scaled_accuracy",
    "equity_scaled_AUC",
    "compute_between_group_disparity",
    "evalute_comprehensive_perf_scores",
    "macro_f1_score",
]


def _np(x):
    return np.asarray(x)


def num_to_onehot(y, num_classes: int) -> np.ndarray:
    y = _np(y).astype(int)
    out = np.zeros((len(y), num_classes), dtype=np.float32)
    out[np.arange(len(y)), y] = 1.0
    return out


def prob_to_label(pred_prob) -> np.ndarray:
    pred_prob = _np(pred_prob)
    labels = pred_prob.argmax(-1)
    return num_to_onehot(labels, pred_prob.shape[-1])


def accuracy(output, target, topk=(1,)) -> float:
    """Top-1 accuracy in [0,1] (evaluation/metrics.py:314-338 semantics)."""
    output, target = _np(output), _np(target)
    if output.ndim == 1:
        return float(np.mean((output >= 0.5).astype(float) == target))
    pred = output.argmax(-1)
    return float(np.mean(pred == target))


def macro_f1_score(y_true, y_pred) -> float:
    y_true, y_pred = _np(y_true), _np(y_pred)
    return float(f1_score(y_true, y_pred, average="macro", labels=np.unique(y_true)))


def _binary_auc(y, score) -> float:
    """Exact ROC AUC via the rank (Mann-Whitney U) identity with average
    ranks for ties — equal to sklearn's trapezoid-ROC value bit for bit
    (verified incl. heavy ties), ~50x cheaper than ``roc_auc_score``'s
    validation stack, which dominated the per-round eval wall-clock.
    Returns nan when only one class is present (sklearn parity)."""
    y = _np(y).astype(bool)
    n_pos = int(y.sum())
    n_neg = y.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    ranks = scipy_rankdata(_np(score), method="average")
    return float((ranks[y].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def compute_auc(pred_prob, y, num_classes: int = 2) -> float:
    """Binary AUC via ROC when pred/y shapes match; else macro one-vs-rest
    (evaluation/metrics.py:340-356).  Both branches use the rank identity
    (`_binary_auc`); equality with the sklearn calls the reference makes is
    pinned by tests/test_metrics.py."""
    pred_prob, y = _np(pred_prob), _np(y)
    if num_classes == 2 and pred_prob.shape == y.shape:
        return _binary_auc(y, pred_prob)
    # reference: roc_auc_score(onehot, pred_prob, average="macro",
    # multi_class="ovr") — per-column binary AUC, plain mean (nan propagates
    # when a column has a single class, matching sklearn 1.9's warn+nan)
    y = y.astype(int)
    cols = [_binary_auc(y == c, pred_prob[:, c]) for c in range(num_classes)]
    return float(np.mean(cols))


# --------------------------------------------------------------------------- #
# group fairness primitives
# --------------------------------------------------------------------------- #

def _group_rates(y_true, y_pred, groups):
    """selection/TPR/FPR per group; NaN where undefined."""
    y_true, y_pred, groups = _np(y_true), _np(y_pred), _np(groups)
    out = {}
    for g in np.unique(groups):
        m = groups == g
        sel = y_pred[m].mean() if m.any() else np.nan
        pos = m & (y_true == 1)
        neg = m & (y_true == 0)
        tpr = y_pred[pos].mean() if pos.any() else np.nan
        fpr = y_pred[neg].mean() if neg.any() else np.nan
        out[g] = (sel, tpr, fpr)
    return out


def demographic_parity_difference(y_true, y_pred, *, sensitive_features) -> float:
    rates = _group_rates(y_true, y_pred, sensitive_features)
    sel = np.array([v[0] for v in rates.values()], dtype=np.float64)
    return float(np.nanmax(sel) - np.nanmin(sel))


def demographic_parity_ratio(y_true, y_pred, *, sensitive_features) -> float:
    rates = _group_rates(y_true, y_pred, sensitive_features)
    sel = np.array([v[0] for v in rates.values()], dtype=np.float64)
    hi = np.nanmax(sel)
    return float(np.nanmin(sel) / hi) if hi > 0 else 0.0


def equalized_odds_difference(y_true, y_pred, *, sensitive_features) -> float:
    rates = _group_rates(y_true, y_pred, sensitive_features)
    tpr = np.array([v[1] for v in rates.values()], dtype=np.float64)
    fpr = np.array([v[2] for v in rates.values()], dtype=np.float64)
    tpr_d = np.nanmax(tpr) - np.nanmin(tpr) if np.isfinite(tpr).any() else 0.0
    fpr_d = np.nanmax(fpr) - np.nanmin(fpr) if np.isfinite(fpr).any() else 0.0
    return float(max(tpr_d, fpr_d))


def equalized_odds_ratio(y_true, y_pred, *, sensitive_features) -> float:
    rates = _group_rates(y_true, y_pred, sensitive_features)
    tpr = np.array([v[1] for v in rates.values()], dtype=np.float64)
    fpr = np.array([v[2] for v in rates.values()], dtype=np.float64)

    def ratio(x):
        hi = np.nanmax(x)
        return np.nanmin(x) / hi if hi > 0 else 0.0

    return float(min(ratio(tpr), ratio(fpr)))


def average_odds_difference(y_true, y_pred, *, prot_attr, priv_group) -> float:
    """aif360-style AOD with explicit privileged group."""
    y_true, y_pred, groups = _np(y_true), _np(y_pred), _np(prot_attr)
    priv = groups == priv_group
    unpriv = ~priv

    def rate(mask, y_val):
        sel = mask & (y_true == y_val)
        return y_pred[sel].mean() if sel.any() else np.nan

    tpr_p, tpr_u = rate(priv, 1), rate(unpriv, 1)
    fpr_p, fpr_u = rate(priv, 0), rate(unpriv, 0)
    terms = []
    if np.isfinite(fpr_p) and np.isfinite(fpr_u):
        terms.append(fpr_u - fpr_p)
    if np.isfinite(tpr_p) and np.isfinite(tpr_u):
        terms.append(tpr_u - tpr_p)
    return float(0.5 * sum(terms)) if terms else 0.0


def multiclass_demographic_parity(pred_prob, y, attrs) -> float:
    pred_one_hot = prob_to_label(pred_prob)
    gt_one_hot = num_to_onehot(_np(y).astype(int), pred_one_hot.shape[1])
    scores = [
        demographic_parity_difference(gt_one_hot[:, i], pred_one_hot[:, i], sensitive_features=attrs)
        for i in range(pred_one_hot.shape[1])
    ]
    return float(np.mean(scores))


def multiclass_equalized_odds(pred_prob, y, attrs) -> float:
    pred_one_hot = prob_to_label(pred_prob)
    gt_one_hot = num_to_onehot(_np(y).astype(int), pred_one_hot.shape[1])
    scores = [
        equalized_odds_difference(gt_one_hot[:, i], pred_one_hot[:, i], sensitive_features=attrs)
        for i in range(pred_one_hot.shape[1])
    ]
    return float(np.mean(scores))


# --------------------------------------------------------------------------- #
# equity-scaled scores
# --------------------------------------------------------------------------- #

def equity_scaled_accuracy(output, target, attrs, alpha: float = 1.0) -> float:
    """overall_acc / (1 + Σ_g |acc_g − overall_acc|) (metrics.py:486-511).

    Note: like the reference, iterates over ALL group values including −1.
    """
    output, target, attrs = _np(output), _np(target), _np(attrs)
    if output.ndim >= 2:
        overall = np.mean(output.argmax(-1) == target)
    else:
        overall = np.mean((output >= 0.5).astype(float) == target)
    gap = 0.0
    for g in np.unique(attrs).astype(int):
        m = attrs == g
        po, to = output[m], target[m]
        acc = np.mean(po.argmax(-1) == to) if output.ndim >= 2 else np.mean((po >= 0.5).astype(float) == to)
        gap += abs(acc - overall)
    return float(overall / (alpha * gap + 1))


def equity_scaled_AUC(output, target, attrs, alpha: float = 1.0,
                      num_classes: int = 2, overall_auc=None,
                      group_aucs=None) -> float:
    """overall_auc / (1 + Σ_g |auc_g − overall_auc|), skipping group −1
    (metrics.py:513-547).

    ``overall_auc``/``group_aucs`` accept precomputed values — the
    comprehensive block computes the identical quantities, so passing them
    avoids ~(G+1) redundant rank-AUC passes per attribute per evaluation.
    Semantics are unchanged (same group enumeration, same nan propagation)."""
    output, target, attrs = _np(output), _np(target), _np(attrs)
    overall = (compute_auc(output, target, num_classes=num_classes)
               if overall_auc is None else overall_auc)
    if group_aucs is None:
        group_aucs = [
            compute_auc(output[attrs == g], target[attrs == g],
                        num_classes=num_classes)
            for g in np.unique(attrs).astype(int) if g != -1]
    gap = float(sum(abs(a - overall) for a in group_aucs))
    return float(overall / (alpha * gap + 1))


def compute_between_group_disparity(auc_list, overall_auc):
    auc_list = _np(auc_list)
    if auc_list.size == 0:
        # an attribute column with no valid (> -1) group: the reference
        # crashes on np.max([]) here (metrics.py:549-550) — report nan
        # instead so one absent attribute can't kill the whole evaluation
        return (float("nan"), float("nan"))
    return (
        float(np.std(auc_list) / overall_auc),
        float((np.max(auc_list) - np.min(auc_list)) / overall_auc),
    )


# --------------------------------------------------------------------------- #
# the comprehensive block consumed by Classification_oph
# --------------------------------------------------------------------------- #

def evalute_comprehensive_perf_scores(preds, gts, attrs=None, num_classes: int = 2):
    """Per-attribute fairness block (metrics.py:197-311; name kept verbatim).

    preds: [B, C] probabilities; gts: [B]; attrs: [num_attrs, B].
    Returns (overall_acc, esaccs, overall_auc, esaucs, aucs_by_attrs,
             dpds, eods, aods, between_group_disparity).
    """
    preds, gts, attrs = _np(preds), _np(gts), _np(attrs)
    esaccs, esaucs, aucs_by_attrs = [], [], []
    dpds, eods, aods, bgd = [], [], [], []

    overall_acc = accuracy(preds, gts, topk=(1,))
    overall_auc = compute_auc(preds, gts, num_classes=num_classes)

    for i in range(attrs.shape[0]):
        attr = attrs[i]
        esaccs.append(equity_scaled_accuracy(preds, gts, attr))

        aucs_by_group = []
        for g in np.unique(attr).astype(int):
            if g == -1:
                continue
            m = attr == g
            aucs_by_group.append(compute_auc(preds[m], gts[m], num_classes=num_classes))
        # feed the already-computed overall/group AUCs into the equity scale
        # (identical enumeration) instead of recomputing every rank pass
        esaucs.append(equity_scaled_AUC(
            preds, gts, attr, num_classes=num_classes,
            overall_auc=overall_auc, group_aucs=aucs_by_group))
        aucs_by_attrs.append(np.array(aucs_by_group))
        bgd.append(list(compute_between_group_disparity(aucs_by_group, overall_auc)))

        if num_classes == 2:
            if preds.shape == gts.shape:
                pred_labels = (preds >= 0.5).astype(float)
            else:
                # reference metrics.py:252 asserts the binary branch only
                # sees two-column probabilities; >2 columns here means a
                # multiclass run fell through with the default num_classes=2
                # and would feed multi-valued "selection rates" into the
                # binary DPD/EOD — fail fast like the reference
                assert preds.shape[-1] == 2, (
                    f"binary fairness branch got {preds.shape[-1]}-column "
                    "predictions; pass num_classes for multiclass datasets")
                pred_labels = preds.argmax(-1)
            try:
                dpd = demographic_parity_difference(gts, pred_labels, sensitive_features=attr)
            except Exception:
                dpd = 0
            try:
                eod = equalized_odds_difference(gts, pred_labels, sensitive_features=attr)
            except Exception:
                eod = 0
            aod_vals = [
                abs(average_odds_difference(gts, pred_labels, prot_attr=attr, priv_group=g))
                for g in set(attr.tolist())
            ]
            aod = sum(aod_vals) / max(len(aod_vals), 1)
        else:
            dpd = multiclass_demographic_parity(preds, gts, attr)
            eod = multiclass_equalized_odds(preds, gts, attr)
            aod = 0

        dpds.append(dpd)
        eods.append(eod)
        aods.append(aod)

    return (
        overall_acc,
        np.array(esaccs),
        overall_auc,
        np.array(esaucs),
        aucs_by_attrs,
        np.array(dpds),
        np.array(eods),
        aods,
        np.array(bgd),
    )
