import numpy as np
import pytest

pytestmark = pytest.mark.smoke
from sklearn.metrics import roc_auc_score

from fairfedmed_tpu.evaluation import metrics as M


@pytest.fixture()
def binary_case():
    rng = np.random.default_rng(0)
    n = 200
    probs = rng.uniform(0, 1, size=(n, 2)).astype(np.float32)
    probs = probs / probs.sum(-1, keepdims=True)
    gts = rng.integers(0, 2, n)
    attr = rng.integers(0, 3, n)
    return probs, gts, attr


def test_compute_auc_binary_matches_sklearn(binary_case):
    probs, gts, _ = binary_case
    ours = M.compute_auc(probs, gts, num_classes=2)
    ref = roc_auc_score(np.eye(2)[gts], probs, average="macro", multi_class="ovr")
    np.testing.assert_allclose(ours, ref, rtol=1e-9)


def test_dpd_eod_definitions():
    # hand-computable case with 2 groups
    y = np.array([1, 1, 0, 0, 1, 1, 0, 0])
    pred = np.array([1, 0, 0, 0, 1, 1, 1, 0])
    g = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    # selection: g0 1/4, g1 3/4 → dpd 0.5
    assert abs(M.demographic_parity_difference(y, pred, sensitive_features=g) - 0.5) < 1e-9
    # TPR: g0 1/2, g1 2/2 → .5 ; FPR: g0 0/2, g1 1/2 → .5 → eod 0.5
    assert abs(M.equalized_odds_difference(y, pred, sensitive_features=g) - 0.5) < 1e-9


def test_aod_definition():
    y = np.array([1, 1, 0, 0, 1, 1, 0, 0])
    pred = np.array([1, 0, 0, 0, 1, 1, 1, 0])
    g = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    # priv=0: unpriv g1: TPR 1.0, FPR 0.5 ; priv g0: TPR 0.5, FPR 0.0
    # AOD = 0.5*((0.5-0)+(1-0.5)) = 0.5
    assert abs(M.average_odds_difference(y, pred, prot_attr=g, priv_group=0) - 0.5) < 1e-9


def test_es_auc_skips_unknown_group(binary_case):
    probs, gts, attr = binary_case
    attr2 = attr.copy()
    attr2[:10] = -1
    es = M.equity_scaled_AUC(probs, gts, attr2)
    assert 0 <= es <= 1


def test_es_auc_precomputed_matches_recomputed(binary_case):
    probs, gts, attr = binary_case
    base = M.equity_scaled_AUC(probs, gts, attr)
    overall = M.compute_auc(probs, gts)
    groups = [M.compute_auc(probs[attr == g], gts[attr == g])
              for g in np.unique(attr) if g != -1]
    fast = M.equity_scaled_AUC(probs, gts, attr,
                               overall_auc=overall, group_aucs=groups)
    np.testing.assert_allclose(fast, base, rtol=1e-12)


def test_between_group_disparity_empty_groups_is_nan():
    # reference crashes on np.max([]) here; we report nan instead
    d = M.compute_between_group_disparity([], 0.7)
    assert np.isnan(d[0]) and np.isnan(d[1])


def test_comprehensive_block_tolerates_all_unknown_attr(binary_case):
    """An attribute column that is -1 everywhere (key absent from the NPZs)
    must not crash the whole evaluation — its disparity is nan."""
    probs, gts, attr = binary_case
    attrs = np.stack([attr, np.full_like(attr, -1)])
    out = M.evalute_comprehensive_perf_scores(probs, gts, attrs)
    bgd = out[8]
    assert np.isfinite(np.asarray(bgd[0], np.float64)).all()
    assert np.isnan(np.asarray(bgd[1], np.float64)).all()


def test_comprehensive_block_shapes(binary_case):
    probs, gts, attr = binary_case
    attrs = np.stack([attr, (attr + 1) % 2])
    (oa, esacc, oauc, esauc, aucs, dpds, eods, aods, bgd) = \
        M.evalute_comprehensive_perf_scores(probs, gts, attrs)
    assert esacc.shape == (2,) and esauc.shape == (2,)
    assert len(aucs) == 2 and len(aods) == 2
    assert bgd.shape == (2, 2)
    assert 0 <= oa <= 1 and 0 <= oauc <= 1


def test_compute_auc_matches_sklearn_exactly():
    """The rank-identity AUC must equal sklearn's ROC AUC bit for bit —
    including heavy ties, multiclass OVR-macro, and single-class nan."""
    import warnings

    from sklearn.metrics import auc as sk_auc
    from sklearn.metrics import roc_auc_score, roc_curve

    from fairfedmed_tpu.evaluation.metrics import compute_auc

    rng = np.random.default_rng(0)
    # binary, same-shape path, continuous scores and heavy ties
    for scores in (rng.random(300), np.round(rng.random(300), 1)):
        y = rng.integers(0, 2, 300)
        fpr, tpr, _ = roc_curve(y, scores)
        assert compute_auc(scores, y) == pytest.approx(
            float(sk_auc(fpr, tpr)), abs=1e-12)
    # onehot macro OVR path (the evaluator's [N, C] softmax case)
    for n_cls in (2, 4):
        y = rng.integers(0, n_cls, 200)
        probs = rng.random((200, n_cls))
        onehot = np.eye(n_cls)[y]
        want = roc_auc_score(onehot, probs, average="macro", multi_class="ovr")
        assert compute_auc(probs, y, num_classes=n_cls) == pytest.approx(
            float(want), abs=1e-12)
    # single-class -> nan in both paths (sklearn 1.9 warn+nan parity)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ones = np.ones(5, dtype=int)
        assert np.isnan(compute_auc(rng.random(5), ones))
        assert np.isnan(compute_auc(rng.random((5, 2)), ones, num_classes=2))
        # missing class in a 3-way problem -> nan propagates through the mean
        y3 = np.asarray([0, 0, 1, 1, 0])
        assert np.isnan(compute_auc(rng.random((5, 3)), y3, num_classes=3))


# --- Dassl distance helpers (Dassl/dassl/metrics/distance.py:1-77) ---------

def test_distance_matrix_vs_torch_oracle():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from fairfedmed_tpu.evaluation import compute_distance_matrix

    rng = np.random.default_rng(0)
    a = rng.normal(size=(7, 5)).astype(np.float32)
    b = rng.normal(size=(4, 5)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)

    want_euc = (ta.pow(2).sum(1, keepdim=True).expand(7, 4)
                + tb.pow(2).sum(1, keepdim=True).expand(4, 7).t()
                - 2 * ta @ tb.t()).numpy()
    got_euc = np.asarray(compute_distance_matrix(a, b, "euclidean"))
    np.testing.assert_allclose(got_euc, want_euc, atol=1e-5)

    want_cos = (1 - F.normalize(ta, p=2, dim=1)
                @ F.normalize(tb, p=2, dim=1).t()).numpy()
    got_cos = np.asarray(compute_distance_matrix(a, b, "cosine"))
    np.testing.assert_allclose(got_cos, want_cos, atol=1e-6)


def test_distance_matrix_validates_inputs():
    from fairfedmed_tpu.evaluation import compute_distance_matrix

    with pytest.raises(ValueError, match="2-D"):
        compute_distance_matrix(np.zeros((3,)), np.zeros((3, 2)))
    with pytest.raises(ValueError, match="feature dims"):
        compute_distance_matrix(np.zeros((3, 2)), np.zeros((3, 4)))
    with pytest.raises(ValueError, match="Unknown distance metric"):
        compute_distance_matrix(np.zeros((3, 2)), np.zeros((3, 2)), "manhattan")
