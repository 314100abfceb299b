"""Tests for the Dassl legacy modeling ops (ops/dassl.py), the DDAIG
perturbation networks (models/networks.py), and the MixStyle/EFDMix/ViT
backbone variants (models/backbones.py) — SURVEY §2.8 parity.

Oracles: direct numpy transcriptions of the reference math
(Dassl/dassl/modeling/ops/*.py) and torch functional ops where available
(grid_sample, BatchNorm).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairfedmed_tpu.models.backbones import BACKBONE_REGISTRY
from fairfedmed_tpu.models.networks import NETWORK_REGISTRY, build_network
from fairfedmed_tpu.models.networks import _affine_grid, _grid_sample
from fairfedmed_tpu.ops import dassl as ops


KEY = jax.random.PRNGKey(0)


# --------------------------------------------------------------------------- #
# mixstyle / efdmix
# --------------------------------------------------------------------------- #


def test_mixstyle_eval_and_p0_are_identity():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3, 5, 5)),
                    jnp.float32)
    assert (ops.mixstyle(KEY, x, train=False) == x).all()
    np.testing.assert_allclose(ops.mixstyle(KEY, x, p=0.0), x, rtol=1e-6)


def test_mixstyle_identical_batch_is_identity():
    # when every sample shares the same statistics, mixing them is a no-op
    one = np.random.default_rng(1).normal(size=(1, 3, 6, 6))
    x = jnp.asarray(np.repeat(one, 4, axis=0), jnp.float32)
    out = ops.mixstyle(KEY, x, p=1.0)
    np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-5)


def test_mixstyle_preserves_normalized_content():
    # output re-normalized per (sample, channel) equals input re-normalized:
    # MixStyle only swaps first/second moments (mixstyle.py:96-123)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(6, 4, 8, 8)),
                    jnp.float32)
    out = ops.mixstyle(KEY, x, p=1.0, alpha=0.3)

    def normed(a):
        m = a.mean(axis=(2, 3), keepdims=True)
        s = np.sqrt(a.var(axis=(2, 3), keepdims=True) + 1e-6)
        return (a - m) / s

    np.testing.assert_allclose(normed(np.asarray(out)), normed(np.asarray(x)),
                               rtol=1e-2, atol=1e-3)


def test_efdmix_identity_cases_and_rank_preservation():
    x = jnp.asarray(np.random.default_rng(3).normal(size=(4, 2, 4, 4)),
                    jnp.float32)
    assert (ops.efdmix(KEY, x, train=False) == x).all()
    one = np.random.default_rng(4).normal(size=(1, 2, 4, 4))
    same = jnp.asarray(np.repeat(one, 4, axis=0), jnp.float32)
    np.testing.assert_allclose(ops.efdmix(KEY, same, p=1.0), same,
                               rtol=1e-4, atol=1e-5)
    # spatial rank order within each (b, c) row survives the value graft
    out = np.asarray(ops.efdmix(KEY, x, p=1.0)).reshape(4, 2, -1)
    xin = np.asarray(x).reshape(4, 2, -1)
    assert (np.argsort(out, axis=-1) == np.argsort(xin, axis=-1)).all()


def test_mix_crossdomain_perm_swaps_halves():
    perm = np.asarray(ops._mix_perm(KEY, 8, "crossdomain"))
    assert sorted(perm) == list(range(8))
    assert set(perm[:4]) == {4, 5, 6, 7}  # first half mixes with second domain
    assert set(perm[4:]) == {0, 1, 2, 3}


# --------------------------------------------------------------------------- #
# mmd
# --------------------------------------------------------------------------- #


def _mmd_oracle(x, y, kernel):
    # numpy transcription of mmd.py:28-64
    def offdiag(k):
        n = k.shape[0]
        return np.stack([np.concatenate([row[:i], row[i + 1:]])
                         for i, row in enumerate(k)])

    def rbf(d):
        return sum(np.exp(-d / (2.0 * s ** 2)) for s in (1, 5, 10))

    if kernel == "linear":
        return (offdiag(x @ x.T).mean() + offdiag(y @ y.T).mean()
                - 2 * (x @ y.T).mean())
    if kernel == "poly":
        f = lambda k: (k + 2.0) ** 2
        return (offdiag(f(x @ x.T)).mean() + offdiag(f(y @ y.T)).mean()
                - 2 * f(x @ y.T).mean())
    d = lambda a, b: ((a ** 2).sum(1)[:, None] + (b ** 2).sum(1)[None] - 2 * a @ b.T)
    return (offdiag(rbf(d(x, x))).mean() + offdiag(rbf(d(y, y))).mean()
            - 2 * rbf(d(x, y)).mean())


@pytest.mark.parametrize("kernel", ["linear", "poly", "rbf"])
def test_mmd_matches_reference_math(kernel):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(6, 10)).astype(np.float32)
    y = rng.normal(loc=0.5, size=(7, 10)).astype(np.float32)
    got = float(ops.mmd(jnp.asarray(x), jnp.asarray(y), kernel_type=kernel))
    want = _mmd_oracle(x, y, kernel)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_mmd_separates_distributions():
    rng = np.random.default_rng(6)
    x1 = jnp.asarray(rng.normal(size=(32, 8)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(32, 8)), jnp.float32)
    far = jnp.asarray(rng.normal(loc=3.0, size=(32, 8)), jnp.float32)
    assert float(ops.mmd(x1, far)) > float(ops.mmd(x1, x2))


# --------------------------------------------------------------------------- #
# mixup / reverse_grad / losses / utils
# --------------------------------------------------------------------------- #


def test_mixup_interpolates_consistently():
    x1 = jnp.ones((8, 3, 4, 4))
    x2 = jnp.zeros((8, 3, 4, 4))
    y1 = jnp.ones((8, 5))
    y2 = jnp.zeros((8, 5))
    xmix, ymix = ops.mixup(KEY, x1, x2, y1, y2, beta=0.75)
    lam_from_x = np.asarray(xmix)[:, 0, 0, 0]
    np.testing.assert_allclose(np.asarray(ymix)[:, 0], lam_from_x, rtol=1e-6)
    assert ((lam_from_x >= 0) & (lam_from_x <= 1)).all()
    _, ymix_po = ops.mixup(KEY, x1, x2, y1, y2, beta=0.75, preserve_order=True)
    assert (np.asarray(ymix_po)[:, 0] >= 0.5).all()


def test_reverse_grad_negates_and_scales_gradient():
    x = jnp.asarray([1.0, -2.0, 3.0])
    g = jax.grad(lambda t: (ops.reverse_grad(t, 2.5) * jnp.arange(3.0)).sum())(x)
    np.testing.assert_allclose(g, -2.5 * np.arange(3.0), rtol=1e-6)
    np.testing.assert_allclose(ops.reverse_grad(x, 2.5), x)  # identity forward


def test_label_smoothed_cross_entropy():
    logits = jnp.asarray([[2.0, 0.5, -1.0], [0.0, 1.0, 0.0]])
    target = jnp.asarray([0, 1])
    logp = np.asarray(jax.nn.log_softmax(logits, axis=1))
    onehot = np.eye(3)[np.asarray(target)]
    for smooth in (0.0, 0.2):
        soft = (1 - smooth) * onehot + smooth / 3
        want = (-soft * logp).sum(1)
        got = ops.cross_entropy(logits, target, label_smooth=smooth,
                                reduction="none")
        np.testing.assert_allclose(got, want, rtol=1e-6)
    np.testing.assert_allclose(
        ops.cross_entropy(logits, target), (-onehot * logp).sum(1).mean(),
        rtol=1e-6)


def test_prob_and_rampup_utils():
    p = jnp.asarray([[0.2, 0.8], [0.5, 0.5]])
    sharp = np.asarray(ops.sharpen_prob(p, 2))
    np.testing.assert_allclose(sharp.sum(1), 1.0, rtol=1e-6)
    assert sharp[0, 1] > 0.8  # sharpening increases the dominant mode
    np.testing.assert_allclose(ops.create_onehot(jnp.asarray([1, 0]), 3),
                               [[0, 1, 0], [1, 0, 0]])
    assert ops.sigmoid_rampup(0, 10) == pytest.approx(np.exp(-5.0))
    assert ops.sigmoid_rampup(10, 10) == 1.0
    assert ops.linear_rampup(5, 10) == 0.5
    data = jnp.arange(4.0)
    label = jnp.asarray([0, 1, 2, 3])
    rd, rl = ops.reverse_index(data, label)
    assert list(np.asarray(rl)) == [3, 2, 1, 0] and float(rd[0]) == 3.0
    sd, sl = ops.shuffle_index(KEY, data, label)
    assert sorted(np.asarray(sl)) == [0, 1, 2, 3]
    np.testing.assert_allclose(np.asarray(sd), np.asarray(sl, np.float32))


def test_ema_update_tree():
    ema = {"a": jnp.ones((3,)), "b": jnp.zeros((2,))}
    cur = {"a": jnp.zeros((3,)), "b": jnp.ones((2,))}
    out = ops.ema_update(ema, cur, alpha=0.9)
    np.testing.assert_allclose(out["a"], 0.9)
    np.testing.assert_allclose(out["b"], 0.1)


# --------------------------------------------------------------------------- #
# dsbn / transnorm
# --------------------------------------------------------------------------- #


def test_dsbn_tracks_per_domain_stats_matching_torch():
    torch = pytest.importorskip("torch")
    params, stats = ops.dsbn_init(4, n_domain=2)
    rng = np.random.default_rng(7)
    x = rng.normal(loc=2.0, scale=3.0, size=(16, 4)).astype(np.float32)

    out, stats = ops.dsbn_apply(params, stats, jnp.asarray(x), 1, train=True)

    bn = torch.nn.BatchNorm1d(4)
    want = bn(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats["mean"][1], bn.running_mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats["var"][1], bn.running_var.numpy(),
                               rtol=1e-5)
    # untouched domain keeps init stats
    np.testing.assert_allclose(stats["mean"][0], 0.0)
    np.testing.assert_allclose(stats["var"][0], 1.0)

    # eval path uses the selected domain's running stats
    ev, _ = ops.dsbn_apply(params, stats, jnp.asarray(x), 1, train=False)
    bn.eval()
    np.testing.assert_allclose(np.asarray(ev),
                               bn(torch.tensor(x)).detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_transnorm_matches_reference_math():
    # numpy transcription of transnorm.py:58-116 (training branch)
    params, stats = ops.transnorm_init(3)
    rng = np.random.default_rng(8)
    x = rng.normal(size=(8, 3)).astype(np.float32)
    out, new_stats = ops.transnorm_apply(params, stats, jnp.asarray(x),
                                         train=True)

    eps, momentum = 1e-5, 0.1
    xs, xt = x[:4], x[4:]
    outs = []
    moments = {}
    for name, part in (("s", xs), ("t", xt)):
        mean = part.mean(0)
        var = part.var(0, ddof=1)
        moments[name] = (mean, var)
        outs.append((part - mean) / np.sqrt(var + eps))
    want = np.concatenate(outs, 0)
    ratio_s = moments["s"][0] / np.sqrt(moments["s"][1] + eps)
    ratio_t = moments["t"][0] / np.sqrt(moments["t"][1] + eps)
    dist_inv = 1 / (1 + np.abs(ratio_s - ratio_t))
    alpha = 3 * dist_inv / dist_inv.sum()
    want = (1 + alpha) * want
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        new_stats["mean_s"], momentum * 0 + (1 - momentum) * moments["s"][0],
        rtol=1e-5)
    np.testing.assert_allclose(
        new_stats["var_t"], momentum * 1 + (1 - momentum) * moments["t"][1],
        rtol=1e-5)


def test_transnorm_eval_uses_target_stats():
    params, stats = ops.transnorm_init(2)
    stats = {"mean_s": jnp.asarray([0.0, 0.0]), "var_s": jnp.asarray([1.0, 1.0]),
             "mean_t": jnp.asarray([1.0, -1.0]), "var_t": jnp.asarray([4.0, 4.0])}
    x = jnp.asarray([[1.0, -1.0]])
    out, _ = ops.transnorm_apply(params, stats, x, train=False,
                                 adaptive_alpha=False)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-3)


# --------------------------------------------------------------------------- #
# dynamic conv
# --------------------------------------------------------------------------- #


def test_se_attention_softmax_output():
    params = ops.se_attention_init(KEY, 32, 4)
    x = jnp.asarray(np.random.default_rng(9).normal(size=(2, 32, 8, 8)),
                    jnp.float32)
    y = ops.se_attention_apply(params, x)
    assert y.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(y).sum(1), 1.0, rtol=1e-5)


def test_conv2d_dynamic_reduces_to_base_conv_with_zero_templates():
    params = ops.conv2d_dynamic_init(KEY, 8, 16, 3, squeeze=4)
    x = jnp.asarray(np.random.default_rng(10).normal(size=(2, 8, 10, 10)),
                    jnp.float32)
    full = ops.conv2d_dynamic_apply(params, x, stride=2)
    assert full.shape == (2, 16, 5, 5)
    zeroed = dict(params)
    for name in ("conv_nn", "conv_11", "conv_n1", "conv_1n"):
        zeroed[name] = jax.tree_util.tree_map(jnp.zeros_like, params[name])
    base_only = ops.conv2d_dynamic_apply(zeroed, x, stride=2)
    want = ops._dyn_conv_b(x, params["conv"], 2, [(1, 1), (1, 1)])
    np.testing.assert_allclose(np.asarray(base_only), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # templates contribute: full differs from base
    assert not np.allclose(np.asarray(full), np.asarray(base_only))


# --------------------------------------------------------------------------- #
# log-domain sinkhorn divergence
# --------------------------------------------------------------------------- #


def _sinkhorn_plan_oracle(C, eps, max_iter, thre):
    # numpy transcription of optimal_transport.py:67-101
    nx, ny = C.shape
    mu = np.full(nx, 1.0 / nx)
    nu = np.full(ny, 1.0 / ny)
    u = np.zeros(nx)
    v = np.zeros(ny)

    def M(u, v):
        return (-C + u[:, None] + v[None, :]) / eps

    def lse(m, axis):
        mx = m.max(axis=axis, keepdims=True)
        return (mx + np.log(np.exp(m - mx).sum(axis=axis, keepdims=True))).squeeze(axis)

    for _ in range(max_iter):
        u0 = u
        u = eps * (np.log(mu + 1e-8) - lse(M(u, v), 1)) + u
        v = eps * (np.log(nu + 1e-8) - lse(M(u, v).T, 1)) + v
        if np.abs(u - u0).sum() < thre:
            break
    return np.exp(M(u, v))


def test_sinkhorn_plan_matches_reference_iteration():
    rng = np.random.default_rng(11)
    C = np.abs(rng.normal(size=(5, 7))).astype(np.float64)
    got = np.asarray(ops._sinkhorn_plan(jnp.asarray(C), 0.05, 5, 1e-3))
    want = _sinkhorn_plan_oracle(C, 0.05, 5, 1e-3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


def test_sinkhorn_divergence_debiased_and_separating():
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
    y = jnp.asarray(rng.normal(loc=2.0, size=(8, 6)), jnp.float32)
    assert float(ops.sinkhorn_divergence(x, x)) == pytest.approx(0.0, abs=1e-5)
    assert float(ops.sinkhorn_divergence(x, y, dist_metric="euclidean")) > 0.1
    med = float(ops.minibatch_energy_distance(x, y))
    assert np.isfinite(med) and med > 0


def test_ot_distance_metrics():
    rng = np.random.default_rng(13)
    a = jnp.asarray(rng.normal(size=(3, 4)), jnp.float32)
    cos = np.asarray(ops.ot_distance(a, a, "cosine"))
    np.testing.assert_allclose(np.diag(cos), 0.0, atol=1e-6)
    euc = np.asarray(ops.ot_distance(a, a, "euclidean"))
    np.testing.assert_allclose(np.diag(euc), 0.0, atol=1e-5)
    with pytest.raises(ValueError):
        ops.ot_distance(a, a, "nope")


# --------------------------------------------------------------------------- #
# ddaig networks
# --------------------------------------------------------------------------- #


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(14)
    x = rng.normal(size=(2, 3, 9, 11)).astype(np.float32)
    theta = np.asarray([[[0.9, 0.1, 0.05], [-0.1, 1.1, -0.02]],
                        [[1.0, 0.0, 0.3], [0.0, 1.0, -0.4]]], np.float32)
    grid_t = F.affine_grid(torch.tensor(theta), (2, 3, 9, 11),
                           align_corners=False)
    want = F.grid_sample(torch.tensor(x), grid_t, align_corners=False).numpy()
    grid_j = _affine_grid(jnp.asarray(theta), 9, 11)
    np.testing.assert_allclose(np.asarray(grid_j), grid_t.numpy(),
                               rtol=1e-5, atol=1e-6)
    got = np.asarray(_grid_sample(jnp.asarray(x), grid_j))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["fcn_3x32_gctx", "fcn_3x32_gctx_stn"])
def test_fcn_perturbation_generator(name):
    init, apply = build_network(name, image_size=16)
    params, stats = init(KEY)
    x = jnp.asarray(np.random.default_rng(15).uniform(-1, 1, (2, 3, 16, 16)),
                    jnp.float32)
    x_p, p, new_stats = apply(params, stats, x, train=True, lmda=0.3)
    assert x_p.shape == x.shape and p.shape == x.shape
    assert np.abs(np.asarray(p)).max() <= 1.0  # tanh head
    assert np.isfinite(np.asarray(x_p)).all()
    # the generator jits (whole thing rides inside the trainer step)
    jitted = jax.jit(lambda pp, ss, xx: apply(pp, ss, xx, train=True)[0])
    np.testing.assert_allclose(np.asarray(jitted(params, stats, x)),
                               np.asarray(apply(params, stats, x, True)[0]),
                               rtol=1e-5, atol=1e-5)


def test_network_registry_names():
    for name in ("fcn_3x32_gctx", "fcn_3x64_gctx", "fcn_3x32_gctx_stn",
                 "fcn_3x64_gctx_stn"):
        assert name in NETWORK_REGISTRY
    with pytest.raises(KeyError):
        build_network("nope")


# --------------------------------------------------------------------------- #
# backbone variants
# --------------------------------------------------------------------------- #


def test_mixstyle_resnet_variants_registered_and_consistent():
    for base in ("resnet18", "resnet50", "resnet101"):
        for tag in ("ms", "efdmix"):
            for suffix in ("l123", "l12", "l1"):
                assert f"{base}_{tag}_{suffix}" in BACKBONE_REGISTRY
    assert "resnet152" in BACKBONE_REGISTRY

    init, apply, dim = BACKBONE_REGISTRY["resnet18_ms_l1"]()
    init0, apply0, dim0 = BACKBONE_REGISTRY["resnet18"]()
    assert dim == dim0 == 512
    params, stats = init(KEY)
    x = jnp.asarray(np.random.default_rng(16).uniform(0, 1, (4, 3, 32, 32)),
                    jnp.float32)
    # without an rng the mix layer is inactive -> identical to plain resnet18
    feat_plain, _ = apply0(params, stats, x, train=True)
    feat_nomix, _ = apply(params, stats, x, train=True)
    np.testing.assert_allclose(np.asarray(feat_nomix), np.asarray(feat_plain),
                               rtol=1e-5, atol=1e-5)
    feat_mix, _ = apply(params, stats, x, train=True, rng=KEY)
    assert feat_mix.shape == (4, 512)
    assert np.isfinite(np.asarray(feat_mix)).all()


def test_vit_backbone_global_pool():
    init, apply, dim = BACKBONE_REGISTRY["vit_base_patch16"](
        image_size=32, depth=2, width=64, heads=4)
    assert dim == 64
    params, stats = init(KEY)
    x = jnp.asarray(np.random.default_rng(17).uniform(0, 1, (2, 3, 32, 32)),
                    jnp.float32)
    feat, _ = apply(params, stats, x, train=True)
    assert feat.shape == (2, 64)
    assert np.isfinite(np.asarray(feat)).all()


def test_transnorm_rejects_odd_train_batch():
    params, stats = ops.transnorm_init(2)
    with pytest.raises(ValueError, match="even batch"):
        ops.transnorm_apply(params, stats, jnp.ones((5, 2)), train=True)


def test_dsbn_2d_conv_features_match_torch():
    torch = pytest.importorskip("torch")
    params, stats = ops.dsbn_init(3, n_domain=2)
    x = np.random.default_rng(20).normal(size=(4, 3, 5, 5)).astype(np.float32)
    out, stats = ops.dsbn_apply(params, stats, jnp.asarray(x), 0, train=True)
    bn = torch.nn.BatchNorm2d(3)
    want = bn(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats["mean"][0], bn.running_mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(stats["mean"][1], 0.0)  # untouched domain


def test_mixstyle_jits_with_traced_rng():
    x = jnp.asarray(np.random.default_rng(21).normal(size=(4, 2, 6, 6)),
                    jnp.float32)
    f = jax.jit(lambda k, a: ops.efdmix(k, ops.mixstyle(k, a, p=1.0), p=1.0,
                                        mix="crossdomain"))
    out = f(KEY, x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_sinkhorn_divergence_gradient_modes():
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
    y = jnp.asarray(rng.normal(loc=1.0, size=(6, 4)), jnp.float32)
    for bp in (False, True):
        g = jax.grad(lambda a: ops.sinkhorn_divergence(
            a, y, dist_metric="euclidean", bp_to_sinkhorn=bp))(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0  # cost matrix always carries grad


def test_conv2d_dynamic_is_differentiable():
    params = ops.conv2d_dynamic_init(KEY, 8, 8, 3, squeeze=4)
    x = jnp.asarray(np.random.default_rng(23).normal(size=(2, 8, 6, 6)),
                    jnp.float32)
    g = jax.grad(lambda p: ops.conv2d_dynamic_apply(p, x).sum())(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
