"""Dassl legacy modeling ops, re-expressed as pure JAX functions.

Capability match of ``Dassl/dassl/modeling/ops/`` (SURVEY §2.8): mixstyle.py,
efdmix.py, mmd.py, mixup.py, reverse_grad.py, cross_entropy.py, dsbn.py,
transnorm.py, attention.py, conv.py, utils.py and optimal_transport.py
(the log-domain SinkhornDivergence, which is distinct from the runtime
Sinkhorn in ``ops/sinkhorn.py``).

TPU-native redesign notes:
- torch Modules with mutable flags (``_activated``, ``training``) become pure
  functions; activation is "the caller passes an rng" / a ``train`` bool, so
  everything stays inside one jitted program with no Python-level state.
- Stochastic ops (MixStyle/EFDMix/mixup) take an explicit ``rng`` key; the
  coin-flip "apply with probability p" is a ``jnp.where`` blend, keeping the
  trace branch-free (both sides are cheap elementwise work).
- Running statistics (DSBN, TransNorm) are explicit pytrees threaded through
  ``apply`` like every BatchNorm in this codebase (models/backbones.py).
- ``torch.autograd.Function`` gradient reversal becomes ``jax.custom_vjp``.
- Loops over matrix rows (MMD's remove_self_distance) become masked means —
  identical values, no per-row Python loop for XLA to unroll.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------- #
# style-statistics mixing (mixstyle.py / efdmix.py)
# --------------------------------------------------------------------------- #


def _mix_perm(rng, batch: int, mix: str):
    """Partner permutation for style mixing (mixstyle.py:100-116).

    ``random``: uniform shuffle.  ``crossdomain``: reverse the batch (so the
    two domain halves swap), then shuffle within each half.
    """
    if mix == "random":
        return jax.random.permutation(rng, batch)
    if mix == "crossdomain":
        ra, rb = jax.random.split(rng)
        perm = jnp.arange(batch - 1, -1, -1)
        half = batch - batch // 2  # torch.chunk: first chunk gets the ceil
        perm_b = jax.random.permutation(rb, perm[:half])
        perm_a = jax.random.permutation(ra, perm[half:])
        return jnp.concatenate([perm_b, perm_a], 0)
    raise NotImplementedError(f"mix={mix!r}")


def mixstyle(rng, x, p: float = 0.5, alpha: float = 0.1, eps: float = 1e-6,
             mix: str = "random", train: bool = True):
    """MixStyle (Zhou et al., ICLR 2021) — mixstyle.py:53-123.

    x: (B, C, H, W).  Mixes per-channel mean/std with a Beta(alpha,alpha)-
    weighted partner drawn by ``mix``.  Statistics are stop-gradiented like
    the reference's ``mu.detach()``.
    """
    if not train:
        return x
    r_coin, r_beta, r_perm = jax.random.split(rng, 3)
    batch = x.shape[0]
    x32 = x.astype(jnp.float32)
    mu = jax.lax.stop_gradient(x32.mean(axis=(2, 3), keepdims=True))
    # torch .var default is UNBIASED (n-1); numpy-style var is biased
    n = x.shape[2] * x.shape[3]
    var = jax.lax.stop_gradient(x32.var(axis=(2, 3), keepdims=True))
    var = var * (n / max(n - 1, 1))
    sig = jnp.sqrt(var + eps)
    x_normed = (x32 - mu) / sig
    lmda = jax.random.beta(r_beta, alpha, alpha, (batch, 1, 1, 1))
    perm = _mix_perm(r_perm, batch, mix)
    mu_mix = mu * lmda + mu[perm] * (1 - lmda)
    sig_mix = sig * lmda + sig[perm] * (1 - lmda)
    mixed = x_normed * sig_mix + mu_mix
    apply_it = jax.random.uniform(r_coin) < p
    return jnp.where(apply_it, mixed, x32).astype(x.dtype)


def efdmix(rng, x, p: float = 0.5, alpha: float = 0.1, eps: float = 1e-6,
           mix: str = "random", train: bool = True):
    """EFDMix (Zhang et al., CVPR 2022) — efdmix.py:53-121.

    Exact feature-distribution matching: sorts each (B, C) row's spatial
    values and grafts the partner's sorted values back through the inverse
    sort, gradient flowing to the partner like the reference's
    ``x_view + (x_view_copy - x_view.detach()) * (1-lmda)``.
    """
    if not train:
        return x
    r_coin, r_beta, r_perm = jax.random.split(rng, 3)
    b, c = x.shape[0], x.shape[1]
    x_view = x.reshape(b, c, -1).astype(jnp.float32)
    value_x = jnp.sort(x_view, axis=-1)
    index_x = jnp.argsort(x_view, axis=-1)
    inverse_index = jnp.argsort(index_x, axis=-1)
    lmda = jax.random.beta(r_beta, alpha, alpha, (b, 1, 1))
    perm = _mix_perm(r_perm, b, mix)
    x_view_copy = jnp.take_along_axis(value_x[perm], inverse_index, axis=-1)
    new_x = x_view + (x_view_copy - jax.lax.stop_gradient(x_view)) * (1 - lmda)
    apply_it = jax.random.uniform(r_coin) < p
    return jnp.where(apply_it, new_x, x_view).reshape(x.shape).astype(x.dtype)


# --------------------------------------------------------------------------- #
# maximum mean discrepancy (mmd.py)
# --------------------------------------------------------------------------- #


def _offdiag_mean(k):
    """Mean over off-diagonal entries — replaces the reference's per-row
    remove_self_distance loop (mmd.py:59-64) with a mask (same value)."""
    n = k.shape[0]
    mask = 1.0 - jnp.eye(n, dtype=k.dtype)
    return (k * mask).sum() / (n * (n - 1))


def _sq_dist(x, y):
    """Squared euclidean distance matrix (mmd.py:66-75)."""
    d = (x ** 2).sum(1)[:, None] + (y ** 2).sum(1)[None, :] - 2 * x @ y.T
    return jnp.maximum(d, 0.0)


def _rbf_mixture(exponent, sigmas=(1, 5, 10)):
    k = 0.0
    for sigma in sigmas:
        k = k + jnp.exp(-exponent / (2.0 * sigma ** 2))
    return k


def mmd(x, y, kernel_type: str = "rbf", normalize: bool = False):
    """MMD^2(x, y) with linear / poly / rbf-mixture kernels (mmd.py:6-56)."""
    if normalize:
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True).clip(1e-12)
        y = y / jnp.linalg.norm(y, axis=1, keepdims=True).clip(1e-12)
    if kernel_type == "linear":
        k_xx, k_yy, k_xy = x @ x.T, y @ y.T, x @ y.T
    elif kernel_type == "poly":
        alpha, c, d = 1.0, 2.0, 2
        k_xx = (alpha * (x @ x.T) + c) ** d
        k_yy = (alpha * (y @ y.T) + c) ** d
        k_xy = (alpha * (x @ y.T) + c) ** d
    elif kernel_type == "rbf":
        k_xx = _rbf_mixture(_sq_dist(x, x))
        k_yy = _rbf_mixture(_sq_dist(y, y))
        k_xy = _rbf_mixture(_sq_dist(x, y))
    else:
        raise NotImplementedError(f"kernel_type={kernel_type!r}")
    return _offdiag_mean(k_xx) + _offdiag_mean(k_yy) - 2 * k_xy.mean()


# --------------------------------------------------------------------------- #
# mixup (mixup.py)
# --------------------------------------------------------------------------- #


def mixup(rng, x1, x2, y1, y2, beta: float, preserve_order: bool = False):
    """Beta-weighted input/label mixing (mixup.py:4-23)."""
    lmda = jax.random.beta(rng, beta, beta, (x1.shape[0], 1, 1, 1))
    if preserve_order:
        lmda = jnp.maximum(lmda, 1 - lmda)
    lmda = lmda.astype(x1.dtype)
    xmix = x1 * lmda + x2 * (1 - lmda)
    lm = lmda[:, :, 0, 0]
    ymix = y1 * lm + y2 * (1 - lm)
    return xmix, ymix


# --------------------------------------------------------------------------- #
# gradient reversal (reverse_grad.py)
# --------------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def reverse_grad(x, grad_scaling: float = 1.0):
    """Identity forward, ``-grad_scaling``-scaled gradient backward
    (reverse_grad.py:5-34)."""
    return x


def _reverse_grad_fwd(x, grad_scaling):
    return x, None


def _reverse_grad_bwd(grad_scaling, _res, g):
    return (jax.tree_util.tree_map(lambda t: -grad_scaling * t, g),)


reverse_grad.defvjp(_reverse_grad_fwd, _reverse_grad_bwd)


# --------------------------------------------------------------------------- #
# losses / probability utilities (cross_entropy.py, utils.py)
# --------------------------------------------------------------------------- #


def cross_entropy(logits, target, label_smooth: float = 0.0,
                  reduction: str = "mean"):
    """Label-smoothed cross entropy (cross_entropy.py:5-31).

    Distinct from train/clip_common.cross_entropy (the runtime loss): this is
    the Dassl utility with a smoothing knob and reduction modes.
    """
    num_classes = logits.shape[1]
    log_prob = jax.nn.log_softmax(logits, axis=1)
    onehot = jax.nn.one_hot(target, num_classes, dtype=logits.dtype)
    soft = (1 - label_smooth) * onehot + label_smooth / num_classes
    loss = -(soft * log_prob).sum(1)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    if reduction == "none":
        return loss
    raise ValueError(f"reduction={reduction!r}")


def sharpen_prob(p, temperature: float = 2.0):
    """Temperature sharpening of a probability matrix (utils.py:6-14)."""
    p = p ** temperature
    return p / p.sum(1, keepdims=True)


def reverse_index(data, label):
    """Reverse batch order (utils.py:17-20)."""
    inv = jnp.arange(data.shape[0] - 1, -1, -1)
    return data[inv], label[inv]


def shuffle_index(rng, data, label):
    """Shuffle batch order (utils.py:23-26)."""
    idx = jax.random.permutation(rng, data.shape[0])
    return data[idx], label[idx]


def create_onehot(label, num_classes: int):
    """One-hot encode an int label vector (utils.py:29-40)."""
    return jax.nn.one_hot(label, num_classes, dtype=jnp.float32)


def sigmoid_rampup(current, rampup_length: int) -> float:
    """Exponential ramp-up weight (utils.py:43-53). Host-side scalar."""
    assert rampup_length > 0
    current = float(np.clip(current, 0.0, rampup_length))
    phase = 1.0 - current / rampup_length
    return float(np.exp(-5.0 * phase * phase))


def linear_rampup(current, rampup_length: int) -> float:
    """Linear ramp-up weight (utils.py:56-64). Host-side scalar."""
    assert rampup_length > 0
    return float(np.clip(current / rampup_length, 0.0, 1.0))


def ema_update(ema_params, params, alpha: float):
    """EMA of a parameter pytree (utils.py:67-77's ema_model_update):
    ema = alpha*ema + (1-alpha)*param, one fused tree_map."""
    return jax.tree_util.tree_map(
        lambda e, p: alpha * e + (1 - alpha) * p, ema_params, params)


# --------------------------------------------------------------------------- #
# domain-specific batch norm (dsbn.py)
# --------------------------------------------------------------------------- #

_BN_MOMENTUM = 0.1
_BN_EPS = 1e-5


def dsbn_init(num_features: int, n_domain: int):
    """Per-domain BN parameters/stats stacked on a leading domain axis
    (dsbn.py:4-35's ModuleList of BatchNorms → one (D, C) tree)."""
    params = {"weight": jnp.ones((n_domain, num_features)),
              "bias": jnp.zeros((n_domain, num_features))}
    stats = {"mean": jnp.zeros((n_domain, num_features)),
             "var": jnp.ones((n_domain, num_features))}
    return params, stats


def dsbn_apply(params, stats, x, domain_idx, train: bool):
    """Batch norm with the ``domain_idx``-th statistics (dsbn.py:32-35).

    x: (B, C) or (B, C, H, W).  ``domain_idx`` may be a traced scalar — the
    select is a gather, so one compiled program serves every domain.
    """
    axes = (0,) if x.ndim == 2 else (0, 2, 3)
    shape = (1, -1) if x.ndim == 2 else (1, -1, 1, 1)
    w = params["weight"][domain_idx].reshape(shape)
    b = params["bias"][domain_idx].reshape(shape)
    x32 = x.astype(jnp.float32)
    if train:
        mean = x32.mean(axes)
        var = x32.var(axes)
        n = x32.size // x32.shape[1]
        unbiased = var * n / max(n - 1, 1)
        new_stats = {
            "mean": stats["mean"].at[domain_idx].set(
                (1 - _BN_MOMENTUM) * stats["mean"][domain_idx]
                + _BN_MOMENTUM * mean),
            "var": stats["var"].at[domain_idx].set(
                (1 - _BN_MOMENTUM) * stats["var"][domain_idx]
                + _BN_MOMENTUM * unbiased),
        }
    else:
        mean, var = stats["mean"][domain_idx], stats["var"][domain_idx]
        new_stats = stats
    y = (x32 - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + _BN_EPS)
    return (y * w + b).astype(x.dtype), new_stats


# --------------------------------------------------------------------------- #
# transferable normalization (transnorm.py)
# --------------------------------------------------------------------------- #


def transnorm_init(num_features: int):
    """TransNorm (Wang et al., NeurIPS 2019) state (transnorm.py:21-44)."""
    params = {"weight": jnp.ones((num_features,)),
              "bias": jnp.zeros((num_features,))}
    stats = {"mean_s": jnp.zeros((num_features,)),
             "var_s": jnp.ones((num_features,)),
             "mean_t": jnp.zeros((num_features,)),
             "var_t": jnp.ones((num_features,))}
    return params, stats


def _tn_alpha(mean_s, var_s, mean_t, var_t, eps):
    """Domain-adaptive channel attention (transnorm.py:49-56)."""
    c = mean_s.shape[0]
    ratio_s = mean_s / jnp.sqrt(var_s + eps)
    ratio_t = mean_t / jnp.sqrt(var_t + eps)
    dist_inv = 1.0 / (1.0 + jnp.abs(ratio_s - ratio_t))
    return c * dist_inv / dist_inv.sum()


def transnorm_apply(params, stats, x, train: bool, adaptive_alpha: bool = True,
                    momentum: float = 0.1, eps: float = 1e-5):
    """TransNorm forward (transnorm.py:58-116).

    Training splits the batch into (source, target) halves, normalizes each
    with its own statistics, and updates the per-domain running stats with
    the reference's (inverted-vs-torch-BN) momentum convention
    ``running = momentum*running + (1-momentum)*batch``.  Eval normalizes
    with target statistics.  The adaptive alpha is stop-gradiented like the
    reference's ``alpha.detach()``.
    """
    c = params["weight"].shape[0]
    shape = (1, c) if x.ndim == 2 else (1, c, 1, 1)
    axes = (0,) if x.ndim == 2 else (0, 2, 3)
    weight = params["weight"].reshape(shape)
    bias = params["bias"].reshape(shape)
    x32 = x.astype(jnp.float32)

    if not train:
        out = (x32 - stats["mean_t"].reshape(shape)) / jnp.sqrt(
            stats["var_t"].reshape(shape) + eps)
        out = out * weight + bias
        if adaptive_alpha:
            alpha = _tn_alpha(stats["mean_s"], stats["var_s"],
                              stats["mean_t"], stats["var_t"], eps)
            out = (1 + jax.lax.stop_gradient(alpha).reshape(shape)) * out
        return out.astype(x.dtype), stats

    if x32.shape[0] % 2 != 0:
        # the reference's torch.split(input, B//2) yields 3 chunks on odd B
        # and its 2-way unpack raises; surface the same constraint clearly
        raise ValueError("transnorm training expects an even batch "
                         "(source/target halves); got "
                         f"batch={x32.shape[0]}")
    half = x32.shape[0] // 2
    xs, xt = x32[:half], x32[half:2 * half]
    new_stats = dict(stats)
    outs = []
    halves = {}
    for name, part in (("s", xs), ("t", xt)):
        mean = part.mean(axes)
        # reference uses torch .var(1) default = unbiased
        n = part.size // c
        var = part.var(axes) * n / max(n - 1, 1)
        new_stats[f"mean_{name}"] = (momentum * stats[f"mean_{name}"]
                                     + (1 - momentum) * mean)
        new_stats[f"var_{name}"] = (momentum * stats[f"var_{name}"]
                                    + (1 - momentum) * var)
        out = (part - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape) + eps)
        outs.append(out * weight + bias)
        halves[name] = (mean, var)
    out = jnp.concatenate(outs, 0)
    if adaptive_alpha:
        alpha = _tn_alpha(halves["s"][0], halves["s"][1],
                          halves["t"][0], halves["t"][1], eps)
        out = (1 + jax.lax.stop_gradient(alpha).reshape(shape)) * out
    return out.astype(x.dtype), new_stats


# --------------------------------------------------------------------------- #
# dynamic convolution (attention.py, conv.py — DDG)
# --------------------------------------------------------------------------- #


def se_attention_init(rng, in_channels: int, out_features: int,
                      squeeze: int | None = None):
    """Squeeze-excite-style attention head (attention.py:8-31)."""
    squeeze = squeeze if squeeze else in_channels // 16
    assert squeeze > 0
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    s1 = (1.0 / in_channels) ** 0.5
    s2 = (1.0 / squeeze) ** 0.5
    # torch Linear default: bias uniform(+-1/sqrt(fan_in)) like the weight
    return {"fc1": {"weight": jax.random.uniform(k1, (squeeze, in_channels),
                                                 minval=-s1, maxval=s1),
                    "bias": jax.random.uniform(k3, (squeeze,),
                                               minval=-s1, maxval=s1)},
            "fc2": {"weight": jax.random.uniform(k2, (out_features, squeeze),
                                                 minval=-s2, maxval=s2),
                    "bias": jax.random.uniform(k4, (out_features,),
                                               minval=-s2, maxval=s2)}}


def se_attention_apply(params, x):
    """Global-avg-pool → fc → relu → fc → softmax (attention.py:26-31)."""
    v = x.mean((2, 3))
    v = jax.nn.relu(v @ params["fc1"]["weight"].T + params["fc1"]["bias"])
    v = v @ params["fc2"]["weight"].T + params["fc2"]["bias"]
    return jax.nn.softmax(v, axis=-1)


def _dyn_conv(x, w, stride, padding, groups=1):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride), padding=padding,
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def conv2d_dynamic_init(rng, in_channels: int, out_channels: int,
                        kernel_size: int, squeeze: int | None = None,
                        attention_in_channels: int | None = None):
    """Conv2dDynamic (conv.py:10-84): base conv + 4 kernel templates
    (grouped kxk, 1x1, kx1, 1xk) + an attention head producing their mix."""
    if kernel_size % 2 == 0:
        raise ValueError("kernel_size must be odd")
    keys = jax.random.split(rng, 11)
    groups = min(in_channels, out_channels)

    def w(kw_, kb, cout, cin, kh, kwid):
        # torch Conv2d default init (bias=True in the reference, conv.py:36-84):
        # weight AND bias uniform(+-1/sqrt(fan_in))
        fan_in = cin * kh * kwid
        bound = (1.0 / fan_in) ** 0.5
        return {
            "weight": jax.random.uniform(kw_, (cout, cin, kh, kwid),
                                         minval=-bound, maxval=bound),
            "bias": jax.random.uniform(kb, (cout,),
                                       minval=-bound, maxval=bound),
        }

    params = {
        "conv": w(keys[0], keys[5], out_channels, in_channels, kernel_size, kernel_size),
        "conv_nn": w(keys[1], keys[6], out_channels, in_channels // groups,
                     kernel_size, kernel_size),
        "conv_11": w(keys[2], keys[7], out_channels, in_channels, 1, 1),
        "conv_n1": w(keys[3], keys[8], out_channels, in_channels, kernel_size, 1),
        "conv_1n": w(keys[4], keys[9], out_channels, in_channels, 1, kernel_size),
        "attention": se_attention_init(
            keys[10], attention_in_channels or in_channels, 4, squeeze),
    }
    return params


def _dyn_conv_b(x, wb, stride, padding, groups=1):
    out = _dyn_conv(x, wb["weight"], stride, padding, groups)
    return out + wb["bias"].astype(out.dtype).reshape(1, -1, 1, 1)


def conv2d_dynamic_apply(params, x, stride: int = 1, attention_x=None):
    """Dynamic conv forward (conv.py:86-96): out = conv(x) + Σ_i y_i·template_i(x)."""
    k = params["conv"]["weight"].shape[2]
    p = k // 2
    groups = params["conv"]["weight"].shape[1] // params["conv_nn"]["weight"].shape[1]
    y = se_attention_apply(params["attention"],
                           x if attention_x is None else attention_x)
    out = _dyn_conv_b(x, params["conv"], stride, [(p, p), (p, p)])
    templates = (
        ("conv_nn", [(p, p), (p, p)], groups),
        ("conv_11", [(0, 0), (0, 0)], 1),
        ("conv_n1", [(p, p), (0, 0)], 1),
        ("conv_1n", [(0, 0), (p, p)], 1),
    )
    for i, (name, pad, g) in enumerate(templates):
        out = out + _dyn_conv_b(x, params[name], stride, pad, g) \
            * y[:, i].reshape(-1, 1, 1, 1)
    return out


# --------------------------------------------------------------------------- #
# log-domain Sinkhorn divergence (optimal_transport.py)
# --------------------------------------------------------------------------- #


def ot_distance(batch1, batch2, dist_metric: str = "cosine"):
    """Cost matrix between two batches (optimal_transport.py:9-32)."""
    if dist_metric == "cosine":
        a = batch1 / jnp.linalg.norm(batch1, axis=1, keepdims=True).clip(1e-12)
        b = batch2 / jnp.linalg.norm(batch2, axis=1, keepdims=True).clip(1e-12)
        return 1 - a @ b.T
    if dist_metric in ("euclidean", "fast_euclidean"):
        return _sq_dist(batch1, batch2)
    raise ValueError(f"Unknown cost function: {dist_metric}")


def _sinkhorn_plan(cost, eps: float, max_iter: int, thre: float,
                   differentiable: bool = False):
    """Log-domain Sinkhorn plan (optimal_transport.py:67-101).

    Default: a ``lax.while_loop`` — the reference's ``err.item()`` early exit
    becomes a device-side predicate, no host sync.  With ``differentiable``
    (the ``bp_to_sinkhorn`` path, which backprops through the iterations like
    the reference's unrolled torch loop) the same updates run as a masked
    ``lax.scan`` over ``max_iter`` steps — reverse-mode AD cannot cross a
    while_loop; the convergence mask freezes (u, v) after the early-exit
    point so both forms compute identical plans."""
    nx, ny = cost.shape
    log_mu = jnp.log(jnp.full((nx,), 1.0 / nx) + 1e-8)
    log_nu = jnp.log(jnp.full((ny,), 1.0 / ny) + 1e-8)

    def m(u, v):
        return (-cost + u[:, None] + v[None, :]) / eps

    def step(u, v):
        u_new = eps * (log_mu - jax.scipy.special.logsumexp(m(u, v), axis=1)) + u
        v_new = eps * (log_nu
                       - jax.scipy.special.logsumexp(m(u_new, v), axis=0)) + v
        err = jnp.abs(u_new - u).sum()
        return u_new, v_new, err

    u0 = jnp.zeros((nx,), cost.dtype)
    v0 = jnp.zeros((ny,), cost.dtype)

    if differentiable:
        def body(carry, _):
            u, v, active = carry
            u_new, v_new, err = step(u, v)
            u = jnp.where(active, u_new, u)
            v = jnp.where(active, v_new, v)
            active = active & (err >= thre)
            return (u, v, active), None

        (u, v, _), _ = jax.lax.scan(
            body, (u0, v0, jnp.bool_(True)), None, length=max_iter)
    else:
        def cond(state):
            _, _, err, i = state
            return (err >= thre) & (i < max_iter)

        def wbody(state):
            u, v, _, i = state
            u_new, v_new, err = step(u, v)
            return u_new, v_new, err, i + 1

        u, v, _, _ = jax.lax.while_loop(cond, wbody, (u0, v0, jnp.inf, 0))
    return jnp.exp(m(u, v))


def sinkhorn_transport_cost(x, y, dist_metric: str = "cosine",
                            eps: float = 0.01, max_iter: int = 5,
                            thre: float = 1e-3, bp_to_sinkhorn: bool = False):
    """W(x, y) = <pi, C> (optimal_transport.py:58-66)."""
    cost = ot_distance(x, y, dist_metric)
    pi = _sinkhorn_plan(cost, eps, max_iter, thre,
                        differentiable=bp_to_sinkhorn)
    if not bp_to_sinkhorn:
        pi = jax.lax.stop_gradient(pi)
    return (pi * cost).sum()


def sinkhorn_divergence(x, y, dist_metric: str = "cosine", eps: float = 0.01,
                        max_iter: int = 5, thre: float = 1e-3,
                        bp_to_sinkhorn: bool = False):
    """Debiased Sinkhorn divergence 2W(x,y) − W(x,x) − W(y,y)
    (optimal_transport.py:35-57)."""
    kw = dict(dist_metric=dist_metric, eps=eps, max_iter=max_iter, thre=thre,
              bp_to_sinkhorn=bp_to_sinkhorn)
    return (2 * sinkhorn_transport_cost(x, y, **kw)
            - sinkhorn_transport_cost(x, x, **kw)
            - sinkhorn_transport_cost(y, y, **kw))


def minibatch_energy_distance(x, y, dist_metric: str = "cosine",
                              eps: float = 0.01, max_iter: int = 5,
                              thre: float = 1e-3,
                              bp_to_sinkhorn: bool = False):
    """Minibatch energy distance over split halves
    (optimal_transport.py:104-130)."""
    kw = dict(dist_metric=dist_metric, eps=eps, max_iter=max_iter, thre=thre,
              bp_to_sinkhorn=bp_to_sinkhorn)
    hx, hy = x.shape[0] // 2, y.shape[0] // 2
    x1, x2 = x[:hx], x[hx:2 * hx]
    y1, y2 = y[:hy], y[hy:2 * hy]
    return (sinkhorn_transport_cost(x1, y1, **kw)
            + sinkhorn_transport_cost(x1, y2, **kw)
            + sinkhorn_transport_cost(x2, y1, **kw)
            + sinkhorn_transport_cost(x2, y2, **kw)
            - 2 * sinkhorn_transport_cost(x1, x2, **kw)
            - 2 * sinkhorn_transport_cost(y1, y2, **kw))
