import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairfedmed_tpu.adapters import init_lora
from fairfedmed_tpu.core.precision import policy_from_prec
from fairfedmed_tpu.models.resnet_clip import (
    RN_PRESETS,
    batch_norm,
    init_modified_resnet,
    resnet_encode,
)

CFG = RN_PRESETS["test-rn"]


@pytest.fixture(scope="module")
def rn():
    return init_modified_resnet(jax.random.PRNGKey(0), CFG)


def test_shapes_pooled_and_tokens(rn):
    params, bn, stats = rn
    policy = policy_from_prec("fp32")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    pooled, new_stats = resnet_encode(params, bn, stats, x, CFG, policy, train=False)
    assert pooled.shape == (2, CFG.output_dim)
    toks, _ = resnet_encode(params, bn, stats, x, CFG, policy, return_tokens=True)
    assert toks.shape == (2, 2, CFG.output_dim)  # 32/32=1 → 1 spatial + 1 mean


def test_batchnorm_torch_semantics():
    bn = {"weight": jnp.asarray([2.0]), "bias": jnp.asarray([1.0])}
    stat = {"mean": jnp.asarray([0.0]), "var": jnp.asarray([1.0])}
    x = jnp.arange(8, dtype=jnp.float32).reshape(2, 1, 2, 2)
    y, new_stat = batch_norm(bn, stat, x, train=True)
    m, v = x.mean(), x.var()
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray((x - m) / jnp.sqrt(v + 1e-5) * 2 + 1), rtol=1e-5)
    n = 8
    np.testing.assert_allclose(float(new_stat["mean"][0]), 0.9 * 0 + 0.1 * float(m), rtol=1e-6)
    np.testing.assert_allclose(float(new_stat["var"][0]),
                               0.9 * 1 + 0.1 * float(v) * n / (n - 1), rtol=1e-6)
    # eval mode uses running stats and leaves them unchanged
    y2, stat2 = batch_norm(bn, stat, x, train=False)
    assert stat2 is stat


def test_fairlora_conv_zero_at_init(rn):
    params, bn, stats = rn
    policy = policy_from_prec("fp32")
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32, 32))
    base, _ = resnet_encode(params, bn, stats, x, CFG, policy, train=False)

    lora = {}
    inplanes = CFG.width
    rng = jax.random.PRNGKey(3)
    for li, nblocks in enumerate(CFG.layers):
        planes = CFG.width * (2 ** li)
        blocks = []
        for _ in range(nblocks):
            blocks.append({
                "conv1": init_lora(rng, inplanes, planes, 4, "FairLoRA", num_groups=2),
                "conv3": init_lora(rng, planes, planes * 4, 4, "FairLoRA", num_groups=2),
            })
            inplanes = planes * 4
        lora[f"layer{li + 1}"] = blocks
    mix = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    out, _ = resnet_encode(params, bn, stats, x, CFG, policy, train=False,
                           lora=lora, attr_mix=mix, lora_scaling=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=1e-5, atol=1e-6)
