import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairfedmed_tpu.core.precision import policy_from_prec
from fairfedmed_tpu.models.clip_model import (
    CLIPConfig,
    causal_mask,
    init_clip_params,
    l2_normalize,
    text_encode,
    vit_encode,
)
from fairfedmed_tpu.models.prompt_learner import assemble_prompts, init_prompt_learner

TINY = CLIPConfig(
    embed_dim=32,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=8,
    transformer_width=32,
    transformer_heads=4,
    transformer_layers=2,
)


@pytest.fixture(scope="module")
def params():
    return init_clip_params(jax.random.PRNGKey(0), TINY)


def test_vit_pooled_and_tokens(params):
    policy = policy_from_prec("fp32")
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    pooled = vit_encode(params["visual"], img, TINY, policy)
    assert pooled.shape == (2, 32)
    toks = vit_encode(params["visual"], img, TINY, policy, return_tokens=True)
    assert toks.shape == (2, 17, 32)  # 1 CLS + 16 patches


def test_patch_embed_matches_conv(params):
    """The unfold+matmul patch embedding must equal a strided conv."""
    policy = policy_from_prec("fp32")
    img = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 32, 32))
    w = params["visual"]["conv1"]["weight"]
    conv = jax.lax.conv_general_dilated(
        img, w, window_strides=(8, 8), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [1, D, 4, 4]
    conv = conv.reshape(1, 64, 16).transpose(0, 2, 1)
    p = 8
    x = img.reshape(1, 3, 4, p, 4, p).transpose(0, 2, 4, 1, 3, 5).reshape(1, 16, 3 * p * p)
    ours = x @ w.reshape(64, 3 * p * p).T
    np.testing.assert_allclose(np.asarray(ours), np.asarray(conv), rtol=1e-4, atol=1e-5)


def test_text_encoder_shapes_and_eot(params):
    policy = policy_from_prec("fp32")
    classnames = ["not glaucoma", "glaucoma"]
    pl_params, state = init_prompt_learner(
        jax.random.PRNGKey(3), classnames, params["text"]["token_embedding"], TINY,
        n_ctx=4, n_prompts=2,
    )
    prompts = assemble_prompts(pl_params["ctx"], state)
    assert prompts.shape == (4, 77, 32)  # N*n_cls
    feats = text_encode(params, prompts, state.eot_indices, TINY, policy)
    assert feats.shape == (4, 32)


def test_prompt_positions(params):
    classnames = ["abc", "de"]
    for pos in ["end", "middle", "front"]:
        pl_params, state = init_prompt_learner(
            jax.random.PRNGKey(4), classnames, params["text"]["token_embedding"], TINY,
            n_ctx=4, n_prompts=1, class_token_position=pos,
        )
        prompts = assemble_prompts(pl_params["ctx"], state)
        assert prompts.shape == (2, 77, 32)


def test_causal_mask():
    m = np.asarray(causal_mask(4))
    assert np.isinf(m[0, 1]) and m[0, 1] < 0
    assert (m[np.tril_indices(4)] == 0).all()


def test_l2_normalize():
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 8))
    n = np.linalg.norm(np.asarray(l2_normalize(x)), axis=-1)
    np.testing.assert_allclose(n, 1.0, rtol=1e-5)


def _stacked_lora(rng, cfg, rank=2, num_groups=2):
    """Layer-stacked FairLoRA tree as glp_ot builds it, with A perturbed off
    its zero init so the adapter path contributes to primal and grads."""
    from fairfedmed_tpu.adapters.lora import init_lora

    d = cfg.vision_width
    keys = jax.random.split(rng, 2 * cfg.vision_layers)

    def one(k, fin, fout):
        p = init_lora(k, fin, fout, rank, "FairLoRA", num_groups)
        p["lora_A"] = 0.02 * jax.random.normal(k, p["lora_A"].shape)
        return p

    stack = lambda ps: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ps)
    return {
        "c_fc": stack([one(keys[i], d, 4 * d) for i in range(cfg.vision_layers)]),
        "c_proj": stack([one(keys[cfg.vision_layers + i], 4 * d, d)
                         for i in range(cfg.vision_layers)]),
    }


@pytest.mark.smoke
@pytest.mark.parametrize("with_lora", [False, True])
def test_remat_policies_identical(params, with_lora):
    """Remat selects WHAT is saved for backward, never the primal math: every
    policy must produce identical outputs and gradients (fp32 CPU)."""
    from fairfedmed_tpu.adapters.lora import group_mix

    policy = policy_from_prec("fp32")
    img = jax.random.normal(jax.random.PRNGKey(7), (2, 3, 32, 32))
    lora = _stacked_lora(jax.random.PRNGKey(8), TINY) if with_lora else None
    attr_mix = group_mix(jnp.array([0, 1]), 2, 2, jnp.float32) if with_lora else None

    def run(remat):
        def loss(visual, lora):
            out = vit_encode(visual, img, TINY, policy, lora=lora,
                             attr_mix=attr_mix, lora_scaling=0.5, remat=remat)
            return jnp.sum(out ** 2)

        val, grads = jax.value_and_grad(loss, argnums=(0, 1) if with_lora else 0)(
            params["visual"], lora)
        return val, grads

    ref_val, ref_grads = run("none")
    for pol in ("attn_res", "attn_all", "full", "dots"):
        val, grads = run(pol)
        np.testing.assert_allclose(np.asarray(val), np.asarray(ref_val),
                                   rtol=1e-6, atol=0, err_msg=pol)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7, err_msg=pol),
            grads, ref_grads)


def test_bf16_policy_runs(params):
    policy = policy_from_prec("fp16")  # maps to bf16 on TPU
    img = jax.random.normal(jax.random.PRNGKey(6), (2, 3, 32, 32))
    bf_params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params["visual"])
    out = vit_encode(bf_params, img, TINY, policy)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()
