"""OpenAI-checkpoint converter (models/converter.py vs clip/model.py:633-670
inference rules)."""

import numpy as np
import pytest

from fairfedmed_tpu.models.clip_model import CLIPConfig
from fairfedmed_tpu.models.converter import (
    MODEL_FILES, convert_text_tower, convert_vit_clip, download_checkpoint,
    infer_config, load_torch_state_dict,
)


def make_torch_style_sd(cfg: CLIPConfig, rng):
    """Synthetic state_dict with the reference's exact key naming."""
    sd = {}
    vw, tw = cfg.vision_width, cfg.transformer_width
    p = cfg.vision_patch_size
    n_tok = cfg.grid_size ** 2 + 1
    r = lambda *s: rng.standard_normal(s).astype(np.float32)
    sd["visual.class_embedding"] = r(vw)
    sd["visual.positional_embedding"] = r(n_tok, vw)
    sd["visual.conv1.weight"] = r(vw, 3, p, p)
    sd["visual.ln_pre.weight"] = r(vw)
    sd["visual.ln_pre.bias"] = r(vw)
    sd["visual.ln_post.weight"] = r(vw)
    sd["visual.ln_post.bias"] = r(vw)
    sd["visual.proj"] = r(vw, cfg.embed_dim)
    for tower, width, layers in (("visual.transformer", vw, cfg.vision_layers),
                                 ("transformer", tw, cfg.transformer_layers)):
        for i in range(layers):
            pre = f"{tower}.resblocks.{i}"
            sd[f"{pre}.ln_1.weight"] = r(width)
            sd[f"{pre}.ln_1.bias"] = r(width)
            sd[f"{pre}.ln_2.weight"] = r(width)
            sd[f"{pre}.ln_2.bias"] = r(width)
            sd[f"{pre}.attn.in_proj_weight"] = r(3 * width, width)
            sd[f"{pre}.attn.in_proj_bias"] = r(3 * width)
            sd[f"{pre}.attn.out_proj.weight"] = r(width, width)
            sd[f"{pre}.attn.out_proj.bias"] = r(width)
            sd[f"{pre}.mlp.c_fc.weight"] = r(4 * width, width)
            sd[f"{pre}.mlp.c_fc.bias"] = r(4 * width)
            sd[f"{pre}.mlp.c_proj.weight"] = r(width, 4 * width)
            sd[f"{pre}.mlp.c_proj.bias"] = r(width)
    sd["token_embedding.weight"] = r(cfg.vocab_size, tw)
    sd["positional_embedding"] = r(cfg.context_length, tw)
    sd["ln_final.weight"] = r(tw)
    sd["ln_final.bias"] = r(tw)
    sd["text_projection"] = r(tw, cfg.embed_dim)
    sd["logit_scale"] = np.float32(2.6593)
    return sd


@pytest.fixture(scope="module")
def small_cfg():
    # widths of 64 so the reference's heads = width//64 rule
    # (clip/model.py:650) yields a valid head count
    return CLIPConfig(embed_dim=16, image_resolution=32, vision_layers=2,
                      vision_width=64, vision_patch_size=16, context_length=77,
                      vocab_size=100, transformer_width=64,
                      transformer_heads=1, transformer_layers=2)


def test_infer_config(small_cfg):
    sd = make_torch_style_sd(small_cfg, np.random.default_rng(0))
    got = infer_config(sd)
    assert got == small_cfg


def test_convert_vit_roundtrip(small_cfg):
    rng = np.random.default_rng(0)
    sd = make_torch_style_sd(small_cfg, rng)
    params, cfg = convert_vit_clip(sd)
    assert cfg == small_cfg
    # spot-check a few mapped tensors incl. the stacked block layout
    np.testing.assert_array_equal(params["visual"]["proj"], sd["visual.proj"])
    np.testing.assert_array_equal(
        params["visual"]["blocks"]["attn"]["in_proj_weight"][1],
        sd["visual.transformer.resblocks.1.attn.in_proj_weight"])
    np.testing.assert_array_equal(
        params["text"]["blocks"]["mlp"]["c_proj"]["weight"][0],
        sd["transformer.resblocks.0.mlp.c_proj.weight"])
    # converted params run through the functional model
    import jax, jax.numpy as jnp
    from fairfedmed_tpu.core.precision import policy_from_prec
    from fairfedmed_tpu.models.clip_model import text_encode, vit_encode

    policy = policy_from_prec("fp32")
    tree = jax.tree.map(jnp.asarray, params)
    img = jnp.zeros((2, 3, 32, 32), jnp.float32)
    out = vit_encode(tree["visual"], img, cfg, policy)
    assert out.shape == (2, 16)
    emb = jnp.zeros((3, 77, 64), jnp.float32)
    eot = jnp.full((3,), 5, jnp.int32)
    txt = text_encode(tree, emb, eot, cfg, policy)
    assert txt.shape == (3, 16)


def test_convert_text_tower(small_cfg):
    sd = make_torch_style_sd(small_cfg, np.random.default_rng(1))
    tree = convert_text_tower(sd)
    assert tree["text"]["token_embedding"].shape == (100, 64)
    assert tree["text"]["blocks"]["ln_1"]["weight"].shape == (2, 64)


def test_load_torch_state_dict(small_cfg, tmp_path):
    import torch

    sd = make_torch_style_sd(small_cfg, np.random.default_rng(2))
    path = str(tmp_path / "ckpt.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
    loaded = load_torch_state_dict(path)
    np.testing.assert_array_equal(loaded["visual.proj"], sd["visual.proj"])


def test_download_checkpoint_errors(tmp_path):
    with pytest.raises(RuntimeError):
        download_checkpoint("not-a-model")
    assert MODEL_FILES["ViT-B/16"] == "ViT-B-16.pt"
