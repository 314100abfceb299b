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


class _TSSub:
    pass  # placeholder so the torch import stays inside the tests


def test_torchscript_reader_matches_torch_jit(tmp_path):
    """The pure-numpy torchscript reader must reproduce
    torch.jit.load(...).state_dict() exactly — keys, values, dtypes —
    on a scripted module shaped like the OpenAI archives (params + buffers
    + nested submodules, fp16 and fp32 mixed).  Reference loader being
    replaced: trainers/GLP_OT_SVLoRA.py:23-43."""
    import torch
    import torch.nn as nn

    from fairfedmed_tpu.models.torchscript_reader import load_state_dict

    class Sub(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(4)
            self.proj = nn.Linear(4, 4)
            self.register_buffer("running_mean", torch.zeros(4))

        def forward(self, x):
            return self.proj(self.ln_1(x)) + self.running_mean

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.token_embedding = nn.Embedding(7, 4)
            self.visual = Sub()
            self.logit_scale = nn.Parameter(torch.ones([]) * 2.0)
            # OpenAI checkpoints store most weights in fp16
            self.half_w = nn.Parameter(
                torch.arange(12, dtype=torch.float16).reshape(3, 4))

        def forward(self, x):
            return self.visual(self.token_embedding(x)) * self.logit_scale

    path = str(tmp_path / "m.pt")
    torch.jit.save(torch.jit.script(M()), path)
    ours = load_state_dict(path)
    ref = {k: v.numpy() for k, v in torch.jit.load(path).state_dict().items()}
    assert sorted(ours) == sorted(ref)
    for k in ref:
        np.testing.assert_array_equal(ours[k], ref[k])
        assert ours[k].dtype == ref[k].dtype, k


def test_torchscript_reader_strided_views_and_scalars(tmp_path):
    """Zip-format torch.save: non-contiguous views (offset+stride through a
    shared storage), 0-d scalars, bool/int dtypes all rebuild exactly."""
    import torch

    from fairfedmed_tpu.models.torchscript_reader import load_state_dict

    base = torch.arange(48, dtype=torch.float16).reshape(6, 8)
    sd = {"w": base, "view": base[1:, ::2], "scalar": torch.tensor(2.5),
          "ints": torch.arange(5), "flags": torch.tensor([True, False])}
    path = str(tmp_path / "plain.pt")
    torch.save(sd, path)
    ours = load_state_dict(path)
    assert sorted(ours) == sorted(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(ours[k], v.numpy())
        assert ours[k].dtype == v.numpy().dtype, k


def test_load_torch_state_dict_without_torch(small_cfg, tmp_path,
                                             monkeypatch):
    """A TPU VM without torch must still ingest real (zip-format)
    checkpoints: block `import torch` and convert end-to-end."""
    import sys

    import torch

    sd = make_torch_style_sd(small_cfg, np.random.default_rng(3))
    path = str(tmp_path / "ckpt.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)
    # sys.modules[name] = None makes any `import torch` raise ImportError
    monkeypatch.setitem(sys.modules, "torch", None)
    loaded = load_torch_state_dict(path)
    params, cfg = convert_vit_clip(loaded)
    assert cfg == small_cfg
    np.testing.assert_array_equal(params["visual"]["proj"], sd["visual.proj"])


def test_reader_tolerates_training_metadata(tmp_path, monkeypatch):
    """An ordinary fine-tuned checkpoint carries np scalars / argparse
    namespaces beside the tensors ({'state_dict': ..., 'epoch': 3,
    'best_acc': np.float64}); the torch-free reader must load the tensors
    and drop the metadata, WITHOUT torch (round-5 review finding: the zip
    branch used to raise UnpicklingError on numpy._core.multiarray.scalar
    with no fallback)."""
    import argparse
    import sys

    import torch

    from fairfedmed_tpu.models.converter import load_torch_state_dict

    path = str(tmp_path / "meta.pt")
    torch.save({"state_dict": {"w": torch.arange(6, dtype=torch.float32)
                               .reshape(2, 3), "b": torch.zeros(3)},
                "epoch": 3, "best_acc": np.float64(0.91),
                "args": argparse.Namespace(lr=0.1)}, path)
    monkeypatch.setitem(sys.modules, "torch", None)  # torch-free env
    sd = load_torch_state_dict(path)
    assert sorted(sd) == ["b", "w"]
    np.testing.assert_array_equal(
        sd["w"], np.arange(6, dtype=np.float32).reshape(2, 3))


class _WeirdMeta:
    """Module-level so torch.save can pickle it; NOT on the restricted
    unpickler's allowlist, forcing the torch fallback."""


def test_reader_falls_back_to_torch_on_exotic_pickle(tmp_path, capsys):
    """A wrapper dict holding a class the restricted unpickler rejects must
    fall back to torch (two-stage loader, GLP_OT_SVLoRA.py:23-43) instead of
    failing hard when torch IS available."""
    import torch

    from fairfedmed_tpu.models.converter import load_torch_state_dict

    path = str(tmp_path / "weird.pt")
    torch.save({"state_dict": {"w": torch.ones(2, 2)},
                "meta": _WeirdMeta()}, path)
    sd = load_torch_state_dict(path)
    assert sorted(sd) == ["w"]
    np.testing.assert_array_equal(sd["w"], np.ones((2, 2), np.float32))
    assert "falling back to torch" in capsys.readouterr().out


def test_download_checkpoint_errors(tmp_path):
    with pytest.raises(RuntimeError):
        download_checkpoint("not-a-model")
    assert MODEL_FILES["ViT-B/16"] == "ViT-B-16.pt"


def _rn_shape_sd(layers, width, resolution, embed_dim, t_width, t_layers,
                 context=77, vocab=49408):
    """Minimal RN-shaped state_dict: only the keys/shapes infer_rn_config
    reads (values are zeros — shape inference never looks at values)."""
    sd = {}
    for b, n in enumerate(layers, start=1):
        planes = width * (2 ** (b - 1))
        for i in range(n):
            sd[f"visual.layer{b}.{i}.conv1.weight"] = np.zeros(
                (planes, 1, 1, 1), np.float32)
    spatial = resolution // 32
    sd["visual.attnpool.positional_embedding"] = np.zeros(
        (spatial * spatial + 1, width * 32), np.float32)
    sd["text_projection"] = np.zeros((t_width, embed_dim), np.float32)
    sd["positional_embedding"] = np.zeros((context, t_width), np.float32)
    sd["token_embedding.weight"] = np.zeros((vocab, t_width), np.float32)
    sd["ln_final.weight"] = np.zeros((t_width,), np.float32)
    for i in range(t_layers):
        sd[f"transformer.resblocks.{i}.ln_1.weight"] = np.zeros((t_width,), np.float32)
    return sd


def test_infer_rn_config_rn50x4_shapes():
    """An RN50x4-shaped checkpoint must infer its full architecture from
    shapes (clip/model.py:643-656) — no preset lookup."""
    from fairfedmed_tpu.models.converter import infer_rn_config

    sd = _rn_shape_sd(layers=(4, 6, 10, 6), width=80, resolution=288,
                      embed_dim=640, t_width=640, t_layers=12)
    rn_cfg, clip_cfg = infer_rn_config(sd)
    assert rn_cfg.layers == (4, 6, 10, 6)
    assert rn_cfg.width == 80
    assert rn_cfg.input_resolution == 288
    assert rn_cfg.output_dim == 640
    assert rn_cfg.heads == 80 * 32 // 64
    assert clip_cfg.embed_dim == 640
    assert clip_cfg.transformer_width == 640
    assert clip_cfg.transformer_heads == 10
    assert clip_cfg.transformer_layers == 12


def test_infer_rn_config_roundtrips_synthetic_checkpoint():
    """Full loop: init a tiny non-preset RN variant, export reference-named
    keys, re-infer the config, convert, and compare the forward pass."""
    import jax
    import jax.numpy as jnp
    from fairfedmed_tpu.core.precision import policy_from_prec
    from fairfedmed_tpu.models.converter import infer_rn_config
    from fairfedmed_tpu.models.resnet_clip import (
        ResNetConfig, convert_resnet_visual, init_modified_resnet, resnet_encode,
    )

    cfg = ResNetConfig(layers=(2, 1, 1, 2), output_dim=96, heads=8,
                       input_resolution=64, width=16)
    visual, bn, stats = init_modified_resnet(jax.random.PRNGKey(0), cfg)

    # export with the reference's key naming (clip/model.py ModifiedResNet)
    sd = {}
    stem = visual["stem"]
    for i, name in enumerate(("conv1", "conv2", "conv3"), start=1):
        sd[f"visual.{name}.weight"] = np.asarray(stem[name])
        sd[f"visual.bn{i}.weight"] = np.asarray(bn["stem"][f"bn{i}"]["weight"])
        sd[f"visual.bn{i}.bias"] = np.asarray(bn["stem"][f"bn{i}"]["bias"])
        sd[f"visual.bn{i}.running_mean"] = np.asarray(stats["stem"][f"bn{i}"]["mean"])
        sd[f"visual.bn{i}.running_var"] = np.asarray(stats["stem"][f"bn{i}"]["var"])
    for li, nblocks in enumerate(cfg.layers):
        lname = f"layer{li + 1}"
        for bi in range(nblocks):
            pre = f"visual.{lname}.{bi}"
            blk_p, blk_b, blk_s = (visual[lname][bi], bn[lname][bi], stats[lname][bi])
            for cn in ("conv1", "conv2", "conv3"):
                sd[f"{pre}.{cn}.weight"] = np.asarray(blk_p[cn])
            for bname in blk_b:
                if bname.startswith("bn"):
                    sd[f"{pre}.{bname}.weight"] = np.asarray(blk_b[bname]["weight"])
                    sd[f"{pre}.{bname}.bias"] = np.asarray(blk_b[bname]["bias"])
                    sd[f"{pre}.{bname}.running_mean"] = np.asarray(blk_s[bname]["mean"])
                    sd[f"{pre}.{bname}.running_var"] = np.asarray(blk_s[bname]["var"])
            if "downsample" in blk_p:
                sd[f"{pre}.downsample.0.weight"] = np.asarray(blk_p["downsample"])
                sd[f"{pre}.downsample.1.weight"] = np.asarray(blk_b["downsample_bn"]["weight"])
                sd[f"{pre}.downsample.1.bias"] = np.asarray(blk_b["downsample_bn"]["bias"])
                sd[f"{pre}.downsample.1.running_mean"] = np.asarray(blk_s["downsample_bn"]["mean"])
                sd[f"{pre}.downsample.1.running_var"] = np.asarray(blk_s["downsample_bn"]["var"])
    ap = visual["attnpool"]
    sd["visual.attnpool.positional_embedding"] = np.asarray(ap["positional_embedding"])
    for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
        sd[f"visual.attnpool.{proj}.weight"] = np.asarray(ap[proj]["weight"])
        sd[f"visual.attnpool.{proj}.bias"] = np.asarray(ap[proj]["bias"])
    # text keys only for shape inference (never overwrite visual.* exports)
    sd.update({k: v for k, v in _rn_shape_sd(
        layers=(1,), width=16, resolution=64, embed_dim=cfg.output_dim,
        t_width=64, t_layers=2).items() if not k.startswith("visual.")})

    rn_cfg, _ = infer_rn_config(sd)
    assert rn_cfg == cfg

    visual2, bn2, stats2 = convert_resnet_visual(sd, rn_cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 64, 64)), jnp.float32)
    policy = policy_from_prec("fp32")
    y1, _ = resnet_encode(visual, bn, stats, x, cfg, policy, train=False)
    y2, _ = resnet_encode(visual2, bn2, stats2, x, rn_cfg, policy, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
