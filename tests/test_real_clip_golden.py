"""Golden validation of the checkpoint converter against REAL OpenAI CLIP
weights — env-gated: runs only when a real checkpoint is present.

Point ``FFM_CLIP_CKPT`` at a downloaded OpenAI checkpoint (ViT-B/16 or any
RN variant), or drop one into ``~/.cache/clip/`` under its canonical name
(``ViT-B-16.pt`` / ``RN50.pt``); fetch via the SHA256-pinned URLs in
``models/converter.py:MODEL_URLS`` (= reference ``clip/clip.py:29-36``), e.g.

    python -c "from fairfedmed_tpu.models.converter import \
        download_checkpoint; download_checkpoint('ViT-B/16')"

The golden oracle is the REFERENCE MODEL CODE ITSELF: the checkpoint is run
through ``/root/reference/clip/model.py:build_model`` (pure torch, imported by
file path) and through ``models/converter.py`` + the JAX forward, and image
features / text features / CLIP logits are compared.  This catches silent
key-mapping or transpose errors that synthetic-state-dict tests
(tests/test_converter.py) cannot, on any checkpoint, with no hard-coded
fingerprint to go stale.  Reference map: clip/model.py:633-670 (inference
rules), clip/clip.py:39-68 (download table).
"""

import importlib.util
import os

import numpy as np
import pytest

REF_CLIP_MODEL = os.path.join(
    os.environ.get("FFM_REFERENCE", "/root/reference"), "clip", "model.py")


def _find_real_ckpt():
    p = os.environ.get("FFM_CLIP_CKPT")
    if p and os.path.exists(p):
        return p
    from fairfedmed_tpu.models import converter

    for name in ("ViT-B/16", "RN50", "RN101", "RN50x4", "ViT-B/32"):
        p = converter.find_checkpoint(name)
        if p:
            return p
    return None


CKPT = _find_real_ckpt()
pytestmark = pytest.mark.skipif(
    CKPT is None or not os.path.exists(REF_CLIP_MODEL),
    reason="no real OpenAI CLIP checkpoint (set FFM_CLIP_CKPT or place one "
           "under ~/.cache/clip); see module docstring for download recipe")


def _load_ref_model(sd):
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_clip_model",
                                                  REF_CLIP_MODEL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    design = {"trainer": "Golden", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model = mod.build_model(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, design)
    return model.float().eval()


def test_real_checkpoint_matches_reference_forward():
    torch = pytest.importorskip("torch")

    import jax
    import jax.numpy as jnp

    from fairfedmed_tpu.core.precision import policy_from_prec
    from fairfedmed_tpu.models import converter, tokenizer as tk
    from fairfedmed_tpu.models.clip_model import (
        PRESETS, causal_mask, embed_tokens, l2_normalize, text_encode,
        vit_encode,
    )

    sd = converter.load_torch_state_dict(CKPT)
    is_vit = "visual.conv1.weight" in sd and "visual.layer1.0.conv1.weight" not in sd
    policy = policy_from_prec("fp32")
    ref = _load_ref_model(sd)

    # ---- converted structure pinned against the known preset
    if is_vit:
        params, cfg = converter.convert_vit_clip(sd)
        known = {n: c for n, c in PRESETS.items()}
        matches = [n for n, c in known.items() if c == cfg]
        assert matches, f"inferred config {cfg} matches no known preset"
        assert params["visual"]["blocks"]["attn"]["in_proj_weight"].shape == \
            (cfg.vision_layers, 3 * cfg.vision_width, cfg.vision_width)
    else:
        from fairfedmed_tpu.models import resnet_clip

        rn_cfg, cfg = converter.infer_rn_config(sd)
        visual, bn, stats = resnet_clip.convert_resnet_visual(sd, rn_cfg)
        text = converter.convert_text_tower(sd)
    res = cfg.image_resolution

    rng = np.random.default_rng(0)
    image = rng.uniform(0, 1, (4, 3, res, res)).astype(np.float32)
    texts = ["a photo of a cat", "a diagram of glaucoma", "an x-ray"]
    ids = np.asarray(tk.tokenize(texts))

    with torch.no_grad():
        t_img = ref.encode_image(torch.from_numpy(image)).numpy()
        t_txt = ref.encode_text(torch.from_numpy(ids).long()).numpy()
        t_scale = float(ref.logit_scale.exp())

    if is_vit:
        j_img = np.asarray(vit_encode(
            jax.tree_util.tree_map(jnp.asarray, params["visual"]),
            jnp.asarray(image), cfg, policy))
        text_params = {"text": jax.tree_util.tree_map(
            jnp.asarray, params["text"])}
    else:
        feats, _ = resnet_clip.resnet_encode(
            jax.tree_util.tree_map(jnp.asarray, visual),
            jax.tree_util.tree_map(jnp.asarray, bn),
            jax.tree_util.tree_map(jnp.asarray, stats),
            jnp.asarray(image), rn_cfg, policy, train=False)
        j_img = np.asarray(feats)
        text_params = {"text": jax.tree_util.tree_map(
            jnp.asarray, text["text"])}
    emb = embed_tokens(text_params, jnp.asarray(ids))
    j_txt = np.asarray(text_encode(text_params, emb,
                                   jnp.asarray(ids.argmax(-1)), cfg, policy))

    # feature-level agreement: cosine similarity per row (weights are fp16 on
    # disk; both sides compute fp32, so ops-order noise is tiny)
    def row_cos(a, b):
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        return (a * b).sum(-1)

    assert row_cos(t_img, j_img).min() > 0.999, row_cos(t_img, j_img)
    assert row_cos(t_txt, j_txt).min() > 0.999, row_cos(t_txt, j_txt)

    # logits fingerprint: the full CLIP head end to end
    t_logits = t_scale * (t_img / np.linalg.norm(t_img, axis=-1, keepdims=True)) \
        @ (t_txt / np.linalg.norm(t_txt, axis=-1, keepdims=True)).T
    j_logits = t_scale * np.asarray(
        l2_normalize(jnp.asarray(j_img)) @ l2_normalize(jnp.asarray(j_txt)).T)
    np.testing.assert_allclose(j_logits, t_logits, rtol=0, atol=0.05)
    # and the ranking (the quantity AUC depends on) must coincide exactly
    assert (np.argsort(j_logits, axis=-1) == np.argsort(t_logits, axis=-1)).all()


def test_real_checkpoint_cli_loads_it(tmp_path):
    """The CLI path (load_clip_bundle via find_checkpoint) accepts the real
    checkpoint and reports pretrained=True."""
    import shutil

    from fairfedmed_tpu.config import get_cfg_default
    from fairfedmed_tpu.models import converter
    from fairfedmed_tpu.train.clip_common import load_clip_bundle

    sd = converter.load_torch_state_dict(CKPT)
    is_vit = "visual.conv1.weight" in sd and "visual.layer1.0.conv1.weight" not in sd
    name = "ViT-B/16" if is_vit else "RN50"
    root = tmp_path / "data"
    root.mkdir()
    shutil.copy(CKPT, root / converter.MODEL_FILES[name])

    cfg = get_cfg_default()
    cfg.MODEL.BACKBONE.NAME = name
    cfg.MODEL.BACKBONE.PRETRAINED = True
    cfg.DATASET.ROOT = str(root)
    bundle = load_clip_bundle(cfg, "fp32")
    assert bundle.pretrained
    assert bundle.clip_cfg.image_resolution in (224, 288, 384, 448)
