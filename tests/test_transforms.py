"""Host transform pipeline vs the reference semantics
(Dassl/dassl/data/transforms/transforms.py).  torchvision is absent from the
env, so geometry/distribution properties are asserted directly."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from fairfedmed_tpu.config import get_cfg_default
from fairfedmed_tpu.data import transforms as T


def _cfg(**input_overrides):
    cfg = get_cfg_default()
    cfg.DATASET.NAME = "DomainNet"
    cfg.INPUT.SIZE = (224, 224)
    for k, v in input_overrides.items():
        setattr(cfg.INPUT, k, v)
    return cfg


def test_test_pipeline_short_edge_resize_center_crop():
    """Reference test path (transforms.py:330-344): resize the SHORTER edge
    to max(size) preserving aspect, then center crop — never warp straight
    to (h, w)."""
    cfg = _cfg(TRANSFORMS=("normalize",))
    tfm = T.build_transform(cfg, is_train=False)
    # a 300x600 image with a vertical stripe at the horizontal center: after
    # aspect-preserving resize + center crop the stripe must stay centered
    # and keep its ~width/height proportions; plain warping would halve its
    # aspect ratio
    img = np.zeros((300, 600, 3), np.float32)
    img[:, 290:310] = 255.0
    out = tfm(img)  # CHW normalized
    assert out.shape == (3, 224, 224)
    # recover the unnormalized mask: stripe columns are bright
    col_mass = out[0].mean(0)
    bright = np.where(col_mass > col_mass.mean())[0]
    # stripe center stays at the crop center
    assert abs(bright.mean() - 112) < 3
    # stripe width scales by 224/300 (short-edge factor), NOT 224/600 (warp)
    assert 10 <= len(bright) <= 20, len(bright)


def test_random_translation_no_blank_borders():
    """Random2DTranslation resizes to 1.125x then random-crops back; the old
    zero-fill pixel shift produced black borders the reference never does."""
    np.random.seed(3)
    img = np.full((100, 100, 3), 200.0, np.float32)
    for _ in range(20):  # covers both the p and 1-p branches
        out = T.random_translation(img, (64, 64))
        assert out.shape == (64, 64, 3)
        assert out.min() > 150.0  # no vacated zero regions


def test_gaussian_noise_post_normalize_units_and_gating():
    np.random.seed(0)
    img = np.zeros((3, 8, 8), np.float32)
    outs = [T.gaussian_noise(img, std=0.15) for _ in range(200)]
    changed = [o for o in outs if np.abs(o).max() > 0]
    # p=0.5 gating
    assert 60 < len(changed) < 140, len(changed)
    # std in NORMALIZED units (~0.15), not 0.15*255
    stds = np.array([o.std() for o in changed])
    assert 0.1 < stds.mean() < 0.2


def test_colorjitter_hue_applied():
    np.random.seed(1)
    img = np.zeros((8, 8, 3), np.float32)
    img[..., 0] = 200.0  # pure red
    moved = False
    for _ in range(10):
        out = T.colorjitter(img, brightness=0, contrast=0, saturation=0, hue=0.4)
        if out[..., 1].mean() > 10 or out[..., 2].mean() > 10:
            moved = True  # hue rotation moved energy off the red channel
    assert moved


def test_train_resize_skipped_with_random_crop():
    """With random_crop configured the reference crops the ORIGINAL-size
    image (resize is added only when no crop op is present)."""
    cfg = _cfg(TRANSFORMS=("random_crop", "normalize"), CROP_PADDING=4)
    tfm = T.build_transform(cfg, is_train=True)
    np.random.seed(0)
    # 256x256 source: padded to 264, cropped to 224 — a true sub-window, so
    # two draws must usually differ (a pre-warp to 224 would make the crop
    # deterministic up to padding)
    img = np.random.uniform(0, 255, (256, 256, 3)).astype(np.float32)
    a, b = tfm(img), tfm(img)
    assert a.shape == (3, 224, 224)
    assert not np.allclose(a, b)
