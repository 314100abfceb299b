"""AutoAugment / RandAugment policy bank tests (autoaugment.py, randaugment.py)."""

import numpy as np
import pytest

from fairfedmed_tpu.data import autoaugment as aa


@pytest.fixture
def img():
    return (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8)


@pytest.mark.parametrize("table,n", [
    (aa.IMAGENET_POLICY, 25), (aa.CIFAR10_POLICY, 25), (aa.SVHN_POLICY, 25),
])
def test_policy_tables_well_formed(table, n):
    assert len(table) == n
    for p1, op1, m1, p2, op2, m2 in table:
        assert 0.0 <= p1 <= 1.0 and 0.0 <= p2 <= 1.0
        assert 0 <= m1 <= 9 and 0 <= m2 <= 9
        assert op1 in aa._AA_RANGES and op2 in aa._AA_RANGES


@pytest.mark.parametrize("factory", [
    aa.imagenet_policy, aa.cifar10_policy, aa.svhn_policy,
    lambda s: aa.RandAugment(seed=s), lambda s: aa.RandAugment2(seed=s),
    lambda s: aa.RandAugmentFixMatch(seed=s),
])
def test_policies_preserve_shape_dtype(factory, img):
    pol = factory(0)
    for _ in range(10):
        out = pol(img)
        assert out.shape == img.shape and out.dtype == np.uint8


def test_seeded_reproducibility(img):
    a = aa.RandAugment(seed=42)(img)
    b = aa.RandAugment(seed=42)(img)
    np.testing.assert_array_equal(a, b)


def test_magnitude_mapping():
    # posterize range 8→4 over idx 0..9 (autoaugment.py:186)
    assert aa._aa_mag("posterize", 0) == 8
    assert aa._aa_mag("posterize", 9) == 4
    assert aa._aa_mag("solarize", 0) == 256
    assert abs(aa._aa_mag("rotate", 9) - 30) < 1e-9


def test_grayscale_promoted(img):
    gray = img[:, :, 0]
    out = aa.RandAugment(seed=0)(gray)
    assert out.shape == (32, 32, 3)


def test_build_transform_wires_policies():
    from fairfedmed_tpu.config import get_cfg_default
    from fairfedmed_tpu.data.transforms import build_transform
    cfg = get_cfg_default()
    cfg.DATASET.NAME = "Caltech101"
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.TRANSFORMS = ["random_flip", "randaugment", "normalize"]
    tfm = build_transform(cfg, is_train=True)
    img = (np.random.default_rng(1).random((48, 48, 3)) * 255).astype(np.uint8)
    out = tfm(img)
    assert out.shape == (3, 32, 32) and out.dtype == np.float32
