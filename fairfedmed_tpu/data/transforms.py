"""Input transform pipeline (capability match of
Dassl/dassl/data/transforms/transforms.py:15-360).

Transforms are numpy functions over HWC float32 images in [0, 255]; the
pipeline ends with to-CHW + optional normalize, mirroring the reference's
Resize→(augment)→ToTensor→Normalize composition.  Randomness uses the global
numpy RNG.

Medical datasets (FairFedMed / FedChexMimic) bypass host transforms entirely:
their normalisation runs inside the jitted model (as in the reference,
GLP_OT_SVLoRA.py:677-693), and CIFAR's hardcoded normalize+resize runs
on-device in the trainer (see data/datasets/cifar.py docstring).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import cv2
import numpy as np

AVAI_CHOICES = [
    "random_flip", "random_resized_crop", "normalize", "instance_norm",
    "random_crop", "random_translation", "center_crop", "cutout",
    "imagenet_policy", "cifar10_policy", "svhn_policy", "randaugment",
    "randaugment_fixmatch", "randaugment2", "gaussian_noise", "colorjitter",
    "randomgrayscale", "gaussian_blur",
]

INTERP = {"bilinear": cv2.INTER_LINEAR, "nearest": cv2.INTER_NEAREST,
          "bicubic": cv2.INTER_CUBIC}


def _hwc(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[2] not in (1, 3):
        img = img.transpose(1, 2, 0)  # CHW → HWC
    return img.astype(np.float32)


def resize(img, size, interpolation="bilinear"):
    h, w = (size, size) if isinstance(size, int) else size
    out = cv2.resize(img, (int(w), int(h)), interpolation=INTERP[interpolation])
    return out if out.ndim == 3 else out[:, :, None]


def resize_short_edge(img, s, interpolation="bilinear"):
    """torchvision Resize(int) semantics: the SHORTER edge becomes ``s``,
    aspect ratio preserved; the long edge TRUNCATES like torchvision's
    ``int(size * long / short)`` (not round)."""
    h, w = img.shape[:2]
    if h <= w:
        nh, nw = s, max(1, int(w * s / h))
    else:
        nh, nw = max(1, int(h * s / w)), s
    return resize(img, (nh, nw), interpolation)


def random_flip(img):
    return img[:, ::-1] if np.random.rand() < 0.5 else img


def random_crop(img, size, padding=4):
    h, w = (size, size) if isinstance(size, int) else size
    img = np.pad(img, ((padding, padding), (padding, padding), (0, 0)), mode="constant")
    top = np.random.randint(0, img.shape[0] - h + 1)
    left = np.random.randint(0, img.shape[1] - w + 1)
    return img[top : top + h, left : left + w]


def center_crop(img, size):
    h, w = (size, size) if isinstance(size, int) else size
    # round-half offsets like torchvision F.center_crop
    # (int(round((H - h) / 2.0))), not floor — differs by one pixel when
    # the margin is odd
    top = max(int(round((img.shape[0] - h) / 2.0)), 0)
    left = max(int(round((img.shape[1] - w) / 2.0)), 0)
    return img[top : top + h, left : left + w]


def random_resized_crop(img, size, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                        interpolation="bilinear"):
    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target_area = area * np.random.uniform(*scale)
        aspect = np.exp(np.random.uniform(np.log(ratio[0]), np.log(ratio[1])))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            top = np.random.randint(0, h - ch + 1)
            left = np.random.randint(0, w - cw + 1)
            crop = img[top : top + ch, left : left + cw]
            return resize(crop, size, interpolation)
    # torchvision fallback: clamp to the nearest allowed aspect ratio while
    # keeping as much of the image as possible (NOT a square min(h,w) crop,
    # which would discard content torchvision keeps on extreme panoramas)
    in_ratio = w / h
    if in_ratio < min(ratio):
        cw, ch = w, int(round(w / min(ratio)))
    elif in_ratio > max(ratio):
        cw, ch = int(round(h * max(ratio))), h
    else:
        cw, ch = w, h
    top, left = (h - ch) // 2, (w - cw) // 2
    return resize(img[top : top + ch, left : left + cw], size, interpolation)


def random_translation(img, size, interpolation="bilinear", p=0.5):
    """Random2DTranslation (transforms.py:43-91): with prob 1-p just resize
    to ``size``; else resize to 1.125x and random-crop back — content is
    never discarded and no blank borders are produced (the previous
    zero-fill pixel shift was a different augmentation)."""
    h, w = (size, size) if isinstance(size, int) else size
    if np.random.uniform(0, 1) > p:
        return resize(img, (h, w), interpolation)
    nh, nw = int(round(h * 1.125)), int(round(w * 1.125))
    out = resize(img, (nh, nw), interpolation)
    x1 = int(round(np.random.uniform(0, nw - w)))
    y1 = int(round(np.random.uniform(0, nh - h)))
    return out[y1 : y1 + h, x1 : x1 + w]


def cutout(img, n_holes=1, length=16):
    h, w = img.shape[:2]
    out = img.copy()
    for _ in range(n_holes):
        y = np.random.randint(h)
        x = np.random.randint(w)
        y1, y2 = np.clip([y - length // 2, y + length // 2], 0, h)
        x1, x2 = np.clip([x - length // 2, x + length // 2], 0, w)
        out[y1:y2, x1:x2] = 0.0
    return out


def gaussian_noise(img, mean=0.0, std=0.15, p=0.5):
    """GaussianNoise (transforms.py:161-173): applied with prob ``p`` AFTER
    normalization, so ``std`` is in normalized units.  (It previously ran
    unconditionally pre-normalize with std*255 — ~4x the reference strength
    on 100% of images.)  The caller appends this after the final stage."""
    if np.random.uniform(0, 1) > p:
        return img
    return img + (np.random.standard_normal(img.shape).astype(np.float32)
                  * std + mean)


def _grayscale(img):
    return (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])


def colorjitter(img, brightness=0.4, contrast=0.4, saturation=0.4, hue=0.0):
    """torchvision ColorJitter semantics: the four adjustments run in RANDOM
    order, each with a factor drawn from [max(0, 1-x), 1+x] (hue from
    [-hue, hue]); contrast blends toward the GRAYSCALE mean (not the
    all-channel mean) and hue shifts the HSV hue channel."""
    ops = []
    if brightness:
        f = np.random.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(lambda x: x * f)
    if contrast:
        f_c = np.random.uniform(max(0.0, 1 - contrast), 1 + contrast)
        ops.append(lambda x: _grayscale(x).mean() * (1 - f_c) + x * f_c)
    if saturation:
        f_s = np.random.uniform(max(0.0, 1 - saturation), 1 + saturation)
        ops.append(lambda x: _grayscale(x)[..., None] * (1 - f_s) + x * f_s)
    if hue:
        f_h = np.random.uniform(-hue, hue)

        def _hue(x):
            hsv = cv2.cvtColor(np.clip(x, 0, 255).astype(np.uint8),
                               cv2.COLOR_RGB2HSV).astype(np.float32)
            hsv[..., 0] = (hsv[..., 0] + f_h * 180.0) % 180.0  # cv2 H in [0,180)
            return cv2.cvtColor(hsv.astype(np.uint8),
                                cv2.COLOR_HSV2RGB).astype(np.float32)

        ops.append(_hue)
    out = img
    for i in np.random.permutation(len(ops)):
        # PIL's enhance ops saturate at [0,255] per OP (uint8 images), so
        # later stages must compose from the clamped value — an end-only
        # clip lets a brightened 350 feed the contrast blend where the
        # reference computes from 255.  Float precision is kept (no per-op
        # uint8 rounding; the hue op quantizes internally via cv2 HSV).
        out = np.clip(ops[int(i)](out), 0, 255)
    return out


def randomgrayscale(img, p=0.1):
    if np.random.rand() < p:
        return np.repeat(_grayscale(img)[..., None], img.shape[-1], axis=-1)
    return img


def gaussian_blur(img, k=21, p=0.5):
    if np.random.rand() < p:
        sigma = np.random.uniform(0.1, 2.0)
        return cv2.GaussianBlur(img, (k, k), sigma).reshape(img.shape)
    return img


def instance_norm(img, eps=1e-8):
    mean = img.mean((0, 1), keepdims=True)
    std = img.std((0, 1), keepdims=True)
    return (img - mean) / (std + eps)


class Compose:
    def __init__(self, fns: Sequence[Callable]):
        self.fns = list(fns)

    def __call__(self, img):
        img = _hwc(img)
        for fn in self.fns:
            img = fn(img)
        return img


def _final(cfg, img_chw_float01: bool = True):
    mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
    std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32)
    do_norm = "normalize" in cfg.INPUT.TRANSFORMS

    def fn(img):
        img = img.astype(np.float32) / 255.0
        if do_norm:
            img = (img - mean.reshape(1, 1, -1)) / std.reshape(1, 1, -1)
        return img.transpose(2, 0, 1)  # HWC → CHW

    return fn


def _u8(policy):
    """Policies expect/return uint8 HWC; keep float inputs safe."""
    def fn(img):
        return policy(np.clip(img, 0, 255).astype(np.uint8)).astype(np.float32)
    return fn


MEDICAL_DATASETS = {"FairFedMed", "FedChexMimic", "WangGrant"}
IN_MEMORY_DATASETS = {"Cifar10", "Cifar100"}


def build_transform(cfg, is_train: bool = True) -> Optional[Callable]:
    """Compose the configured transforms (transforms.py:176-360).

    Returns None for medical / in-memory datasets whose preprocessing runs
    on-device (see module docstring).
    """
    if cfg.INPUT.NO_TRANSFORM or cfg.DATASET.NAME in MEDICAL_DATASETS | IN_MEMORY_DATASETS:
        return None

    size = cfg.INPUT.SIZE if not isinstance(cfg.INPUT.SIZE, str) else (224, 224)
    choices = list(cfg.INPUT.TRANSFORMS)
    interp = cfg.INPUT.INTERPOLATION
    fns: List[Callable] = []

    if is_train:
        # resize only when NO crop op will produce the target size itself
        # (transforms.py:220-226's conditions list): with random_crop the
        # crop must operate on the ORIGINAL-size image, not a pre-warped one
        if "random_crop" not in choices and "random_resized_crop" not in choices:
            fns.append(lambda x: resize(x, size, interp))
        if "random_translation" in choices:
            fns.append(lambda x: random_translation(x, size, interp))
        if "random_crop" in choices:
            fns.append(lambda x: random_crop(x, size, cfg.INPUT.CROP_PADDING))
        if "random_resized_crop" in choices:
            fns.append(lambda x: random_resized_crop(x, size, scale=tuple(cfg.INPUT.RRCROP_SCALE), interpolation=interp))
        if "random_flip" in choices:
            fns.append(random_flip)
        # AutoAugment / RandAugment policy banks (transforms.py:203-225 wiring)
        if "imagenet_policy" in choices or "cifar10_policy" in choices \
                or "svhn_policy" in choices or "randaugment" in choices \
                or "randaugment_fixmatch" in choices or "randaugment2" in choices:
            from . import autoaugment as aa
            if "imagenet_policy" in choices:
                fns.append(_u8(aa.imagenet_policy()))
            if "cifar10_policy" in choices:
                fns.append(_u8(aa.cifar10_policy()))
            if "svhn_policy" in choices:
                fns.append(_u8(aa.svhn_policy()))
            if "randaugment" in choices:
                fns.append(_u8(aa.RandAugment(cfg.INPUT.RANDAUGMENT_N,
                                              cfg.INPUT.RANDAUGMENT_M)))
            if "randaugment_fixmatch" in choices:
                fns.append(_u8(aa.RandAugmentFixMatch(cfg.INPUT.RANDAUGMENT_N)))
            if "randaugment2" in choices:
                fns.append(_u8(aa.RandAugment2(cfg.INPUT.RANDAUGMENT_N)))
        if "colorjitter" in choices:
            fns.append(lambda x: colorjitter(x, cfg.INPUT.COLORJITTER_B, cfg.INPUT.COLORJITTER_C,
                                             cfg.INPUT.COLORJITTER_S, cfg.INPUT.COLORJITTER_H))
        if "randomgrayscale" in choices:
            fns.append(lambda x: randomgrayscale(x, cfg.INPUT.RGS_P))
        if "gaussian_blur" in choices:
            fns.append(lambda x: gaussian_blur(x, cfg.INPUT.GB_K, cfg.INPUT.GB_P))
        # cutout writes 0 pre-normalize: 0/255 == 0 in [0,1], equivalent to
        # the reference's post-ToTensor placement
        if "cutout" in choices:
            fns.append(lambda x: cutout(x, cfg.INPUT.CUTOUT_N, cfg.INPUT.CUTOUT_LEN))
        fns.append(_final(cfg))
        # gaussian noise rides AFTER normalize (std in normalized units, p=.5)
        if "gaussian_noise" in choices:
            fns.append(lambda x: gaussian_noise(x, cfg.INPUT.GN_MEAN, cfg.INPUT.GN_STD))
    else:
        # test pipeline (transforms.py:330-344): short-edge resize preserving
        # aspect ratio + UNCONDITIONAL center crop — warping straight to
        # (h, w) would distort every non-square source
        fns.append(lambda x: resize_short_edge(x, max(size) if not isinstance(size, int) else size, interp))
        fns.append(lambda x: center_crop(x, size))
        fns.append(_final(cfg))

    if "instance_norm" in choices:
        fns.append(lambda x: instance_norm(x.transpose(1, 2, 0)).transpose(2, 0, 1))
    return Compose(fns)
