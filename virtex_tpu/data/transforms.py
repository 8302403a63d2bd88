r"""
Host-side image (and paired caption) transforms in numpy + OpenCV.

The reference composes albumentations transforms plus custom paired
image-caption ops (``virtex/data/transforms.py:5-99``,
``virtex/factories.py:111-173``). Albumentations is not a dependency here;
each transform is re-implemented from its documented behavior as a small
callable ``(image, caption) -> (image, caption)`` over HWC uint8/float32
numpy arrays, with an explicit ``numpy.random.RandomState`` for reproducible,
worker-local RNG (TPU-side determinism is handled separately by JAX PRNG
keys).

Design note: these run on the host feed path only. Normalization is kept
here (cheap, memory-bound) while the heavy conv stack runs on TPU; a native
C++ loader providing the same ops is the planned fast path.
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import cv2
import numpy as np

IMAGENET_COLOR_MEAN = (0.485, 0.456, 0.406)
IMAGENET_COLOR_STD = (0.229, 0.224, 0.225)


class Transform:
    """Base class: callable on (image, caption); caption may be None."""

    def __call__(self, image: np.ndarray, caption: Optional[str] = None,
                 rng: Optional[np.random.RandomState] = None):
        raise NotImplementedError


class Compose(Transform):
    def __init__(self, transforms: List[Transform]):
        self.transforms = transforms

    def __call__(self, image, caption=None, rng=None):
        rng = rng or np.random
        for t in self.transforms:
            image, caption = t(image, caption, rng)
        return image, caption


class RandomResizedSquareCrop(Transform):
    """Random area (scale) + aspect-ratio crop resized to a square, the
    torchvision/albumentations ``RandomResizedCrop`` recipe
    (``transforms.py:40-51``; default scale (0.2, 1.0) per
    ``factories.py:134``)."""

    def __init__(self, size: int, scale: Tuple[float, float] = (0.2, 1.0),
                 ratio: Tuple[float, float] = (0.75, 1.3333333333333333), p: float = 1.0):
        self.size = size
        self.scale = scale
        self.ratio = ratio

    def __call__(self, image, caption=None, rng=None):
        rng = rng or np.random
        h, w = image.shape[:2]
        area = h * w
        for _ in range(10):
            target_area = area * rng.uniform(*self.scale)
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            aspect = math.exp(rng.uniform(*log_ratio))
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                i = rng.randint(0, h - ch + 1)
                j = rng.randint(0, w - cw + 1)
                crop = image[i:i + ch, j:j + cw]
                return _resize(crop, self.size, self.size), caption
        # Fallback after 10 failed samples: the torchvision/albumentations
        # rule — a RATIO-CLAMPED center crop (possibly non-square region,
        # resized to the square output), not the largest square.
        ch, cw = _clamped_center_crop(h, w, self.ratio)
        i, j = (h - ch) // 2, (w - cw) // 2
        return _resize(image[i:i + ch, j:j + cw],
                       self.size, self.size), caption


class CenterSquareCrop(Transform):
    """Center crop to a square of ``size`` (``transforms.py:54-62``).

    Behavioral divergence, by design: an image SMALLER than ``size`` is
    upscaled to the full crop (static output shapes are non-negotiable for
    XLA), where albumentations' CenterCrop raises. COCO/ImageNet images are
    always larger than the 224 crop after the standard smallest-resize(256),
    so the branch only triggers on degenerate inputs; tested in
    test_data.py::test_center_crop_upscales_small_images.
    """

    def __init__(self, size: int, p: float = 1.0):
        self.size = size

    def __call__(self, image, caption=None, rng=None):
        h, w = image.shape[:2]
        ch = min(self.size, h)
        cw = min(self.size, w)
        i, j = (h - ch) // 2, (w - cw) // 2
        out = image[i:i + ch, j:j + cw]
        if out.shape[0] != self.size or out.shape[1] != self.size:
            out = _resize(out, self.size, self.size)
        return out, caption


class SquareResize(Transform):
    """Resize both edges to ``size`` (global_resize; ``transforms.py:65-76``)."""

    def __init__(self, size: int, p: float = 1.0):
        self.size = size

    def __call__(self, image, caption=None, rng=None):
        return _resize(image, self.size, self.size), caption


class SmallestMaxSizeResize(Transform):
    """Resize so the *smallest* edge equals ``size``, keeping aspect ratio
    (albumentations SmallestMaxSize; ``factories.py:137``)."""

    def __init__(self, size: int, p: float = 1.0):
        self.size = size

    def __call__(self, image, caption=None, rng=None):
        h, w = image.shape[:2]
        if h < w:
            nh, nw = self.size, max(1, int(round(w * self.size / h)))
        else:
            nh, nw = max(1, int(round(h * self.size / w))), self.size
        return _resize(image, nw, nh), caption


class HorizontalFlip(Transform):
    """Flip the image horizontally AND swap "left"/"right" words in the
    caption so language stays consistent with pixels
    (``transforms.py:28-37``)."""

    def __init__(self, p: float = 0.5):
        self.p = p

    @staticmethod
    def swap_words(caption: str) -> str:
        # SUBSTRING swap, exactly like the reference (transforms.py:33-36):
        # it hits "left"/"right" anywhere they occur ("left-hand" →
        # "right-hand", but also "bright" → "bleft"). That quirk is part of
        # the published training recipe, so it is reproduced, not fixed.
        return (caption.replace("left", "[TMP]")
                .replace("right", "left")
                .replace("[TMP]", "right"))

    def __call__(self, image, caption=None, rng=None):
        rng = rng or np.random
        if rng.uniform() < self.p:
            image = np.ascontiguousarray(image[:, ::-1])
            if caption is not None:
                caption = self.swap_words(caption)
        return image, caption


class ColorJitter(Transform):
    """Random brightness/contrast/saturation/hue jitter. Hue is kept small
    because captions often mention object colors
    (``factories.py:143-145``: brightness/contrast/saturation 0.4, hue 0.1,
    applied with p=0.8)."""

    def __init__(self, brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.4, hue: float = 0.1, p: float = 0.8):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.p = p

    def __call__(self, image, caption=None, rng=None):
        rng = rng or np.random
        if rng.uniform() >= self.p:
            return image, caption
        img = image.astype(np.float32)
        # Random order of the four jitter ops, like torchvision.
        ops = rng.permutation(4)
        for op in ops:
            if op == 0 and self.brightness > 0:
                f = rng.uniform(1 - self.brightness, 1 + self.brightness)
                img = img * f
            elif op == 1 and self.contrast > 0:
                f = rng.uniform(1 - self.contrast, 1 + self.contrast)
                # torchvision/albumentations blend toward the mean of the
                # GRAYSCALE image (Rec.601), not the all-channel mean.
                mean = float(np.mean(
                    img @ np.array([0.299, 0.587, 0.114], np.float32)))
                img = (img - mean) * f + mean
            elif op == 2 and self.saturation > 0:
                f = rng.uniform(1 - self.saturation, 1 + self.saturation)
                gray = img @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
                img = (img - gray[..., None]) * f + gray[..., None]
            elif op == 3 and self.hue > 0:
                f = rng.uniform(-self.hue, self.hue)
                img = _shift_hue(img, f)
        return np.clip(img, 0, 255).astype(image.dtype), caption


class Normalize(Transform):
    """uint8 [0,255] -> float32, ImageNet mean/std (``transforms.py:85-91``)."""

    def __init__(self, mean=IMAGENET_COLOR_MEAN, std=IMAGENET_COLOR_STD, p: float = 1.0):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, image, caption=None, rng=None):
        img = image.astype(np.float32) / 255.0
        img = (img - self.mean) / self.std
        return img, caption


def _clamped_center_crop(h: int, w: int,
                         ratio: Tuple[float, float]) -> Tuple[int, int]:
    """(crop_h, crop_w) of the torchvision RandomResizedCrop fallback:
    whole image if its aspect is within ``ratio``, else clamped to the
    nearest ratio bound."""
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, min(h, int(round(w / ratio[0])))
    elif in_ratio > ratio[1]:
        ch, cw = h, min(w, int(round(h * ratio[1])))
    else:
        ch, cw = h, w
    return ch, cw


def _resize(image: np.ndarray, w: int, h: int) -> np.ndarray:
    interp = cv2.INTER_AREA if (image.shape[0] > h or image.shape[1] > w) else cv2.INTER_LINEAR
    return cv2.resize(image, (w, h), interpolation=interp)


def _shift_hue(img_f32: np.ndarray, amount: float) -> np.ndarray:
    """Shift hue by ``amount`` (fraction of the full hue circle)."""
    hsv = cv2.cvtColor(np.clip(img_f32, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV)
    hsv = hsv.astype(np.int16)
    hsv[..., 0] = (hsv[..., 0] + int(amount * 180)) % 180
    rgb = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
    return rgb.astype(np.float32)


# The default transform for downstream feature extraction / inference
# (``transforms.py:93-97``): aspect-preserving resize to 256, center crop 224,
# ImageNet normalize.
def default_image_transform(crop_size: int = 224, resize_size: int = 256) -> Compose:
    return Compose([
        SmallestMaxSizeResize(resize_size),
        CenterSquareCrop(crop_size),
        Normalize(),
    ])
