r"""
Native (C++) image pipelines: fused decode → crop → resize → flip, with the
remaining cheap augmentations (color jitter on the 224² crop, normalize) in
numpy.

Semantics mirror the Python transform stack exactly
(``virtex_tpu/data/transforms.py``, reference ``factories.py:111-173``):

- train: random_resized_crop(scale 0.2–1.0, ratio ¾–4⁄3) + horizontal_flip
  (p 0.5, swapping left/right words in the caption) + color_jitter(p 0.8) +
  ImageNet normalize;
- eval: smallest_resize(256) + center_crop(224) + normalize, fused into a
  single native call (the two-step resize+crop collapses to cropping a
  centred region of ``min(h,w)·crop/resize`` pixels).

Random *parameters* are drawn host-side from the worker's numpy RandomState
(deterministic, testable); only the pixel work crosses into C++.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from virtex_tpu.data.transforms import (
    ColorJitter,
    HorizontalFlip,
    IMAGENET_COLOR_MEAN,
    IMAGENET_COLOR_STD,
    Normalize,
)

_RAW_MEAN = np.zeros(3, np.float32)
_RAW_STD = np.full(3, 1.0 / 255.0, np.float32)  # output in [0, 255] floats


def sample_random_resized_crop(h: int, w: int, rng,
                               scale: Tuple[float, float] = (0.2, 1.0),
                               ratio: Tuple[float, float] = (0.75, 4.0 / 3.0)
                               ) -> Tuple[int, int, int, int]:
    """(y, x, ch, cw) with the torchvision RandomResizedCrop recipe."""
    area = h * w
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            y = rng.randint(0, h - ch + 1)
            x = rng.randint(0, w - cw + 1)
            return y, x, ch, cw
    s = min(h, w)
    return (h - s) // 2, (w - s) // 2, s, s


class NativeCaptionTrainPipeline:
    """(jpeg_bytes, caption, rng) → (normalized HWC float32, caption)."""

    def __init__(self, crop_size: int = 224,
                 scale: Tuple[float, float] = (0.2, 1.0),
                 flip_p: float = 0.5, use_jitter: bool = True):
        from virtex_tpu import native
        self._native = native
        self.crop_size = crop_size
        self.scale = scale
        self.flip_p = flip_p
        self.jitter = ColorJitter() if use_jitter else None
        self.normalize = Normalize()
        self._word_swap = HorizontalFlip(p=1.0)

    def __call__(self, jpeg: bytes, caption: Optional[str], rng):
        h, w = self._native.jpeg_dims(jpeg)
        crop = sample_random_resized_crop(h, w, rng, self.scale)
        flip = bool(rng.uniform() < self.flip_p)
        img = self._native.decode_transform(
            jpeg, crop, self.crop_size, flip, mean=_RAW_MEAN, std=_RAW_STD)
        img = np.clip(img, 0, 255).astype(np.uint8)
        if flip and caption is not None:
            caption = self._word_swap.swap_words(caption)
        if self.jitter is not None:
            img, caption = self.jitter(img, caption, rng)
        img, caption = self.normalize(img, caption)
        return img, caption


class NativeEvalPipeline:
    """smallest_resize(resize) + center_crop(crop) + normalize, one call."""

    def __init__(self, crop_size: int = 224, resize_size: int = 256):
        from virtex_tpu import native
        self._native = native
        self.crop_size = crop_size
        self.resize_size = resize_size

    def __call__(self, jpeg: bytes, caption: Optional[str], rng=None):
        h, w = self._native.jpeg_dims(jpeg)
        s = int(round(min(h, w) * self.crop_size / self.resize_size))
        y, x = (h - s) // 2, (w - s) // 2
        img = self._native.decode_transform(
            jpeg, (y, x, s, s), self.crop_size, False,
            mean=np.asarray(IMAGENET_COLOR_MEAN, np.float32),
            std=np.asarray(IMAGENET_COLOR_STD, np.float32))
        return img, caption


def native_available() -> bool:
    try:
        from virtex_tpu import native
        return native.available()
    except Exception:
        return False
