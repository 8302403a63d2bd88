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
    HorizontalFlip,
    IMAGENET_COLOR_MEAN,
    IMAGENET_COLOR_STD,
    _clamped_center_crop,
)


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
    # torchvision fallback: ratio-clamped center crop (same rule as
    # transforms._clamped_center_crop; a non-square region resized to the
    # square output, not the largest square).
    ch, cw = _clamped_center_crop(h, w, ratio)
    return (h - ch) // 2, (w - cw) // 2, ch, cw


class NativeCaptionTrainPipeline:
    """(jpeg_bytes, caption, rng) → (normalized HWC float32, caption).

    Everything — decode, crop, resize, flip, color jitter, normalize — runs
    in ONE native call; only the augmentation *parameters* (crop rect, flip
    bit, jitter factors, op order) are drawn here in numpy, matching the
    semantics of the Python :class:`ColorJitter` (brightness/contrast/
    saturation 0.4, hue 0.1, p=0.8, random op order)."""

    def __init__(self, crop_size: int = 224,
                 scale: Tuple[float, float] = (0.2, 1.0),
                 flip_p: float = 0.5, use_jitter: bool = True,
                 brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.4, hue: float = 0.1,
                 jitter_p: float = 0.8, emit_uint8: bool = False):
        from virtex_tpu import native
        self._native = native
        self.crop_size = crop_size
        self.scale = scale
        self.flip_p = flip_p
        self.use_jitter = use_jitter
        self.b, self.c, self.s, self.h = brightness, contrast, saturation, hue
        self.jitter_p = jitter_p
        # emit_uint8: skip normalization, return [0,255] uint8 pixels — the
        # backbone normalizes on device (DATA.DEVICE_NORMALIZE).
        self.emit_uint8 = emit_uint8
        self._word_swap = HorizontalFlip(p=1.0)

    def _sample_jitter(self, rng) -> Optional[np.ndarray]:
        if not self.use_jitter or rng.uniform() >= self.jitter_p:
            return None
        order = rng.permutation(4)
        return self._native.jitter_params(
            order,
            rng.uniform(1 - self.b, 1 + self.b) if self.b > 0 else 1.0,
            rng.uniform(1 - self.c, 1 + self.c) if self.c > 0 else 1.0,
            rng.uniform(1 - self.s, 1 + self.s) if self.s > 0 else 1.0,
            rng.uniform(-self.h, self.h) if self.h > 0 else 0.0)

    def __call__(self, jpeg: bytes, caption: Optional[str], rng):
        h, w = self._native.jpeg_dims(jpeg)
        crop = sample_random_resized_crop(h, w, rng, self.scale)
        flip = bool(rng.uniform() < self.flip_p)
        jitter = self._sample_jitter(rng)
        if self.emit_uint8:
            img = self._native.decode_transform(
                jpeg, crop, self.crop_size, flip,
                mean=np.zeros(3, np.float32),
                std=np.full(3, 1 / 255.0, np.float32), jitter=jitter)
            img = np.clip(img, 0, 255).astype(np.uint8)
        else:
            img = self._native.decode_transform(
                jpeg, crop, self.crop_size, flip,
                mean=np.asarray(IMAGENET_COLOR_MEAN, np.float32),
                std=np.asarray(IMAGENET_COLOR_STD, np.float32),
                jitter=jitter)
        if flip and caption is not None:
            caption = self._word_swap.swap_words(caption)
        return img, caption

    def batch(self, jpegs, captions, rngs):
        """Whole-batch variant: parameters are drawn per item in EXACTLY the
        same RNG order as ``__call__`` (dims → crop → flip → jitter), so a
        batch call is bit-identical to N single calls with the same RNGs;
        the pixel work then fans over cores in ONE OpenMP native call
        (``vtx_batch_decode_transform_jitter``) with a single GIL release.
        Returns (images (N, S, S, 3), possibly word-swapped captions)."""
        n = len(jpegs)
        rects = np.empty((n, 4), np.int32)
        flips = np.zeros(n, np.int32)
        jitters = np.zeros((n, 9), np.float32)
        out_captions = list(captions)
        for i, (jpeg, rng) in enumerate(zip(jpegs, rngs)):
            h, w = self._native.jpeg_dims(jpeg)
            rects[i] = sample_random_resized_crop(h, w, rng, self.scale)
            flip = bool(rng.uniform() < self.flip_p)
            flips[i] = int(flip)
            jit = self._sample_jitter(rng)
            if jit is not None:
                jitters[i] = jit
            if flip and out_captions[i] is not None:
                out_captions[i] = self._word_swap.swap_words(out_captions[i])
        if self.emit_uint8:
            imgs = self._native.batch_decode_transform(
                jpegs, rects, flips, self.crop_size,
                mean=np.zeros(3, np.float32),
                std=np.full(3, 1 / 255.0, np.float32), jitters=jitters)
            imgs = np.clip(imgs, 0, 255).astype(np.uint8)
        else:
            imgs = self._native.batch_decode_transform(
                jpegs, rects, flips, self.crop_size,
                mean=np.asarray(IMAGENET_COLOR_MEAN, np.float32),
                std=np.asarray(IMAGENET_COLOR_STD, np.float32),
                jitters=jitters)
        return imgs, out_captions


class NativeEvalPipeline:
    """smallest_resize(resize) + center_crop(crop) + normalize, one call."""

    def __init__(self, crop_size: int = 224, resize_size: int = 256,
                 emit_uint8: bool = False):
        from virtex_tpu import native
        self._native = native
        self.crop_size = crop_size
        self.resize_size = resize_size
        self.emit_uint8 = emit_uint8

    def __call__(self, jpeg: bytes, caption: Optional[str], rng=None):
        h, w = self._native.jpeg_dims(jpeg)
        s = int(round(min(h, w) * self.crop_size / self.resize_size))
        y, x = (h - s) // 2, (w - s) // 2
        if self.emit_uint8:
            img = self._native.decode_transform(
                jpeg, (y, x, s, s), self.crop_size, False,
                mean=np.zeros(3, np.float32),
                std=np.full(3, 1 / 255.0, np.float32))
            return np.clip(img, 0, 255).astype(np.uint8), caption
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
