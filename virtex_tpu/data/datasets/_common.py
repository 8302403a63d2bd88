r"""Shared loading helpers for the caption-consuming pretext datasets
(captioning / masked LM / token classification): one random caption per
epoch + image augmentation, optionally through the native C++ data-plane."""
from __future__ import annotations

import numpy as np


def image_array(image) -> np.ndarray:
    """Dtype-preserving batch-ready cast: uint8 stays uint8 (device-side
    normalization path), everything else becomes float32."""
    image = np.asarray(image)
    if image.dtype == np.uint8:
        return image
    return image.astype(np.float32)


def make_native_pipeline(use_native, split: str, crop_size: int,
                         emit_uint8: bool = False):
    """Resolve the native-pipeline option shared by the datasets.

    ``None``/False = off (cv2 path is the behavioral reference); ``"auto"``
    = use when the C++ library built; ``True`` = require it.
    """
    if not use_native:
        return None
    from virtex_tpu.data.native_pipeline import (
        NativeCaptionTrainPipeline,
        NativeEvalPipeline,
        native_available,
    )
    if native_available():
        return (NativeCaptionTrainPipeline(crop_size, emit_uint8=emit_uint8)
                if split == "train"
                else NativeEvalPipeline(crop_size, emit_uint8=emit_uint8))
    if use_native is True:
        raise RuntimeError("native data-plane requested but the C++ library "
                           "failed to build")
    return None


def batch_fetch_supported(native_pipeline) -> bool:
    return native_pipeline is not None and hasattr(native_pipeline, "batch")


def load_image_caption_batch(dset, indices, rngs, native_pipeline):
    """Whole-batch counterpart of :func:`load_image_caption`'s native
    branch: ONE OpenMP native call for all pixel work. Each item's RNG
    draw order (caption choice → augmentation params) matches N single
    calls exactly. → list of (image_id, image, caption)."""
    raws = [dset.raw(i) for i in indices]
    captions = [raw["captions"][rng.randint(len(raw["captions"]))]
                for raw, rng in zip(raws, rngs)]
    images, captions = native_pipeline.batch(
        [raw["jpeg"] for raw in raws], captions, rngs)
    return [(raw["image_id"], image, caption)
            for raw, image, caption in zip(raws, images, captions)]


def load_image_caption(dset, idx: int, rng, image_transform,
                       native_pipeline=None):
    """→ (image_id, augmented image HWC float32, transformed caption)."""
    if native_pipeline is not None:
        instance = dset.raw(idx)
        caption = instance["captions"][rng.randint(
            len(instance["captions"]))]
        image, caption = native_pipeline(instance["jpeg"], caption, rng)
        return instance["image_id"], image, caption
    instance = dset[idx]
    captions = instance["captions"]
    # One random caption per epoch (reference captioning.py:60).
    caption = captions[rng.randint(len(captions))]
    image, caption = image_transform(instance["image"], caption, rng)
    return instance["image_id"], image, caption
