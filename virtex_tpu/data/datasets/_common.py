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
