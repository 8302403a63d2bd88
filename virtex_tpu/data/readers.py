r"""
Raw dataset readers (host side). Keep all annotations in memory; decode
images lazily per access.

Equivalent of reference ``virtex/data/datasets/coco_captions.py:11-63``.
"""
from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Tuple

import cv2

from virtex_tpu.data.tokenizers import preprocess_caption


class CocoCaptionsReader:
    r"""
    Reads a COCO Captions annotation file and provides
    ``(image_id, image HWC-RGB uint8, captions)`` instances, completely
    unprocessed except caption lowercasing + NFKD accent stripping
    (reference ``coco_captions.py:33-37``).

    Args:
        data_root: COCO dataset root (contains ``{split}2017/`` and
            ``annotations/captions_{split}2017.json``).
        split: One of ``{"train", "val"}``.
    """

    def __init__(self, data_root: str, split: str):
        image_dir = os.path.join(data_root, f"{split}2017")
        with open(
            os.path.join(data_root, "annotations", f"captions_{split}2017.json")
        ) as f:
            captions = json.load(f)

        captions_per_image: Dict[int, List[str]] = defaultdict(list)
        for ann in captions["annotations"]:
            captions_per_image[ann["image_id"]].append(
                preprocess_caption(ann["caption"])
            )

        image_filepaths: Dict[int, str] = {
            im["id"]: os.path.join(image_dir, im["file_name"])
            for im in captions["images"]
        }
        # (image_id, file_path, list[captions]) kept in memory.
        self.instances: List[Tuple[int, str, List[str]]] = [
            (im_id, image_filepaths[im_id], caps)
            for im_id, caps in captions_per_image.items()
        ]

    def __len__(self) -> int:
        return len(self.instances)

    def __getitem__(self, idx: int):
        image_id, image_path, captions = self.instances[idx]
        image = read_image_rgb(image_path)
        return {"image_id": image_id, "image": image, "captions": captions}

    def raw(self, idx: int):
        """Undecoded bytes for the native (C++) data-plane fast path."""
        image_id, image_path, captions = self.instances[idx]
        with open(image_path, "rb") as f:
            data = f.read()
        return {"image_id": image_id, "jpeg": data, "captions": captions}


def read_image_rgb(path: str):
    """cv2 decode + BGR->RGB; grayscale images get 3 channels."""
    image = cv2.imread(path, cv2.IMREAD_COLOR)
    if image is None:
        raise FileNotFoundError(f"Could not read image: {path}")
    return cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
