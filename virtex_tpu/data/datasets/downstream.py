r"""
Downstream transfer datasets (host side, numpy, NHWC).

Equivalents of reference ``virtex/data/datasets/downstream.py:16-235``:
ImageNet (folder layout), iNaturalist 2018 (json annotations), VOC07
one-vs-all classification labelsets, and an arbitrary image directory for
caption inference. No torchvision dependency — the ImageNet reader walks the
standard ``{split}/{wnid}/*.JPEG`` folder layout directly.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from virtex_tpu.data.datasets._common import image_array

from virtex_tpu.data.readers import read_image_rgb
from virtex_tpu.data.transforms import Compose, default_image_transform


class ImageNetDataset:
    r"""
    ImageNet-1k reader over the canonical folder layout:
    ``data_root/{split}/{wnid}/*.JPEG``. Class indices are assigned by sorted
    wnid order (torchvision-compatible).
    """

    def __init__(
        self,
        data_root: str = "datasets/imagenet",
        split: str = "train",
        image_transform: Optional[Compose] = None,
    ):
        self.image_transform = image_transform or default_image_transform()
        split_dir = os.path.join(data_root, split)
        wnids = sorted(
            d for d in os.listdir(split_dir)
            if os.path.isdir(os.path.join(split_dir, d))
        )
        self.wnid_to_idx = {wnid: i for i, wnid in enumerate(wnids)}
        self.instances: List[Tuple[str, int]] = []
        for wnid in wnids:
            for path in sorted(glob.glob(os.path.join(split_dir, wnid, "*"))):
                self.instances.append((path, self.wnid_to_idx[wnid]))

    def __len__(self) -> int:
        return len(self.instances)

    def __getitem__(self, idx: int, rng=None) -> Dict[str, np.ndarray]:
        path, label = self.instances[idx]
        image = read_image_rgb(path)
        image, _ = self.image_transform(image, None, rng)
        return {
            "image": image_array(image),
            "label": np.asarray(label, dtype=np.int32),
        }

    @staticmethod
    def collate_fn(data: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        return {
            "image": np.stack([d["image"] for d in data]),
            "label": np.stack([d["label"] for d in data]),
        }


class INaturalist2018Dataset:
    r"""iNaturalist 2018: ``annotations/{split}2018.json`` image/category
    pairs (reference ``downstream.py:57-115``)."""

    def __init__(
        self,
        data_root: str = "datasets/inaturalist",
        split: str = "train",
        image_transform: Optional[Compose] = None,
    ):
        self.split = split
        self.image_transform = image_transform or default_image_transform()
        with open(os.path.join(data_root, "annotations", f"{split}2018.json")) as f:
            annotations = json.load(f)
        self.image_id_to_file_path = {
            ann["id"]: os.path.join(data_root, ann["file_name"])
            for ann in annotations["images"]
        }
        self.instances = [
            (ann["image_id"], ann["category_id"])
            for ann in annotations["annotations"]
        ]

    def __len__(self) -> int:
        return len(self.instances)

    def __getitem__(self, idx: int, rng=None) -> Dict[str, np.ndarray]:
        image_id, label = self.instances[idx]
        image = read_image_rgb(self.image_id_to_file_path[image_id])
        image, _ = self.image_transform(image, None, rng)
        return {
            "image": image_array(image),
            "label": np.asarray(label, dtype=np.int32),
        }

    collate_fn = staticmethod(ImageNetDataset.collate_fn)


class VOC07ClassificationDataset:
    r"""
    PASCAL VOC 2007 one-vs-all classification: per image a 20-vector with
    values in {-1, 0, 1} = {negative, ignore, positive} remapped from the raw
    VOC convention (reference ``downstream.py:118-199``).
    """

    # Raw VOC convention → training target:
    #   raw  1 (present)          → +1 positive
    #   raw -1 (absent)           →  0 negative
    #   raw  0 (difficult)        → -1 ignore
    # An image never mentioned by a class listing also lands on -1 ignore.
    _REMAP = {1: 1, -1: 0, 0: -1}

    def __init__(
        self,
        data_root: str = "datasets/VOC2007",
        split: str = "trainval",
        image_transform: Optional[Compose] = None,
    ):
        self.split = split
        self.image_transform = image_transform or default_image_transform()

        # Parse each per-class listing ``<class>_<split>.txt`` into a
        # {image stem: remapped flag} table (behavioral parity with
        # reference ``downstream.py:140-175``, restructured).
        listing_glob = os.path.join(
            data_root, "ImageSets", "Main", f"*_{split}.txt")
        flags_by_class: Dict[str, Dict[str, int]] = {}
        for listing in sorted(glob.glob(listing_glob)):
            cls = os.path.basename(listing).split("_")[0]
            table: Dict[str, int] = {}
            with open(listing) as f:
                for line in f:
                    fields = line.split()
                    if len(fields) == 2:
                        table[fields[0]] = self._REMAP[int(fields[1])]
            flags_by_class[cls] = table
        self.class_names = list(flags_by_class)

        # Image order: first appearance while scanning classes in name order
        # (dict preserves insertion order).
        stems: Dict[str, None] = {}
        for table in flags_by_class.values():
            for stem in table:
                stems.setdefault(stem)

        self.instances: List[Tuple[str, np.ndarray]] = []
        for stem in stems:
            vec = np.asarray(
                [flags_by_class[c].get(stem, -1) for c in self.class_names],
                dtype=np.int32)
            self.instances.append(
                (os.path.join(data_root, "JPEGImages", f"{stem}.jpg"), vec))

    def __len__(self) -> int:
        return len(self.instances)

    def __getitem__(self, idx: int, rng=None) -> Dict[str, np.ndarray]:
        image_path, label = self.instances[idx]
        image = read_image_rgb(image_path)
        image, _ = self.image_transform(image, None, rng)
        return {
            "image": image_array(image),
            "label": np.asarray(label, dtype=np.int32),
        }

    collate_fn = staticmethod(ImageNetDataset.collate_fn)


class ImageDirectoryDataset:
    r"""Reads images from an arbitrary directory, for caption inference
    (reference ``downstream.py:202-235``). ``image_id`` is the filename stem."""

    def __init__(self, data_root: str, image_transform: Optional[Compose] = None):
        self.image_paths = sorted(glob.glob(os.path.join(data_root, "*")))
        self.image_transform = image_transform or default_image_transform()

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, idx: int, rng=None):
        image_path = self.image_paths[idx]
        image_id = os.path.splitext(os.path.basename(image_path))[0]
        image = read_image_rgb(image_path)
        image, _ = self.image_transform(image, None, rng)
        return {"image_id": str(image_id), "image": image_array(image)}

    @staticmethod
    def collate_fn(data):
        return {
            "image_id": [d["image_id"] for d in data],
            "image": np.stack([d["image"] for d in data]),
        }
