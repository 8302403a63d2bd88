"""Downstream dataset tests: VOC07 one-vs-all label remapping, ImageNet
folder reader, iNaturalist json reader."""
import json
import os

import numpy as np
import pytest

from tests.utils_fixtures import make_fake_imagenet, make_fake_voc07
from virtex_tpu.data import (
    ImageNetDataset,
    INaturalist2018Dataset,
    VOC07ClassificationDataset,
)
from virtex_tpu.data.transforms import default_image_transform

T32 = default_image_transform(32, 36)


def test_voc07_labels_remapped(tmp_path):
    root = make_fake_voc07(str(tmp_path / "VOC2007"), n_images=8,
                           n_classes=4)
    ds = VOC07ClassificationDataset(root, "trainval", image_transform=T32)
    assert len(ds) == 8
    assert len(ds.class_names) == 4
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["label"].shape == (4,)
    # fixture writes raw labels cycling [1, -1, -1, 0] by (i + c) % 4:
    # raw 1 → 1 (positive), raw -1 → 0 (negative), raw 0 → -1 (ignore)
    assert set(np.unique(item["label"])) <= {-1, 0, 1}
    labels = np.stack([ds[i]["label"] for i in range(8)])
    assert (labels == 1).any() and (labels == 0).any() and (labels == -1).any()


def test_imagenet_folder_reader(tmp_path):
    root = make_fake_imagenet(str(tmp_path / "imagenet"), n_classes=3,
                              n_per_class=2)
    ds = ImageNetDataset(root, "train", image_transform=T32)
    assert len(ds) == 6
    labels = sorted({int(ds[i]["label"]) for i in range(6)})
    assert labels == [0, 1, 2]  # sorted-wnid class indexing
    assert ds[0]["image"].shape == (32, 32, 3)


def test_inaturalist_reader(tmp_path):
    import cv2
    root = tmp_path / "inaturalist"
    (root / "annotations").mkdir(parents=True)
    (root / "imgs").mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(4):
        fname = f"imgs/{i}.jpg"
        cv2.imwrite(str(root / fname),
                    rng.randint(0, 255, (50, 60, 3), np.uint8))
        images.append({"id": i, "file_name": fname})
        annotations.append({"image_id": i, "category_id": i % 2})
    with open(root / "annotations" / "train2018.json", "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    ds = INaturalist2018Dataset(str(root), "train", image_transform=T32)
    assert len(ds) == 4
    assert int(ds[1]["label"]) == 1
    assert ds[0]["image"].shape == (32, 32, 3)
