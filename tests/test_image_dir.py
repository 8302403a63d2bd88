"""ImageDirectoryDataset → DataLoader → captioner: the eval_captioning
--data-root path, including string image ids and the non-dropped tail
batch."""
import os

import cv2
import numpy as np

from virtex_tpu.data import ImageDirectoryDataset
from virtex_tpu.data.loader import DataLoader
from virtex_tpu.data.transforms import default_image_transform


def make_dir(tmp_path, n=5):
    d = tmp_path / "imgs"
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        img = rng.randint(0, 255, (60, 80, 3), np.uint8)
        cv2.imwrite(str(d / f"photo_{i}.jpg"), img)
    return str(d)


def test_image_directory_dataset(tmp_path):
    root = make_dir(tmp_path)
    ds = ImageDirectoryDataset(
        root, image_transform=default_image_transform(32, 36))
    assert len(ds) == 5
    item = ds[0]
    assert item["image_id"] == "photo_0"
    assert item["image"].shape == (32, 32, 3)


def test_image_directory_loader_tail_batch(tmp_path):
    root = make_dir(tmp_path)
    ds = ImageDirectoryDataset(
        root, image_transform=default_image_transform(32, 36))
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=0,
                        infinite=False, drop_last=False)
    batches = list(loader)
    assert [len(b["image_id"]) for b in batches] == [2, 2, 1]
    ids = [i for b in batches for i in b["image_id"]]
    assert ids == [f"photo_{i}" for i in range(5)]
    assert batches[0]["image"].shape == (2, 32, 32, 3)
