"""Shared synthetic-data fixtures: a tiny fake COCO tree + trained tokenizer."""
import json
import os

import cv2
import numpy as np

CAPTIONS = [
    "a man riding a wave on top of a surfboard",
    "a cat sitting on the left side of a red couch",
    "two dogs playing with a frisbee in the park",
    "a group of people standing around a kitchen",
    "a plate of food with broccoli and rice on the right",
    "a red bus driving down a city street",
]


def make_fake_coco(root, n_images=8, size=(120, 160), splits=("train", "val"),
                   seed=0):
    """Create a miniature COCO-2017-layout dataset with captions and
    instances annotation files."""
    rng = np.random.RandomState(seed)
    for split in splits:
        img_dir = os.path.join(root, f"{split}2017")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
        images, annotations, inst_annotations = [], [], []
        ann_id = 1
        for i in range(n_images):
            image_id = i + 1
            fname = f"{image_id:012d}.jpg"
            img = rng.randint(0, 255, (*size, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(img_dir, fname), img)
            images.append({"id": image_id, "file_name": fname,
                           "height": size[0], "width": size[1]})
            for j in range(2):  # two captions per image
                annotations.append({
                    "id": ann_id, "image_id": image_id,
                    "caption": CAPTIONS[(i + j) % len(CAPTIONS)],
                })
                ann_id += 1
            inst_annotations.append({
                "id": ann_id, "image_id": image_id,
                "category_id": [1, 18, 90][i % 3], "bbox": [0, 0, 10, 10],
            })
            ann_id += 1
        with open(os.path.join(root, "annotations",
                               f"captions_{split}2017.json"), "w") as f:
            json.dump({"images": images, "annotations": annotations}, f)
        categories = [{"id": c, "name": f"cat{c}"} for c in (1, 18, 90)]
        with open(os.path.join(root, "annotations",
                               f"instances_{split}2017.json"), "w") as f:
            json.dump({"images": images, "annotations": inst_annotations,
                       "categories": categories}, f)
    return root


def make_fake_voc07(root, n_images=10, n_classes=4, size=(100, 120), seed=1):
    """Miniature VOC2007 layout: JPEGImages + ImageSets/Main one-vs-all
    label files for trainval and test splits."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    names = [f"{i:06d}" for i in range(n_images)]
    for name in names:
        img = rng.randint(0, 255, (*size, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(root, "JPEGImages", f"{name}.jpg"), img)
    classes = [f"class{c}" for c in range(n_classes)]
    for split in ("trainval", "test"):
        for c, cls in enumerate(classes):
            with open(os.path.join(root, "ImageSets", "Main",
                                   f"{cls}_{split}.txt"), "w") as f:
                for i, name in enumerate(names):
                    raw = [1, -1, -1, 0][(i + c) % 4]  # present/absent/diff
                    f.write(f"{name} {raw}\n")
    return root


def make_fake_imagenet(root, n_classes=3, n_per_class=4, size=(80, 90),
                       seed=2):
    """Miniature ImageNet folder layout: {split}/{wnid}/*.JPEG."""
    rng = np.random.RandomState(seed)
    for split in ("train", "val"):
        for c in range(n_classes):
            d = os.path.join(root, split, f"n{c:08d}")
            os.makedirs(d, exist_ok=True)
            for i in range(n_per_class):
                img = rng.randint(0, 255, (*size, 3), dtype=np.uint8)
                cv2.imwrite(os.path.join(d, f"img_{i}.JPEG"), img)
    return root


def dummy_stem_sd(c=4, prefix="visual.cnn."):
    """Minimal conv1/bn1 entries satisfying convert_virtex_checkpoint's
    resnet branch when a test only cares about the textual head."""
    return {
        f"{prefix}conv1.weight": np.zeros((c, 3, 7, 7), np.float32),
        f"{prefix}bn1.weight": np.ones(c, np.float32),
        f"{prefix}bn1.bias": np.zeros(c, np.float32),
        f"{prefix}bn1.running_mean": np.zeros(c, np.float32),
        f"{prefix}bn1.running_var": np.ones(c, np.float32),
    }


def make_tokenizer(tmp_path, vocab_size=300):
    from virtex_tpu.data.tokenizers import train_tokenizer
    return train_tokenizer(
        CAPTIONS * 40, str(tmp_path / "tok.model"), vocab_size=vocab_size
    )


LEARNABLE_CLASSES = [
    # (BGR base color, caption) — color determines the caption, so the
    # image→caption mapping is learnable end-to-end. Colors sit far apart
    # so the default color-jitter augmentation cannot cross classes; no
    # left/right words (solid colors are flip-invariant, the paired-flip
    # word swap would inject label noise).
    ((40, 40, 220), "a bright red ball on the table"),
    ((60, 200, 60), "green grass covers the field"),
    ((220, 80, 40), "a deep blue ocean under the sky"),
    ((40, 220, 220), "a yellow taxi waits at the corner"),
    ((200, 60, 200), "purple flowers bloom in the garden"),
    ((210, 210, 60), "a cyan sign hangs above the door"),
]


def make_learnable_coco(root, n_train=240, n_val=48, size=(160, 160),
                        seed=0):
    """COCO-2017-layout dataset whose captions are a deterministic function
    of image color — the end-to-end quality-proxy fixture: a model that
    learns the mapping scores high CIDEr on val through the real
    pretrain → checkpoint → eval_captioning → metrics pipeline."""
    rng = np.random.RandomState(seed)
    for split, n_images in (("train", n_train), ("val", n_val)):
        img_dir = os.path.join(root, f"{split}2017")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
        images, annotations = [], []
        ann_id = 1
        for i in range(n_images):
            image_id = i + 1
            color, caption = LEARNABLE_CLASSES[i % len(LEARNABLE_CLASSES)]
            img = np.full((*size, 3), color, np.uint8)
            noise = rng.randint(-25, 26, img.shape).astype(np.int16)
            img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(
                np.uint8)
            fname = f"{image_id:012d}.jpg"
            cv2.imwrite(os.path.join(img_dir, fname), img)
            images.append({"id": image_id, "file_name": fname,
                           "height": size[0], "width": size[1]})
            annotations.append({"id": ann_id, "image_id": image_id,
                                "caption": caption})
            ann_id += 1
        with open(os.path.join(root, "annotations",
                               f"captions_{split}2017.json"), "w") as f:
            json.dump({"images": images, "annotations": annotations}, f)
    return root
