r"""
Classification pretraining datasets.

- :class:`TokenClassificationDataset`: treats the (unordered) set of caption
  tokens as a labelset (reference
  ``virtex/data/datasets/classification.py:19-94``).
- :class:`MultiLabelClassificationDataset`: labelsets from COCO instance
  annotations, category ids remapped to a contiguous 1..80 with 0 reserved as
  background/padding; images with no labels are dropped (reference
  ``classification.py:97-189``).
"""
from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from virtex_tpu.data.datasets._common import (
    batch_fetch_supported,
    image_array,
    load_image_caption,
    load_image_caption_batch,
    make_native_pipeline,
)

from virtex_tpu.data.datasets.captioning import pad_stack
from virtex_tpu.data.readers import CocoCaptionsReader, read_image_rgb
from virtex_tpu.data.tokenizers import SentencePieceBPETokenizer
from virtex_tpu.data.transforms import Compose, default_image_transform


class TokenClassificationDataset:
    def __init__(
        self,
        data_root: str,
        split: str,
        tokenizer: SentencePieceBPETokenizer,
        image_transform: Optional[Compose] = None,
        max_caption_length: int = 30,
        use_native=None,
        crop_size: int = 224,
        emit_uint8: bool = False,
    ):
        self._dset = CocoCaptionsReader(data_root, split)
        self.tokenizer = tokenizer
        self.image_transform = image_transform or default_image_transform()
        self.max_caption_length = max_caption_length
        self.native_pipeline = make_native_pipeline(use_native, split,
                                                    crop_size, emit_uint8)

        self.padding_idx = tokenizer.token_to_id("<unk>")
        self.sos_id = tokenizer.token_to_id("[SOS]")
        self.eos_id = tokenizer.token_to_id("[EOS]")
        self.supports_batch_fetch = batch_fetch_supported(
            self.native_pipeline)

    def __len__(self) -> int:
        return len(self._dset)

    def _pack(self, image_id, image, caption) -> Dict[str, np.ndarray]:
        tokens = [self.sos_id, *self.tokenizer.encode(caption), self.eos_id]
        tokens = tokens[: self.max_caption_length]
        return {
            "image_id": np.asarray(image_id, dtype=np.int32),
            "image": image_array(image),
            "labels": np.asarray(tokens, dtype=np.int32),
        }

    def __getitem__(
        self, idx: int, rng: Optional[np.random.RandomState] = None
    ) -> Dict[str, np.ndarray]:
        rng = rng or np.random
        image_id, image, caption = load_image_caption(
            self._dset, idx, rng, self.image_transform, self.native_pipeline)
        return self._pack(image_id, image, caption)

    def get_batch(self, indices, rngs) -> List[Dict[str, np.ndarray]]:
        """Whole-batch fetch through the OpenMP native pipeline."""
        if not self.supports_batch_fetch:
            return [self.__getitem__(i, rng=r)
                    for i, r in zip(indices, rngs)]
        return [self._pack(image_id, image, caption)
                for image_id, image, caption in load_image_caption_batch(
                    self._dset, indices, rngs, self.native_pipeline)]

    def collate_fn(self, data: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        return {
            "image_id": np.stack([d["image_id"] for d in data]),
            "image": np.stack([d["image"] for d in data]),
            "labels": pad_stack(
                [d["labels"] for d in data], self.max_caption_length, self.padding_idx
            ),
        }


class MultiLabelClassificationDataset:
    # Static labelset width for fixed-shape batches: COCO images have at most
    # 80 distinct instance categories.
    MAX_LABELS = 80

    def __init__(
        self,
        data_root: str,
        split: str,
        image_transform: Optional[Compose] = None,
    ):
        self.image_transform = image_transform or default_image_transform()
        self.padding_idx = 0  # slot 0 = background / pad

        with open(
            os.path.join(data_root, "annotations", f"instances_{split}2017.json")
        ) as f:
            coco = json.load(f)

        # COCO category ids are sparse over 1..90; give each a dense slot in
        # 1..80 by position in the annotation file (behavioral parity with
        # reference ``classification.py:118-150``, restructured).
        slot_of: Dict[int, int] = {}
        for cat in coco["categories"]:
            slot_of[cat["id"]] = len(slot_of) + 1

        # Distinct category slots present in each annotated image.
        slots_by_image: Dict[int, set] = {}
        for ann in coco["annotations"]:
            slots_by_image.setdefault(ann["image_id"], set()).add(
                slot_of[ann["category_id"]])

        # One sample per on-disk jpg that carries at least one instance
        # label; unannotated images are dropped.
        self._samples: List[Tuple[int, str, Tuple[int, ...]]] = []
        # sorted: glob order is filesystem-dependent, and dataset index
        # order is a determinism contract (sharding + resumable replay).
        for path in sorted(
                glob.glob(os.path.join(data_root, f"{split}2017", "*.jpg"))):
            image_id = int(os.path.splitext(os.path.basename(path))[0])
            slots = slots_by_image.get(image_id)
            if slots:
                self._samples.append((image_id, path, tuple(sorted(slots))))

    def __len__(self) -> int:
        return len(self._samples)

    def __getitem__(
        self, idx: int, rng: Optional[np.random.RandomState] = None
    ) -> Dict[str, np.ndarray]:
        rng = rng or np.random
        image_id, path, labels = self._samples[idx]
        image = read_image_rgb(path)
        image, _ = self.image_transform(image, None, rng)
        return {
            "image_id": np.asarray(image_id, dtype=np.int32),
            "image": image_array(image),
            "labels": np.asarray(labels, dtype=np.int32),
        }

    def collate_fn(self, data: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        return {
            "image_id": np.stack([d["image_id"] for d in data]),
            "image": np.stack([d["image"] for d in data]),
            "labels": pad_stack(
                [d["labels"] for d in data], self.MAX_LABELS, self.padding_idx
            ),
        }
