r"""
Captioning pretraining dataset: image-caption (forward and backward) pairs.

Behavioral equivalent of reference ``virtex/data/datasets/captioning.py:13-100``,
restructured TPU-first:

- images stay **HWC** (batches are NHWC — the native TPU conv layout);
- captions are padded to the *static* ``max_caption_length`` at collate time
  (the reference pads to the longest-in-batch, a dynamic shape XLA would
  recompile for);
- every random choice flows through an explicit ``numpy.random.RandomState``.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from virtex_tpu.data.datasets._common import (
    batch_fetch_supported,
    image_array,
    load_image_caption,
    load_image_caption_batch,
    make_native_pipeline,
)

from virtex_tpu.data.readers import CocoCaptionsReader
from virtex_tpu.data.tokenizers import SentencePieceBPETokenizer
from virtex_tpu.data.transforms import Compose, default_image_transform


class CaptioningDataset:
    r"""
    Provides ``image`` (HWC float32), ``caption_tokens``, ``noitpac_tokens``
    (the reversed tokens consumed by the backward decoder of bicaptioning) and
    ``caption_lengths``.

    Args:
        data_root: Path to COCO dataset directory.
        split: "train" or "val".
        tokenizer: Maps caption words to integer ids.
        image_transform: Paired (image, caption) transform pipeline.
        max_caption_length: Tokens beyond this are trimmed from the right.
    """

    def __init__(
        self,
        data_root: str,
        split: str,
        tokenizer: SentencePieceBPETokenizer,
        image_transform: Optional[Compose] = None,
        max_caption_length: int = 30,
        use_native: Optional[bool] = None,
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
        # loader hint: whole-batch fetch pays off only on the OpenMP path
        self.supports_batch_fetch = batch_fetch_supported(
            self.native_pipeline)

    def __len__(self) -> int:
        return len(self._dset)

    def __getitem__(
        self, idx: int, rng: Optional[np.random.RandomState] = None
    ) -> Dict[str, np.ndarray]:
        rng = rng or np.random
        image_id, image, caption = load_image_caption(
            self._dset, idx, rng, self.image_transform, self.native_pipeline)

        tokens = [self.sos_id, *self.tokenizer.encode(caption), self.eos_id]
        tokens = tokens[: self.max_caption_length]
        return self._item(image_id, image, tokens)

    def _item(self, image_id, image, tokens) -> Dict[str, np.ndarray]:
        return {
            "image_id": np.asarray(image_id, dtype=np.int32),
            "image": image_array(image),
            "caption_tokens": np.asarray(tokens, dtype=np.int32),
            "noitpac_tokens": np.asarray(tokens[::-1], dtype=np.int32),
            "caption_lengths": np.asarray(len(tokens), dtype=np.int32),
        }

    def get_batch(self, indices: List[int],
                  rngs: List[np.random.RandomState]
                  ) -> List[Dict[str, np.ndarray]]:
        """Whole-batch fetch: the native pipeline's OpenMP batch call does
        all pixel work in one C++ pass (the loader prefers this hook when
        present). RNG draws match N single ``__getitem__`` calls exactly."""
        if not self.supports_batch_fetch:
            return [self.__getitem__(i, rng=r)
                    for i, r in zip(indices, rngs)]
        items = []
        for image_id, image, caption in load_image_caption_batch(
                self._dset, indices, rngs, self.native_pipeline):
            tokens = [self.sos_id, *self.tokenizer.encode(caption),
                      self.eos_id][: self.max_caption_length]
            items.append(self._item(image_id, image, tokens))
        return items

    def collate_fn(self, data: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        T = self.max_caption_length
        return {
            "image_id": np.stack([d["image_id"] for d in data]),
            "image": np.stack([d["image"] for d in data]),
            "caption_tokens": pad_stack(
                [d["caption_tokens"] for d in data], T, self.padding_idx
            ),
            "noitpac_tokens": pad_stack(
                [d["noitpac_tokens"] for d in data], T, self.padding_idx
            ),
            "caption_lengths": np.stack([d["caption_lengths"] for d in data]),
        }


def pad_stack(seqs: List[np.ndarray], length: int, pad_value: int) -> np.ndarray:
    """Right-pad 1-D int sequences to a fixed static length and stack."""
    out = np.full((len(seqs), length), pad_value, dtype=np.int32)
    for i, s in enumerate(seqs):
        n = min(len(s), length)
        out[i, :n] = s[:n]
    return out
