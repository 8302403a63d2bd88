r"""
Masked language modeling pretraining dataset.

Behavioral equivalent of reference ``virtex/data/datasets/masked_lm.py:15-125``:
BERT-style masking applied per access — sample ``ceil((len-2) * proportion)``
inner positions (never the [SOS]/[EOS] boundary tokens); replace with [MASK]
w.p. ``mask_probability``, a random token w.p. ``replace_probability``, else
keep. Labels equal the original token at masked-with-[MASK] positions and
padding everywhere else.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np

from virtex_tpu.data.datasets._common import (
    batch_fetch_supported,
    image_array,
    load_image_caption,
    load_image_caption_batch,
    make_native_pipeline,
)

from virtex_tpu.data.datasets.captioning import pad_stack
from virtex_tpu.data.readers import CocoCaptionsReader
from virtex_tpu.data.tokenizers import SentencePieceBPETokenizer
from virtex_tpu.data.transforms import Compose, default_image_transform


class MaskedLmDataset:
    def __init__(
        self,
        data_root: str,
        split: str,
        tokenizer: SentencePieceBPETokenizer,
        image_transform: Optional[Compose] = None,
        max_caption_length: int = 30,
        mask_proportion: float = 0.15,
        mask_probability: float = 0.85,
        replace_probability: float = 0.10,
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
        self.mask_id = tokenizer.token_to_id("[MASK]")

        self._vocab_size = tokenizer.get_vocab_size()
        self._mask_proportion = mask_proportion
        self._mask_prob = mask_probability
        self._repl_prob = replace_probability
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
        return self._mask_and_pack(image_id, image, caption, rng)

    def get_batch(self, indices, rngs) -> List[Dict[str, np.ndarray]]:
        """Whole-batch fetch through the OpenMP native pipeline; masking
        RNG draws follow each item's pipeline draws, exactly like N single
        ``__getitem__`` calls."""
        if not self.supports_batch_fetch:
            return [self.__getitem__(i, rng=r)
                    for i, r in zip(indices, rngs)]
        return [self._mask_and_pack(image_id, image, caption, rng)
                for (image_id, image, caption), rng in zip(
                    load_image_caption_batch(self._dset, indices, rngs,
                                             self.native_pipeline), rngs)]

    def _mask_and_pack(
        self, image_id, image, caption, rng
    ) -> Dict[str, np.ndarray]:
        tokens = [self.sos_id, *self.tokenizer.encode(caption), self.eos_id]
        tokens = tokens[: self.max_caption_length]

        masked_labels = [self.padding_idx] * len(tokens)
        n_maskable = max(0, len(tokens) - 2)
        n_to_mask = math.ceil(n_maskable * self._mask_proportion)
        if n_to_mask > 0:
            positions = rng.choice(
                np.arange(1, len(tokens) - 1), size=n_to_mask, replace=False
            )
            for i in positions:
                if n_to_mask == 1:
                    # A single chosen token is always [MASK]ed.
                    masked_labels[i] = tokens[i]
                    tokens[i] = self.mask_id
                else:
                    flag = rng.uniform()
                    if flag <= self._mask_prob + self._repl_prob:
                        if flag <= self._mask_prob:
                            masked_labels[i] = tokens[i]
                            tokens[i] = self.mask_id
                        else:
                            tokens[i] = int(rng.randint(self._vocab_size))

        return {
            "image_id": np.asarray(image_id, dtype=np.int32),
            "image": image_array(image),
            "caption_tokens": np.asarray(tokens, dtype=np.int32),
            "masked_labels": np.asarray(masked_labels, dtype=np.int32),
            "caption_lengths": np.asarray(len(tokens), dtype=np.int32),
        }

    def collate_fn(self, data: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        T = self.max_caption_length
        return {
            "image_id": np.stack([d["image_id"] for d in data]),
            "image": np.stack([d["image"] for d in data]),
            "caption_tokens": pad_stack(
                [d["caption_tokens"] for d in data], T, self.padding_idx
            ),
            "masked_labels": pad_stack(
                [d["masked_labels"] for d in data], T, self.padding_idx
            ),
            "caption_lengths": np.stack([d["caption_lengths"] for d in data]),
        }
