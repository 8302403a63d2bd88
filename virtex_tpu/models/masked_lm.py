r"""
Masked language modeling pretext task.

Parity target: ``virtex/models/masked_lm.py:11-106`` — bidirectional (no
future mask) transformer over caption tokens + visual cross-attention; CE
loss only at masked positions (labels are padding everywhere else,
``masked_lm.py:68-72``); val predictions report argmax at masked positions,
padding elsewhere (``masked_lm.py:79-84``).
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from virtex_tpu.models.captioning import token_cross_entropy
from virtex_tpu.modules.textual_heads import TransformerTextualHead
from virtex_tpu.modules.visual_backbones import ResNetVisualBackbone


class MaskedLMModel(nn.Module):
    visual: ResNetVisualBackbone
    textual: TransformerTextualHead  # must have mask_future_positions=False
    padding_idx: int = 0

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 train: bool = True) -> Dict[str, Any]:
        visual_grid = self.visual(batch["image"], train=train)
        tokens = batch["caption_tokens"]
        labels = batch["masked_labels"]
        logits = self.textual(visual_grid, tokens, batch["caption_lengths"],
                              deterministic=not train)
        loss = token_cross_entropy(logits, labels, self.padding_idx)
        out = {"loss": loss, "loss_components": {"masked_lm": loss}}
        if not train:
            preds = jnp.argmax(logits, axis=-1)
            out["predictions"] = jnp.where(
                labels != self.padding_idx, preds, self.padding_idx)
        return out
