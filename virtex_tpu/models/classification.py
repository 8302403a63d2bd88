r"""
Classification pretext tasks: token classification (caption tokens as an
unordered label set) and multi-label classification (COCO instance
categories).

Parity target: ``virtex/models/classification.py:12-174`` — the loss is a
KL-to-K-hot objective: log-softmax over vocab/categories, per-instance mean
of log-probabilities at the (unique) ground-truth indices. The reference
computes this with a Python loop over the batch
(``classification.py:82-93``); here it is vectorised as a scatter into a
multi-hot matrix followed by a masked mean — one fused XLA kernel, no host
loop. Top-10 predictions are reported at val (``classification.py:104-106``).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from virtex_tpu.modules.visual_backbones import ResNetVisualBackbone


def instance_label_set_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                            ignore_indices: Sequence[int]) -> jnp.ndarray:
    """−mean_i ( mean_{c ∈ unique(labels_i) \\ ignore} logp_i[c] ).

    ``labels`` is (B, L) padded with entries from ``ignore_indices``.
    Duplicate labels collapse via the multi-hot scatter (the reference's
    ``unique`` per instance, ``classification.py:86-90``).
    """
    B, V = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = jnp.ones_like(labels, dtype=bool)
    for ig in ignore_indices:
        valid &= labels != ig
    # Multi-hot (B, V): True where class appears among valid labels.
    onehot = jax.nn.one_hot(labels, V, dtype=jnp.float32)  # (B, L, V)
    onehot = onehot * valid[..., None]
    multihot = jnp.clip(jnp.sum(onehot, axis=1), 0.0, 1.0)
    k = jnp.maximum(jnp.sum(multihot, axis=-1), 1.0)
    per_instance = -jnp.sum(logp * multihot, axis=-1) / k
    # Instances with zero valid labels contribute 0 (the data layer drops
    # label-free images, classification.py:137-140, so this is a guard).
    has_any = (jnp.sum(multihot, axis=-1) > 0).astype(jnp.float32)
    return jnp.sum(per_instance * has_any) / jnp.maximum(jnp.sum(has_any), 1.0)


class ClassificationModel(nn.Module):
    """Visual backbone + a textual head ending in vocab/category logits."""
    visual: ResNetVisualBackbone
    textual: nn.Module
    ignore_indices: Tuple[int, ...] = ()

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 train: bool = True) -> Dict[str, Any]:
        visual_grid = self.visual(batch["image"], train=train)
        logits = self.textual(visual_grid)
        loss = instance_label_set_loss(
            logits, batch["labels"], self.ignore_indices)
        out = {"loss": loss, "loss_components": {"classification": loss}}
        if not train:
            out["predictions"] = jax.lax.top_k(logits, k=10)[1]
        return out


class TokenClassificationModel(ClassificationModel):
    """Labels = caption token ids; ignores special indices {unk/pad, SOS,
    EOS, MASK} (reference ``factories.py:452-460``)."""


class MultiLabelClassificationModel(ClassificationModel):
    """Labels = COCO instance categories remapped 1..80; 0 = background is
    ignored (reference ``factories.py:461-464``)."""
