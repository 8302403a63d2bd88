r"""
Downstream transfer model: backbone + linear classifier head.

Parity target: ``scripts/clf_linear.py:130-164`` — take the pretrained
visual CNN, replace the classifier with a fresh ``Linear(2048, num_classes)``
(re-initialised N(0, 0.01), bias 0 like torchvision defaults), optionally
freeze everything but the head (linear probe).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from virtex_tpu.modules.visual_backbones import ResNetVisualBackbone


class LinearClassifierModel(nn.Module):
    visual: ResNetVisualBackbone
    num_classes: int

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray],
                 train: bool = True) -> Dict[str, Any]:
        grid = self.visual(batch["image"], train=train)
        pooled = jnp.mean(grid, axis=(1, 2)).astype(jnp.float32)
        logits = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(stddev=0.01),
            dtype=jnp.float32, param_dtype=jnp.float32, name="fc")(pooled)
        labels = batch["label"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(
            jnp.take_along_axis(logp, labels[:, None], axis=-1))
        return {
            "loss": loss,
            "loss_components": {"classification": loss},
            "logits": logits,
            "predictions": jnp.argmax(logits, axis=-1),
        }

    def features(self, images: jnp.ndarray) -> jnp.ndarray:
        """L2-normalised GAP features for SVM evaluation
        (``clf_voc07.py:178-210``)."""
        grid = self.visual(images, train=False)
        pooled = jnp.mean(grid, axis=(1, 2)).astype(jnp.float32)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-10)
