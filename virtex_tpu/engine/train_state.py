r"""
Training state: one pytree carrying params, BN stats, optimizer state, step.

Replaces the reference's scattered mutable objects (model.parameters(),
optimizer state, scheduler state, GradScaler — ``scripts/pretrain_virtex.py:
98-115``) with a single immutable pytree, which is what makes the train step
a pure jittable function and checkpoints a single serialisable object.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation):
        return cls(step=jnp.zeros([], jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params))
