r"""
LR schedules as pure functions of the step (optax-style).

Parity target: ``virtex/optim/lr_scheduler.py`` — all schedules are
*multipliers* on the base LR with built-in linear warmup:

- ``none``:      linear warmup then constant 1 (``lr_scheduler.py:9-40``)
- ``multistep``: warmup then ``gamma**(milestones passed)`` (``:43-98``)
- ``linear``:    warmup then ``(T−t)/(T−w)`` (``:101-138``)
- ``cosine``:    warmup then ``cos²((t−w)/(T−w)·π/2)`` (``:141-183``)

Pure jnp functions of an int32 step: usable inside jit, serialization-free,
and exactly resumable (no scheduler state to checkpoint).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _warmup(step, warmup_steps):
    # Reference multiplies by t/warmup while t < warmup, else 1
    # (lr_scheduler.py:34-38). With warmup=0 the multiplier is 1 from step 0.
    return jnp.where(step < warmup_steps,
                     step / jnp.maximum(warmup_steps, 1), 1.0)


def warmup_no_decay(total_steps: int, warmup_steps: int) -> Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return _warmup(step, warmup_steps)
    return schedule


def warmup_multistep(total_steps: int, warmup_steps: int,
                     milestones: Sequence[int], gamma: float = 0.1) -> Schedule:
    milestones = sorted(milestones)
    ms = jnp.asarray(milestones, jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        passed = jnp.sum(step >= ms) if len(milestones) else 0
        return _warmup(step, warmup_steps) * (gamma ** passed)
    return schedule


def warmup_linear_decay(total_steps: int, warmup_steps: int) -> Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        decay = (total_steps - step) / jnp.maximum(
            total_steps - warmup_steps, 1)
        return jnp.where(step < warmup_steps,
                         _warmup(step, warmup_steps),
                         jnp.maximum(decay, 0.0))
    return schedule


def warmup_cosine_decay(total_steps: int, warmup_steps: int) -> Schedule:
    """cos² annealing — NOT the usual ½(1+cos): reference
    ``lr_scheduler.py:175-183``."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        frac = (step - warmup_steps) / jnp.maximum(
            total_steps - warmup_steps, 1)
        cosine = jnp.cos(jnp.clip(frac, 0.0, 1.0) * jnp.pi / 2.0) ** 2
        return jnp.where(step < warmup_steps,
                         _warmup(step, warmup_steps), cosine)
    return schedule


def make_schedule(name: str, total_steps: int, warmup_steps: int,
                  milestones: Sequence[int] = (), gamma: float = 0.1
                  ) -> Schedule:
    if name == "none":
        return warmup_no_decay(total_steps, warmup_steps)
    if name == "multistep":
        return warmup_multistep(total_steps, warmup_steps, milestones, gamma)
    if name == "linear":
        return warmup_linear_decay(total_steps, warmup_steps)
    if name == "cosine":
        return warmup_cosine_decay(total_steps, warmup_steps)
    raise ValueError(f"Unknown LR schedule {name!r}")
