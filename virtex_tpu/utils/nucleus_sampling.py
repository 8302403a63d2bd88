r"""
Nucleus (top-p) sampling as a jit-compiled ``lax.while_loop``.

Parity target: reference ``virtex/utils/nucleus_sampling.py:25-123`` —
top-p 0.9 tail-drop over the sorted cumulative softmax (keeping at least the
top token), −inf mask on the immediately preceding token (repetition
guard), categorical sample, EOS latching. The reference masks rows with a
per-row Python loop (``nucleus_sampling.py:95-101``); here the tail mask is
computed fully vectorised and scattered back through the sort permutation.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

StepFn = Callable[[jnp.ndarray, jnp.ndarray, Any], Tuple[jnp.ndarray, Any]]
NEG_INF = -1e18


class AutoRegressiveNucleusSampling:
    def __init__(self, eos_index: int, max_steps: int = 30,
                 nucleus_size: float = 0.9):
        self.eos_index = eos_index
        self.max_steps = max_steps
        self.nucleus_size = nucleus_size

    def search(self, start_tokens: jnp.ndarray, step_fn: StepFn, state: Any,
               rng: jax.Array):
        """start_tokens: (B,). Returns (predictions (B, T), None)."""
        B = start_tokens.shape[0]
        eos = self.eos_index
        preds = jnp.full((B, self.max_steps), eos, jnp.int32)

        def body(carry):
            t, last, preds, state, rng = carry
            logits, state = step_fn(last, t, state)
            logits = logits.astype(jnp.float32)
            V = logits.shape[-1]

            # Top-p on the RAW logits: sort desc, cumulative softmax, drop
            # the tail strictly beyond p but always keep rank 0. `(cum −
            # probs) > p` is exactly the reference's shift-right rule
            # (nucleus_sampling.py:78-91).
            sort_ix = jnp.argsort(-logits, axis=-1)
            sorted_logits = jnp.take_along_axis(logits, sort_ix, axis=-1)
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            drop_sorted = (cum - probs) > self.nucleus_size
            drop_sorted = drop_sorted.at[:, 0].set(False)
            # Scatter the drop mask back to vocab order.
            drop = jnp.zeros_like(drop_sorted).at[
                jnp.arange(B)[:, None], sort_ix].set(drop_sorted)
            filtered = jnp.where(drop, NEG_INF, logits)

            # Repetition guard AFTER the tail-drop, like the reference
            # (nucleus_sampling.py:95-101): never repeat the previous token.
            filtered = jnp.where(jax.nn.one_hot(last, V, dtype=bool),
                                 NEG_INF, filtered)

            rng, sample_rng = jax.random.split(rng)
            sampled = jax.random.categorical(sample_rng, filtered, axis=-1)
            sampled = sampled.astype(jnp.int32)

            # EOS latch (nucleus_sampling.py:108-113).
            finished = (last == eos) & (t > 0)
            sampled = jnp.where(finished, eos, sampled)
            preds = preds.at[:, t].set(sampled)
            return t + 1, sampled, preds, state, rng

        def cond(carry):
            t, last, preds, state, rng = carry
            return (t < self.max_steps) & ~jnp.all((last == eos) & (t > 0))

        _, _, preds, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0, jnp.int32), start_tokens, preds, state, rng))
        return preds, None
