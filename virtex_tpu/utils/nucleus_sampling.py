r"""
Nucleus (top-p) sampling as a jit-compiled ``lax.while_loop``.

Parity target: reference ``virtex/utils/nucleus_sampling.py:25-123`` —
top-p 0.9 tail-drop over the sorted cumulative softmax (keeping at least the
top token), −inf mask on the immediately preceding token (repetition
guard), categorical sample, EOS latching. The reference masks rows with a
per-row Python loop (``nucleus_sampling.py:95-101``); here the drop mask is
computed WITHOUT any vocab sort — :func:`_topp_drop` bisects the nucleus
boundary on a monotone uint32 key view of the logits (the classic
argsort → cumsum → scatter formulation was 33× slower on TPU; see its
docstring and docs/design.md "Decoding").
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from .floatkeys import monotone_u32_keys

StepFn = Callable[[jnp.ndarray, jnp.ndarray, Any], Tuple[jnp.ndarray, Any]]
NEG_INF = -1e18


def _topp_drop(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Vocab-order drop mask for top-p, WITHOUT a full-vocab sort.

    Semantics are exactly the reference rule (sort desc by logit with
    index tie-break, cumulative softmax, drop where ``(cum - probs) > p``,
    always keep rank 0): token i is kept iff the probability mass sorted
    strictly before it is <= p. XLA lowers ``argsort``/``top_k`` over the
    (B, V) logits to a full variadic sort — measured 43% of BEAM decode
    device time before the same fix there (``beam_search._topk_small``).
    Here the boundary logit is found by a 32-step bisection on the
    monotone uint32 key view (converges to ADJACENT keys, so the boundary
    is exact), then ties at the boundary are resolved by index order via
    a prefix count — equal logits have bitwise-equal softmax probs, so
    rank r's mass-before is ``S + r * p_tie``.

    Rounding profile differs from the sorted-``cumsum`` formulation in the
    last ulp (masked row-sums vs sequential scan) — same class of
    difference as XLA's tree cumsum vs torch's sequential one, and only
    observable when a token's cumulative mass lands exactly on ``p``.
    """
    B, V = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)
    keys = monotone_u32_keys(logits, merge_zeros=True)  # ±0.0 tie by index

    def mass_above(tau):
        # Σ probs[key > τ]  (τ: (B, 1) uint32)
        return jnp.sum(jnp.where(keys > tau, probs, 0.0), axis=-1,
                       keepdims=True)

    def bisect(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // jnp.uint32(2)
        above = mass_above(mid) <= p
        return jnp.where(above, lo, mid), jnp.where(above, mid, hi)

    lo = jnp.zeros((B, 1), jnp.uint32)             # below every real key
    hi = jnp.full((B, 1), jnp.uint32(0xFFFFFFFF))  # above every real key
    # Invariants: mass_above(lo) > p (=1 at start, p<1), mass_above(hi)<=p
    # (=0). 32 halvings of a 2^32 range end with hi = lo + 1, so no key
    # lies strictly between them.
    lo, hi = jax.lax.fori_loop(0, 32, bisect, (lo, hi))

    # Boundary = smallest key above lo; mass_above(boundary) <= p.
    k_b = jnp.min(jnp.where(keys > lo, keys, jnp.uint32(0xFFFFFFFF)),
                  axis=-1, keepdims=True)
    above = keys > k_b                              # kept unconditionally
    S = jnp.sum(jnp.where(above, probs, 0.0), axis=-1, keepdims=True)
    tie = keys == k_b
    tie_rank = jnp.cumsum(tie.astype(jnp.float32), axis=-1) - tie
    keep_tie = tie & (S + tie_rank * probs <= p)
    rank0 = jax.nn.one_hot(jnp.argmax(logits, axis=-1), V, dtype=bool)
    return ~(above | keep_tie | rank0)


class AutoRegressiveNucleusSampling:
    def __init__(self, eos_index: int, max_steps: int = 30,
                 nucleus_size: float = 0.9, unroll: int = 1):
        self.eos_index = eos_index
        self.max_steps = max_steps
        self.nucleus_size = nucleus_size
        if unroll < 1:
            raise ValueError(f"unroll must be >= 1, got {unroll}")
        self.unroll = unroll

    def search(self, start_tokens: jnp.ndarray, step_fn: StepFn, state: Any,
               rng: jax.Array):
        """start_tokens: (B,). Returns (predictions (B, T), None)."""
        B = start_tokens.shape[0]
        eos = self.eos_index
        preds = jnp.full((B, self.max_steps), eos, jnp.int32)

        def substep(carry, masked: bool):
            t, last, preds, state, rng = carry
            logits, state = step_fn(last, t, state)
            logits = logits.astype(jnp.float32)
            V = logits.shape[-1]

            # Top-p on the RAW logits: the reference sorts desc, takes the
            # cumulative softmax and drops the tail strictly beyond p,
            # always keeping rank 0 (`(cum − probs) > p` is its
            # shift-right rule, nucleus_sampling.py:78-91). `_topp_drop`
            # computes the same set by threshold bisection — no (B, V)
            # sort in the decode loop (see its docstring).
            drop = _topp_drop(logits, self.nucleus_size)
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
            new_preds = preds.at[:, t].set(sampled)
            if masked:
                # Guard for unrolled sub-steps: `valid` is EXACTLY the
                # loop cond on this sub-step's ENTRY carry, so a masked
                # sub-step mutates the output carries iff the rolled loop
                # would have run it ("unrolled ≡ rolled" by construction;
                # see beam_search for the full rationale). Strictly the
                # tail clamp of `.at[:, t]` is the only live hazard here —
                # the EOS latch already rewrites `sampled` bitwise when
                # all rows finished — but mirroring cond keeps the
                # invariant immune to future latch edits. `state`/`rng`
                # stay unguarded: every later sub-step is invalid too,
                # and the extra rng split feeds only latched samples.
                valid = ((t < self.max_steps)
                         & ~jnp.all((last == eos) & (t > 0)))
                sampled = jnp.where(valid, sampled, last)
                new_preds = jnp.where(valid, new_preds, preds)
            return t + 1, sampled, new_preds, state, rng

        def body(carry):
            # `unroll` sub-steps per while iteration — fewer loop-carry
            # round-trips and a wider XLA scheduling window; sub-step 0
            # needs no guard (cond guarantees t < max_steps on entry).
            carry = substep(carry, masked=False)
            for _ in range(self.unroll - 1):
                carry = substep(carry, masked=True)
            return carry

        def cond(carry):
            t, last, preds, state, rng = carry
            return (t < self.max_steps) & ~jnp.all((last == eos) & (t > 0))

        _, _, preds, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0, jnp.int32), start_tokens, preds, state, rng))
        return preds, None
