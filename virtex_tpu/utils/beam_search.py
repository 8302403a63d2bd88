r"""
Autoregressive beam search as a jit-compiled ``lax.while_loop``.

Parity target: reference ``virtex/utils/beam_search.py:25-238`` (AllenNLP
lineage, backpointer trick removed in v1.2 for transformers): batch-expanded
(B·K) prefixes, per-node beam of 2, repetition penalty −10000 on the last
predicted token (``beam_search.py:156-157``), EOS-absorbing states
(``:129-133,168-172``), early stop when every beam ends in EOS
(``:143-144``).

TPU-native design: everything is fixed-shape. Step 0 is PEELED before the
while_loop: the start token's distribution is evaluated once and its global
top-K seeds the K beams (the reference's step-0 special case at
``beam_search.py:119-127``); subsequent steps run per-node top-P → global
top-K inside the loop. Early stopping is the while-loop condition rather
than a Python break; the step callback threads a KV-cache pytree that is
gathered to follow beams through re-ranking.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from .floatkeys import monotone_u32_keys

StepFn = Callable[[jnp.ndarray, jnp.ndarray, Any], Tuple[jnp.ndarray, Any]]
NEG_INF = -1e18
REPETITION_PENALTY = -10000.0  # reference beam_search.py:156-157

# Above this k the iterative-argmax top-k's k sequential passes stop paying
# for themselves vs one sort; every reference decode config (K=5, P=2) is
# far below it.
_ITERATIVE_TOPK_MAX_K = 8


def _topk_small(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r"""Exact ``lax.top_k`` replacement for small k over a large last axis.

    XLA:TPU lowers ``lax.top_k`` to a full variadic sort of the operand —
    profiled at 67 ms/decode-call on the (32, 5, 10000) in-loop logprobs,
    ~43% of beam decode's device time — where k sequential
    ``argmax → mask → argmax`` linear passes read the array k times at VPU
    bandwidth. Matches ``lax.top_k`` bit-exactly for any non-NaN input,
    including tie order (``argmax`` picks the lowest index of a maximum,
    reproducing top_k's stable descending order) and rows containing
    ``-inf``: selection runs on the monotone uint32 key view, where taken
    positions drop to key 0 — strictly below every real value's key — so
    each pass always advances to a fresh index (masking the float with
    ``-inf`` would be a no-op on a ``-inf`` winner and return duplicate
    indices).
    """
    keys = monotone_u32_keys(x, merge_zeros=False)  # lax.top_k: -0.0 < +0.0
    idx_range = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(keys, axis=-1)
        v = jnp.take_along_axis(x, i[..., None], axis=-1)
        vals.append(v)
        idxs.append(i[..., None])
        keys = jnp.where(idx_range == i[..., None], jnp.uint32(0), keys)
    return (jnp.concatenate(vals, axis=-1).astype(x.dtype),
            jnp.concatenate(idxs, axis=-1))


def _topk(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if k <= _ITERATIVE_TOPK_MAX_K and x.shape[-1] > 4 * k:
        return _topk_small(x, k)
    return jax.lax.top_k(x, k)


class AutoRegressiveBeamSearch:
    r"""
    Args:
        eos_index: token latched once a beam finishes.
        max_steps: decode length (static).
        beam_size: K.
        per_node_beam_size: candidates drawn per live beam before re-ranking
            (reference default 2).
    """

    def __init__(self, eos_index: int, max_steps: int = 30,
                 beam_size: int = 5, per_node_beam_size: int = 2,
                 unroll: int = 1):
        self.eos_index = eos_index
        self.max_steps = max_steps
        self.beam_size = beam_size
        self.per_node_beam_size = per_node_beam_size or beam_size
        if unroll < 1:
            raise ValueError(f"unroll must be >= 1, got {unroll}")
        self.unroll = unroll

    def search(self, start_tokens: jnp.ndarray, step_fn: StepFn,
               state: Any, only_return_best: bool = True):
        r"""
        Args:
            start_tokens: (B,) int32 — usually ``[SOS]``.
            step_fn: ``(last_tokens (B·K,), position, state) →
                (logprobs (B·K, V), state)``. ``state`` is any pytree whose
                arrays carry batch dim B·K (e.g. KV caches built over visual
                features tiled per beam).
            only_return_best: return best beam (B, T) or all (B, K, T).

        Returns:
            (predictions, logprobs): prefixes EXCLUDE the start token
            (reference contract) and are padded with EOS after finish.
        """
        B = start_tokens.shape[0]
        K, P = self.beam_size, self.per_node_beam_size
        eos = self.eos_index

        # ---- step 0, peeled out of the loop (reference beam_search.py:
        # 119-127): all K beams are identical copies of the start token, so
        # the first expansion takes the top-K of ONE distribution — the
        # in-loop per-node top-P would only ever explore P < K first tokens.
        start_flat = jnp.tile(start_tokens[:, None], (1, K)).reshape(B * K)
        logprobs0, state = step_fn(start_flat, jnp.asarray(0, jnp.int32),
                                   state)
        V = logprobs0.shape[-1]
        # NOTE: no repetition penalty here — the reference applies it only
        # inside the loop on the last PREDICTED token (beam_search.py:
        # 156-157); the start token is fair game at step 0 (:108-127).
        lp0 = logprobs0.reshape(B, K, V)[:, 0, :].astype(jnp.float32)
        k0 = min(K, V)  # degenerate tiny-vocab case: K may exceed V
        scores, last = _topk(lp0, k0)                           # (B, k0)
        if k0 < K:
            scores = jnp.concatenate(
                [scores, jnp.full((B, K - k0), NEG_INF, jnp.float32)], axis=1)
            last = jnp.concatenate(
                [last, jnp.tile(last[:, -1:], (1, K - k0))], axis=1)
        preds = jnp.full((B, K, self.max_steps), eos, jnp.int32)
        preds = preds.at[:, :, 0].set(last)
        # state needs no reorder: every beam's step-0 cache entry is the
        # same start-token update.

        def substep(carry, masked: bool):
            t, last, scores, preds, state = carry
            last_flat = last.reshape(B * K)
            logprobs, state = step_fn(last_flat, t, state)
            V = logprobs.shape[-1]
            # All the vocab-size work stays FLAT (B·K, V): every op below
            # is per-row, and a (B, K, V) view in the loop lets XLA's
            # layout assignment make the small (B, K) pair minor-most —
            # profiled at batch 128 as a {1,0,2} layout with 640→1024 tile
            # padding, a 29 ms/call materialised reshape, and ~6× worse
            # per-image decode. Only the (·, P)-sized tensors get reshaped.
            logprobs = logprobs.astype(jnp.float32)

            # Repetition penalty on each beam's last predicted token.
            logprobs = logprobs + REPETITION_PENALTY * jax.nn.one_hot(
                last_flat, V, dtype=jnp.float32)

            # EOS-absorbing: a finished beam only extends with EOS at zero
            # added cost (so its score freezes). The loop starts at t=1, so
            # `last` is always a real prediction here.
            finished = last_flat == eos
            after_end = jnp.full((V,), NEG_INF).at[eos].set(0.0)
            logprobs = jnp.where(finished[:, None], after_end[None],
                                 logprobs)

            # Per-node top-P then global top-K over K·P candidates.
            node_lp, node_ix = _topk(logprobs, P)              # (B·K, P)
            cand = scores.reshape(B * K)[:, None] + node_lp     # (B·K, P)
            cand_flat = cand.reshape(B, K * P)
            new_scores, flat_ix = jax.lax.top_k(cand_flat, K)   # (B, K)
            src_beam = flat_ix // P                             # (B, K)
            new_tokens = jnp.take_along_axis(
                node_ix.reshape(B, K * P), flat_ix, axis=1)     # (B, K)

            # Reorder beam-history + per-beam decode state to winners.
            new_preds = jnp.take_along_axis(preds, src_beam[..., None],
                                            axis=1)
            new_preds = new_preds.at[:, :, t].set(new_tokens)

            # NOTE on the reorder form: a flat row-gather
            # (jnp.take(x, b*K + src_beam, axis=0)) looks cheaper but
            # makes XLA assign the KV caches a {3,1,2,0} layout (time as
            # second-minor) at every batch size — the per-step
            # dynamic-update-slices then write strided (profiled +21% at
            # batch 32). The (B, K, ...) take_along_axis view keeps the
            # caches natural {3,2,1,0}.
            def reorder(x):
                xb = x.reshape(B, K, *x.shape[1:])
                ix = src_beam.reshape(B, K, *([1] * (x.ndim - 1)))
                return jnp.take_along_axis(xb, ix, axis=1).reshape(x.shape)

            state = jax.tree.map(reorder, state)
            if masked:
                # Guard for unrolled sub-steps: `valid` is EXACTLY the
                # loop cond evaluated on this sub-step's ENTRY carry
                # (`t`/`last` are the unpacked carry, untouched above), so
                # a masked sub-step mutates the output carries iff the
                # rolled loop would have run it — "unrolled ≡ rolled"
                # holds by construction. This covers both the tail past
                # max_steps (the `.at[:, :, t]` write above clamps onto
                # slot max_steps−1 and the reorder would permute
                # unrecorded history) and all-EOS mid-iteration. The
                # all-EOS case IS a natural bitwise identity, but only
                # through a subtle chain — EOS absorption at +0.0,
                # descending-score loop invariant, stable top_k tie
                # order, and (under K > V padding) all-EOS being
                # unreachable at all because a NEG_INF junk candidate
                # always out-ties the pads' EOS extensions — so the
                # guard pins it structurally instead. `state` is left
                # unguarded: t only grows and all-EOS never un-happens
                # under the guard, so once a sub-step is invalid every
                # later one is too, and a clamped cache write is never
                # read by a valid step.
                valid = (t < self.max_steps) & ~jnp.all(last == eos)
                new_tokens = jnp.where(valid, new_tokens, last)
                new_scores = jnp.where(valid, new_scores, scores)
                new_preds = jnp.where(valid, new_preds, preds)
            return t + 1, new_tokens, new_scores, new_preds, state

        def body(carry):
            # `unroll` sub-steps per while iteration: fewer loop-carry
            # round-trips / condition evaluations and a wider scheduling
            # window for XLA across the step boundary. Sub-step 0 needs
            # no tail guard (cond guarantees t < max_steps on entry).
            carry = substep(carry, masked=False)
            for _ in range(self.unroll - 1):
                carry = substep(carry, masked=True)
            return carry

        def cond(carry):
            t, last, scores, preds, state = carry
            return (t < self.max_steps) & ~jnp.all(last == eos)

        t, last, scores, preds, state = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(1, jnp.int32), last, scores, preds, state))

        if only_return_best:
            return preds[:, 0, :], scores[:, 0]
        return preds, scores
