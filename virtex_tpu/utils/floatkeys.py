r"""Monotone integer keys for float32 ordering.

Shared by the sort-free decode selection paths
(:mod:`~virtex_tpu.utils.beam_search` top-k,
:mod:`~virtex_tpu.utils.nucleus_sampling` top-p): both replace XLA's
full-vocab variadic sort with linear passes over an integer key view of
the logits, which needs a total order that (a) matches float comparison
and (b) has a spare below-everything sentinel value.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def monotone_u32_keys(x: jnp.ndarray, merge_zeros: bool) -> jnp.ndarray:
    """Monotone uint32 view of float32 values: a > b (as floats, no NaNs)
    iff key(a) > key(b). The IEEE-754 radix trick — negative floats get
    all bits flipped, positives get the sign bit set. Every non-NaN key
    is > 0 (``-inf`` maps to 0x007FFFFF), so 0 is a safe below-everything
    sentinel.

    ``merge_zeros`` picks the tie convention at ±0.0: True maps ``-0.0``
    to ``+0.0`` first (an explicit select — XLA folds ``x + 0.0`` to
    ``x``) so both share one key, matching IEEE ``==`` / stable-sort
    index-order ties (the nucleus sorted-rule contract); False keeps the
    raw total order ``-0.0 < +0.0``, which is what ``lax.top_k``'s
    comparator uses (the beam top-k parity contract)."""
    if merge_zeros:
        x = jnp.where(x == 0.0, 0.0, x)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    neg = bits >= jnp.uint32(0x80000000)
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))
