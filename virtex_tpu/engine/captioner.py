r"""
End-to-end caption generation: visual encode → KV-cache init → jitted
beam-search / nucleus decode.

Replaces the reference's inference branch of ``CaptioningModel.forward``
(``virtex/models/captioning.py:145-213``): instead of re-running the full
transformer on every growing prefix, the visual grid is encoded once, K/V
caches are built once (cross-attention K/V precomputed), and the whole
search runs as one compiled ``lax.while_loop`` on device.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from virtex_tpu.utils.beam_search import AutoRegressiveBeamSearch


def make_caption_fn(model, decoder, sos_index: int = 1):
    r"""Build a jittable ``(variables, images[, rng]) -> predictions`` fn.

    ``model`` must expose ``encode_visual`` / ``init_decode`` /
    ``decode_step`` methods (see
    :class:`virtex_tpu.models.captioning.CaptioningModel`).
    Returns token id arrays (B, max_steps); the SOS prefix is excluded
    (reference contract, ``beam_search.py:232-238``).
    """
    is_beam = isinstance(decoder, AutoRegressiveBeamSearch)

    def step_fn(variables, tokens, position, caches):
        if is_beam:
            # Reference beam-search prefixes EXCLUDE the start token
            # (beam_search.py:86-89 "start symbols … are implicit";
            # captioning.py:191-213 re-runs only the predicted tokens), so
            # generated token i sits at position i−1 and the SOS cache slot
            # is overwritten by the first prediction. Nucleus sampling keeps
            # SOS in the prefix (nucleus_sampling.py:119 strips it only at
            # the end), so its positions are used as-is.
            position = jnp.maximum(position - 1, 0)
        logits, caches = model.apply(variables, tokens, position, caches,
                                     method="decode_step")
        if is_beam:
            return jax.nn.log_softmax(logits.astype(jnp.float32)), caches
        return logits, caches

    def caption_fn(variables, images, rng: Optional[jax.Array] = None):
        grid = model.apply(variables, images, method="encode_visual")
        B = images.shape[0]
        if is_beam:
            K = decoder.beam_size
            # beam-major tiling: image i occupies rows [i*K, (i+1)*K)
            grid = jnp.repeat(grid, K, axis=0)
        caches = model.apply(variables, grid, decoder.max_steps,
                             method="init_decode")
        start = jnp.full((B,), sos_index, jnp.int32)
        bound_step = partial(step_fn, variables)
        if is_beam:
            preds, _ = decoder.search(start, bound_step, caches)
        else:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            preds, _ = decoder.search(start, bound_step, caches, rng)
        return preds

    return jax.jit(caption_fn)


def decode_predictions(tokens, tokenizer, eos_index: int = 2) -> list:
    """Token arrays → caption strings (truncate at EOS, skip specials)."""
    import numpy as np
    out = []
    for row in np.asarray(tokens):
        ids = []
        for t in row.tolist():
            if t == eos_index:
                break
            ids.append(int(t))
        out.append(tokenizer.decode(ids))
    return out
