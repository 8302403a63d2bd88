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

# Param leaves that are COMPUTED in fp32 during decode and must not be
# pre-cast: LayerNorm modules (built with dtype=float32) and the output
# bias (added to the f32-upcast logits, textual_heads.py output_logits).
_FP32_DECODE_PARAMS = ("norm1", "norm2", "norm3", "final_norm",
                       "layer_norm", "output_bias")


def cast_decode_params(variables: dict, model) -> dict:
    r"""One-time bf16 pre-cast of the textual matmul/embedding params.

    Every Dense/Embed in the textual stack runs with ``dtype=bfloat16,
    param_dtype=float32`` — flax ``promote_dtype`` casts these leaves
    fp32→bf16 at *each use*, i.e. on every one of the ~30 decode-loop
    steps. Casting them once up front is **bit-identical** (the same
    deterministic fp32→bf16 truncation, applied once instead of per
    step) and halves the per-step weight HBM traffic of the
    weight-streaming-bound decode loop.

    ``model`` is the owning model: the cast is only bit-identical when
    the textual stack actually COMPUTES in bf16, so for any other
    ``model.textual.dtype`` (e.g. the fp32 parity-test builds, which
    would silently truncate their weights) ``variables`` is returned
    unchanged.

    Kept fp32: leaves in :data:`_FP32_DECODE_PARAMS` (see above), the
    whole CNN subtree (``SubsampledBatchNorm`` folds ``scale *
    rsqrt(var+eps)`` in fp32 *before* casting, and ``encode_visual``
    runs once per call — nothing to save), and ``batch_stats``.
    """
    if (getattr(getattr(model, "textual", None), "dtype", None)
            != jnp.bfloat16):
        return variables
    from jax.tree_util import tree_map_with_path

    def cast(path, leaf):
        keys = [k.key for k in path if hasattr(k, "key")]
        if "textual" not in keys or leaf.dtype != jnp.float32:
            return leaf
        if any(k in _FP32_DECODE_PARAMS for k in keys):
            return leaf
        return leaf.astype(jnp.bfloat16)

    return {**variables,
            "params": tree_map_with_path(cast, variables["params"])}


def make_caption_fn(model, decoder, sos_index: int = 1,
                    prefix_mode: str = "reference", mesh=None,
                    cast_params: bool = True):
    r"""Build a jittable ``(variables, images[, rng]) -> predictions`` fn.

    ``model`` must expose ``encode_visual`` / ``init_decode`` /
    ``decode_step`` methods (see
    :class:`virtex_tpu.models.captioning.CaptioningModel`).
    Returns token id arrays (B, max_steps); the SOS prefix is excluded
    (reference contract, ``beam_search.py:232-238``).

    ``mesh``: optional ``jax.sharding.Mesh`` — the compiled search then
    runs SPMD with images (and every per-image decode tensor) sharded over
    the ``data`` axis and variables replicated. Decoding is per-image
    independent (eval-mode BN, row-local searches), so outputs are
    identical to the single-device path. The reference evaluates captions
    on ONE GPU only (``eval_captioning.py:114-115``); this is a TPU-native
    improvement like the KV cache.

    ``prefix_mode`` (beam search only; config ``MODEL.DECODER.PREFIX_MODE``):

    - ``"reference"`` (default, the parity contract): prefixes EXCLUDE the
      start token — the reference re-runs only the predicted tokens
      (``beam_search.py:86-89`` "start symbols … are implicit",
      ``captioning.py:191-213``), so generated token i sits at position
      i−1 and the SOS cache slot is overwritten by the first prediction.
      This is a train/inference mismatch the reference ships (training
      conditions on [SOS, w₁, …]); reproduce it to match published
      checkpoints' captions exactly (test_reference_parity).
    - ``"sos"`` (train-consistent): keep SOS at position 0 like training —
      measurably better captions for models trained in THIS framework
      (e.g. the overfit smoke memorizes 8/8 vs 2/8 under "reference").

    Nucleus sampling always keeps SOS in the prefix — the reference does
    too (``nucleus_sampling.py:119`` strips it only at the end).

    ``cast_params`` (default True): pre-cast the textual matmul params to
    bf16 once per call via :func:`cast_decode_params` — bit-identical
    outputs (the modules cast fp32→bf16 at every use anyway), but the
    cast happens once instead of on each of the ~30 decode-loop steps.
    """
    is_beam = isinstance(decoder, AutoRegressiveBeamSearch)
    if prefix_mode not in ("reference", "sos"):
        raise ValueError(f"unknown prefix_mode {prefix_mode!r}")
    rebase = is_beam and prefix_mode == "reference"
    max_pos = getattr(getattr(model, "textual", None),
                      "max_caption_length", None)
    if max_pos is not None and decoder.max_steps > max_pos:
        # The positional table has max_caption_length rows; beyond it the
        # embedding gather would silently CLAMP to the last position
        # (subtly wrong captions, no error — torch raises IndexError).
        raise ValueError(
            f"decoder.max_steps={decoder.max_steps} exceeds the positional "
            f"table ({max_pos} rows); raise DATA.MAX_CAPTION_LENGTH or "
            "lower MODEL.DECODER.MAX_DECODING_STEPS")

    def step_fn(variables, cross, tokens, position, caches):
        if rebase:
            position = jnp.maximum(position - 1, 0)
        if cross is not None:
            # Re-attach the beam-invariant cross-attention K/V (closed
            # over, NOT part of the search state — see caption_fn).
            caches = [{**sc, **cx} for sc, cx in zip(caches, cross)]
        logits, caches = model.apply(variables, tokens, position, caches,
                                     method="decode_step")
        if cross is not None:
            caches = [{"k": c["k"], "v": c["v"]} for c in caches]
        if is_beam:
            return jax.nn.log_softmax(logits.astype(jnp.float32)), caches
        return logits, caches

    def caption_fn(variables, images, rng: Optional[jax.Array] = None):
        if cast_params:
            # Once per CALL (outside the decode while_loop): bit-identical
            # bf16 pre-cast of the textual matmul params — no-op for
            # non-bf16 models (guard inside cast_decode_params). Callers
            # keep passing fp32 variables.
            variables = cast_decode_params(variables, model)
        grid = model.apply(variables, images, method="encode_visual")
        B = images.shape[0]
        # Caches are built from the UNTILED grid: visual_projection and the
        # cross-attention K/V projections run once per image, not once per
        # beam (they are identical across an image's K beams).
        caches = model.apply(variables, grid, decoder.max_steps,
                             method="init_decode")
        start = jnp.full((B,), sos_index, jnp.int32)
        if is_beam:
            K = decoder.beam_size
            # beam-major tiling: image i occupies rows [i*K, (i+1)*K).
            # The cross K/V stay OUT of the search state so the per-step
            # beam reorder does not gather (B·K, 49, N, D) tensors that
            # never differ within an image's K rows.
            cross = [{"ck": jnp.repeat(c["ck"], K, axis=0),
                      "cv": jnp.repeat(c["cv"], K, axis=0)}
                     for c in caches]
            self_caches = [{"k": jnp.repeat(c["k"], K, axis=0),
                            "v": jnp.repeat(c["v"], K, axis=0)}
                           for c in caches]
            preds, _ = decoder.search(
                start, partial(step_fn, variables, cross), self_caches)
        else:
            if rng is None:
                # A silent fixed seed would make "sampling" deterministic
                # with no symptom; the caller must thread real randomness.
                raise ValueError(
                    "nucleus decoding requires an rng (jax.random.PRNGKey)")
            preds, _ = decoder.search(
                start, partial(step_fn, variables, None), caches, rng)
        return preds

    if mesh is None:
        return jax.jit(caption_fn)

    from jax.sharding import NamedSharding, PartitionSpec as P
    data_axes = mesh.shape.get("data", 1)
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    jitted = jax.jit(caption_fn,
                     in_shardings=(repl, data_sh, repl),
                     out_shardings=data_sh)

    def sharded_caption_fn(variables, images, rng=None):
        if images.shape[0] % data_axes:
            raise ValueError(
                f"batch {images.shape[0]} not divisible by the mesh's "
                f"data axis ({data_axes}); pick a batch size that tiles")
        if rng is None:
            if not is_beam:  # keep the inner guard's semantics
                raise ValueError(
                    "nucleus decoding requires an rng (jax.random.PRNGKey)")
            rng = jax.random.PRNGKey(0)  # traced but unused by beam search
        from virtex_tpu.ops._mesh import kernel_mesh
        with mesh, kernel_mesh(mesh):
            return jitted(variables, images, rng)

    return sharded_caption_fn


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
