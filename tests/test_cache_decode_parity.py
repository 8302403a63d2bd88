"""KV-cached beam search must produce identical captions to a reference
searcher that re-runs the FULL transformer on every growing prefix (the
reference's decoding strategy, captioning.py:191-213) on the same weights."""
import jax
import jax.numpy as jnp
import numpy as np

from virtex_tpu.engine.captioner import make_caption_fn
from virtex_tpu.factories import CaptionDecoderFactory
from virtex_tpu.models import ForwardCaptioningModel
from virtex_tpu.modules import ResNetVisualBackbone, TransformerTextualHead
from virtex_tpu.utils.beam_search import AutoRegressiveBeamSearch

VOCAB, MAXLEN, BEAMS = 40, 7, 4


import pytest


@pytest.mark.parametrize("prefix_mode", ["reference", "sos"])
@pytest.mark.slow  # compile/mesh-heavy; full suite still runs it
def test_kv_cache_beam_equals_full_prefix_beam(prefix_mode):
    model = ForwardCaptioningModel(
        visual=ResNetVisualBackbone("resnet18", dtype=jnp.float32),
        textual=TransformerTextualHead(
            visual_feature_size=512, vocab_size=VOCAB, hidden_size=32,
            num_layers=2, attention_heads=4, feedforward_size=64,
            dropout=0.0, max_caption_length=MAXLEN, dtype=jnp.float32))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    tokens = rng.randint(4, VOCAB, (2, MAXLEN)).astype(np.int32)
    tokens[:, 0] = 1
    batch = {"image": images, "caption_tokens": jnp.asarray(tokens),
             "noitpac_tokens": jnp.asarray(tokens[:, ::-1].copy()),
             "caption_lengths": jnp.full((2,), MAXLEN, jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    decoder = AutoRegressiveBeamSearch(eos_index=2, max_steps=MAXLEN,
                                       beam_size=BEAMS)
    # fast path: compiled KV cache
    fast = make_caption_fn(model, decoder, sos_index=1,
                           prefix_mode=prefix_mode)
    fast_preds = np.asarray(fast(variables, images))

    # reference-style path: full-prefix re-forward each step, same beam algo
    grid = model.apply(variables, images, method="encode_visual")
    grid_t = jnp.repeat(grid, BEAMS, axis=0)
    B = images.shape[0]

    prefix_buf = np.full((B * BEAMS, MAXLEN), 0, np.int32)
    prefix_buf[:, 0] = 1  # SOS

    def slow_step(last_tokens, position, state):
        buf = state["buf"]
        if prefix_mode == "reference":
            # Reference prefix layout (captioning.py:191-213): step 0 feeds
            # just [SOS]; later prefixes are the predicted tokens ONLY,
            # re-based at position 0 (beam_search.py:86-89 — start symbols
            # are implicit).
            write_pos = jnp.maximum(position - 1, 0)
            length = jnp.maximum(position, 1)
        else:
            # train-consistent: [SOS, w1, ..., wt] with SOS at position 0
            write_pos = position
            length = position + 1
        # position 0 writes SOS (a no-op in "sos" mode where the buffer is
        # pre-seeded); later steps write the newest prediction.
        buf = buf.at[:, write_pos].set(last_tokens)
        lengths = jnp.full((B * BEAMS,), length, jnp.int32)
        logits = model.textual.apply(
            {"params": variables["params"]["textual"]},
            grid_t, buf, lengths, True)
        # logits at the last real position
        step_logits = logits[jnp.arange(B * BEAMS), length - 1]
        return jax.nn.log_softmax(step_logits.astype(jnp.float32)), {
            "buf": buf}

    state = {"buf": jnp.asarray(prefix_buf)}
    slow_preds, slow_scores = decoder.search(
        jnp.full((B,), 1, jnp.int32), slow_step, state)

    np.testing.assert_array_equal(fast_preds, np.asarray(slow_preds))


def test_caption_fn_nucleus_path():
    """make_caption_fn with the nucleus decoder: compiled KV-cached
    sampling runs end-to-end, keeps SOS in the prefix (position offsets
    unshifted), emits valid fixed-shape token ids, and is deterministic
    given the rng."""
    from virtex_tpu.utils.nucleus_sampling import AutoRegressiveNucleusSampling

    model = ForwardCaptioningModel(
        visual=ResNetVisualBackbone("resnet18", dtype=jnp.float32),
        textual=TransformerTextualHead(
            visual_feature_size=512, vocab_size=VOCAB, hidden_size=32,
            num_layers=1, attention_heads=4, feedforward_size=64,
            dropout=0.0, max_caption_length=MAXLEN, dtype=jnp.float32))
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    tokens = rng.randint(4, VOCAB, (2, MAXLEN)).astype(np.int32)
    tokens[:, 0] = 1
    batch = {"image": images, "caption_tokens": jnp.asarray(tokens),
             "noitpac_tokens": jnp.asarray(tokens[:, ::-1].copy()),
             "caption_lengths": jnp.full((2,), MAXLEN, jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    decoder = AutoRegressiveNucleusSampling(eos_index=2, max_steps=MAXLEN,
                                            nucleus_size=0.9)
    fn = make_caption_fn(model, decoder, sos_index=1)
    p1 = np.asarray(fn(variables, images, jax.random.PRNGKey(3)))
    p2 = np.asarray(fn(variables, images, jax.random.PRNGKey(3)))
    assert p1.shape == (2, MAXLEN)
    assert ((p1 >= 0) & (p1 < VOCAB)).all()
    np.testing.assert_array_equal(p1, p2)  # rng-deterministic


def test_kv_cache_nucleus_equals_full_prefix_nucleus():
    """Nucleus twin of the beam parity test above: KV-cached sampling must
    emit the SAME tokens as a full-prefix re-forward driving the same
    sampler with the same rng — any cache/position bug would desync the
    logits and (with high probability across 30 sampled steps) the draws.
    Added after the quality-proxy diagnosis showed the nucleus path's only
    prior end-to-end evidence was shape/determinism checks."""
    from virtex_tpu.utils.nucleus_sampling import AutoRegressiveNucleusSampling

    model = ForwardCaptioningModel(
        visual=ResNetVisualBackbone("resnet18", dtype=jnp.float32),
        textual=TransformerTextualHead(
            visual_feature_size=512, vocab_size=VOCAB, hidden_size=32,
            num_layers=2, attention_heads=4, feedforward_size=64,
            dropout=0.0, max_caption_length=MAXLEN, dtype=jnp.float32))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    tokens = rng.randint(4, VOCAB, (2, MAXLEN)).astype(np.int32)
    tokens[:, 0] = 1
    batch = {"image": images, "caption_tokens": jnp.asarray(tokens),
             "noitpac_tokens": jnp.asarray(tokens[:, ::-1].copy()),
             "caption_lengths": jnp.full((2,), MAXLEN, jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    decoder = AutoRegressiveNucleusSampling(eos_index=2, max_steps=MAXLEN,
                                            nucleus_size=0.9)
    fast = make_caption_fn(model, decoder, sos_index=1)
    fast_preds = np.asarray(fast(variables, images, jax.random.PRNGKey(3)))

    # full-prefix re-forward: nucleus keeps SOS at position 0, prefixes
    # [SOS, w1, ..., wt] (train-consistent — captioner.py nucleus contract)
    grid = model.apply(variables, images, method="encode_visual")
    B = images.shape[0]
    prefix_buf = np.full((B, MAXLEN + 1), 0, np.int32)
    prefix_buf[:, 0] = 1  # SOS

    def slow_step(last_tokens, position, state):
        buf = state["buf"]
        # position t feeds token t of the prefix: t=0 re-writes SOS, later
        # steps append the newest sample at position t.
        buf = buf.at[:, position].set(last_tokens)
        length = position + 1
        lengths = jnp.full((B,), length, jnp.int32)
        logits = model.textual.apply(
            {"params": variables["params"]["textual"]},
            grid, buf[:, :MAXLEN], lengths, True)
        step_logits = logits[jnp.arange(B), length - 1]
        return step_logits, {"buf": buf}

    state = {"buf": jnp.asarray(prefix_buf)}
    slow_preds, _ = decoder.search(jnp.full((B,), 1, jnp.int32), slow_step,
                                   state, jax.random.PRNGKey(3))

    np.testing.assert_array_equal(fast_preds, np.asarray(slow_preds))


@pytest.mark.parametrize("kind", ["beam", "nucleus"])
def test_bf16_param_precast_bit_identical(kind):
    """cast_decode_params (default-on for bf16 models) must be a pure
    layout optimization: pre-casting the textual matmul params to bf16
    once reproduces EXACTLY the per-use fp32->bf16 casts flax would do
    inside the decode loop.  fp32-dtype models must be left alone (the
    guard in make_caption_fn), which the existing parity tests cover."""
    from virtex_tpu.utils.nucleus_sampling import AutoRegressiveNucleusSampling

    model = ForwardCaptioningModel(
        visual=ResNetVisualBackbone("resnet18", dtype=jnp.bfloat16),
        textual=TransformerTextualHead(
            visual_feature_size=512, vocab_size=VOCAB, hidden_size=32,
            num_layers=2, attention_heads=4, feedforward_size=64,
            dropout=0.0, max_caption_length=MAXLEN, dtype=jnp.bfloat16))
    rng = np.random.RandomState(7)
    images = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    tokens = rng.randint(4, VOCAB, (2, MAXLEN)).astype(np.int32)
    tokens[:, 0] = 1
    batch = {"image": images, "caption_tokens": jnp.asarray(tokens),
             "noitpac_tokens": jnp.asarray(tokens[:, ::-1].copy()),
             "caption_lengths": jnp.full((2,), MAXLEN, jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    if kind == "beam":
        decoder = AutoRegressiveBeamSearch(eos_index=2, max_steps=MAXLEN,
                                           beam_size=BEAMS)
        args = ()
    else:
        decoder = AutoRegressiveNucleusSampling(eos_index=2,
                                                max_steps=MAXLEN,
                                                nucleus_size=0.9)
        args = (jax.random.PRNGKey(3),)

    # guard against a vacuous pass: the captioner must actually reach
    # cast_decode_params at trace time (not silently skip the cast)
    from unittest import mock

    from virtex_tpu.engine import captioner as captioner_mod
    from virtex_tpu.engine.captioner import cast_decode_params

    cast = make_caption_fn(model, decoder, sos_index=1)  # default True
    raw = make_caption_fn(model, decoder, sos_index=1, cast_params=False)
    with mock.patch.object(captioner_mod, "cast_decode_params",
                           wraps=cast_decode_params) as spy:
        cast_preds = np.asarray(cast(variables, images, *args))
    assert spy.call_count >= 1
    np.testing.assert_array_equal(cast_preds,
                                  np.asarray(raw(variables, images, *args)))

    # the cast itself: fp32 leaves under norms / output_bias stay fp32,
    # matmul weights go bf16, values truncate exactly once
    cv = cast_decode_params(variables, model)
    t = cv["params"]["textual"]
    l0 = t["transformer"]["layer_0"]
    assert l0["self_attn"]["query"]["kernel"].dtype == jnp.bfloat16
    assert l0["norm1"]["scale"].dtype == jnp.float32
    assert t["output_bias"].dtype == jnp.float32
    assert t["embedding"]["words"]["embedding"].dtype == jnp.bfloat16
    assert t["embedding"]["layer_norm"]["scale"].dtype == jnp.float32
    assert cv["batch_stats"] is variables["batch_stats"]
    np.testing.assert_array_equal(
        np.asarray(t["embedding"]["words"]["embedding"]),
        np.asarray(variables["params"]["textual"]["embedding"]["words"]
                   ["embedding"].astype(jnp.bfloat16)))

    # non-bf16-compute models must come back untouched (the guard lives
    # IN the helper — public callers get it too)
    fp32_model = ForwardCaptioningModel(
        visual=ResNetVisualBackbone("resnet18", dtype=jnp.float32),
        textual=TransformerTextualHead(
            visual_feature_size=512, vocab_size=VOCAB, hidden_size=32,
            num_layers=2, attention_heads=4, feedforward_size=64,
            dropout=0.0, max_caption_length=MAXLEN, dtype=jnp.float32))
    assert cast_decode_params(variables, fp32_model) is variables
    assert cast_decode_params(variables, object()) is variables
