"""Pretext-task model tests: loss computation, loss components, vectorised
label-set loss vs a python-loop reference (classification.py:82-93)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virtex_tpu.models import (
    BidirectionalCaptioningModel,
    ForwardCaptioningModel,
    MaskedLMModel,
    TokenClassificationModel,
    instance_label_set_loss,
    token_cross_entropy,
)
from virtex_tpu.modules import (
    LinearTextualHead,
    ResNetVisualBackbone,
    TransformerTextualHead,
)

VOCAB = 50


def tiny_visual():
    return ResNetVisualBackbone("resnet18", dtype=jnp.float32)


def tiny_textual(**kw):
    defaults = dict(visual_feature_size=512, vocab_size=VOCAB, hidden_size=32,
                    num_layers=1, attention_heads=4, feedforward_size=64,
                    dropout=0.0, max_caption_length=8, dtype=jnp.float32)
    defaults.update(kw)
    return TransformerTextualHead(**defaults)


def caption_batch(B=2, T=6):
    rng = np.random.RandomState(0)
    tokens = rng.randint(4, VOCAB, (B, T)).astype(np.int32)
    tokens[:, 0] = 1
    tokens[0, -1] = 0  # padding
    return {
        "image": jnp.asarray(rng.rand(B, 32, 32, 3), jnp.float32),
        "caption_tokens": jnp.asarray(tokens),
        "noitpac_tokens": jnp.asarray(tokens[:, ::-1].copy()),
        "caption_lengths": jnp.asarray([T - 1, T], jnp.int32),
    }


def test_token_cross_entropy_ignores_padding():
    logits = jnp.zeros((1, 3, 4))
    targets = jnp.array([[1, 2, 0]])
    # uniform logits → nll = log(4) per counted token
    loss = token_cross_entropy(logits, targets, ignore_index=0)
    np.testing.assert_allclose(float(loss), np.log(4), rtol=1e-6)


def test_bicaptioning_loss_components():
    model = BidirectionalCaptioningModel(
        visual=tiny_visual(), textual=tiny_textual(bidirectional=True),
        caption_backward=True)
    batch = caption_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    comps = out["loss_components"]
    assert set(comps) == {"captioning_forward", "captioning_backward"}
    np.testing.assert_allclose(
        float(out["loss"]),
        float(comps["captioning_forward"] + comps["captioning_backward"]),
        rtol=1e-6)
    assert np.isfinite(float(out["loss"]))
    assert out["predictions"].shape == batch["caption_tokens"].shape


def test_forward_captioning_single_component():
    model = ForwardCaptioningModel(
        visual=tiny_visual(), textual=tiny_textual())
    batch = caption_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert set(out["loss_components"]) == {"captioning_forward"}


def test_masked_lm_loss_only_at_masked_positions():
    model = MaskedLMModel(
        visual=tiny_visual(),
        textual=tiny_textual(mask_future_positions=False))
    batch = caption_batch()
    labels = np.zeros((2, 6), np.int32)
    labels[0, 2] = 7  # one masked position
    batch["masked_labels"] = jnp.asarray(labels)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert np.isfinite(float(out["loss"]))
    preds = np.asarray(out["predictions"])
    assert (preds[labels == 0] == 0).all()


def test_instance_label_set_loss_matches_loop():
    rng = np.random.RandomState(1)
    B, V, L = 4, 20, 5
    logits = jnp.asarray(rng.randn(B, V), jnp.float32)
    labels = rng.randint(0, V, (B, L)).astype(np.int32)
    labels[2, :] = [3, 3, 7, 0, 1]  # duplicates + ignored specials
    ignore = (0, 1, 2)

    vec = float(instance_label_set_loss(logits, jnp.asarray(labels), ignore))

    # python-loop reference semantics (classification.py:82-93)
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    per = []
    for i in range(B):
        uniq = {c for c in labels[i] if c not in ignore}
        if uniq:
            per.append(-np.mean([logp[i, c] for c in uniq]))
    np.testing.assert_allclose(vec, np.mean(per), rtol=1e-5)


def test_token_classification_model():
    model = TokenClassificationModel(
        visual=tiny_visual(),
        textual=LinearTextualHead(visual_feature_size=512, vocab_size=VOCAB),
        ignore_indices=(0, 1, 2, 3))
    batch = caption_batch()
    batch["labels"] = batch["caption_tokens"]
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert np.isfinite(float(out["loss"]))
    assert out["predictions"].shape == (2, 10)  # top-10


def test_captioning_grads_flow():
    model = ForwardCaptioningModel(visual=tiny_visual(),
                                   textual=tiny_textual())
    batch = caption_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return out[0]["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = float(optax_global_norm(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def optax_global_norm(tree):
    import optax
    return optax.global_norm(tree)


def test_token_cross_entropy_custom_vjp_matches_autodiff():
    """The hand-written CE backward (bf16 d_logits, no f32 (B,T,V)
    materialisation) must equal autodiff of the same formula."""
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(2, 5, 11), jnp.float32)
    targets = jnp.asarray(rng.randint(0, 11, (2, 5)), jnp.int32)
    targets = targets.at[0, -1].set(0)

    def reference(lg):
        lg = lg.astype(jnp.float32)
        lse = jax.nn.logsumexp(lg, axis=-1)
        tgt = jnp.take_along_axis(lg, targets[..., None], axis=-1)[..., 0]
        mask = (targets != 0).astype(jnp.float32)
        return jnp.sum((lse - tgt) * mask) / jnp.maximum(mask.sum(), 1.0)

    loss = token_cross_entropy(logits, targets, ignore_index=0)
    np.testing.assert_allclose(float(loss), float(reference(logits)),
                               rtol=1e-6)
    g_custom = jax.grad(
        lambda lg: token_cross_entropy(lg, targets, 0))(logits)
    g_ref = jax.grad(reference)(logits)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)
    # bf16 logits keep a bf16 gradient (the whole point of the custom VJP).
    g_bf16 = jax.grad(lambda lg: token_cross_entropy(
        lg, targets, 0))(logits.astype(jnp.bfloat16))
    assert g_bf16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(g_bf16, np.float32),
                               np.asarray(g_ref), rtol=0.05, atol=3e-3)
