"""Checkpoint-resume determinism: training N steps straight must equal
training k steps → checkpoint → restore → N−k steps, bit-for-bit (pure
schedules + saved optimizer state + step-keyed RNG folding)."""
import jax
import jax.numpy as jnp
import numpy as np

from virtex_tpu.engine import (
    CheckpointManager,
    TrainState,
    initialize_model,
    make_train_step,
)
from virtex_tpu.models import ForwardCaptioningModel
from virtex_tpu.modules import ResNetVisualBackbone, TransformerTextualHead
from virtex_tpu.optim import build_optimizer, make_schedule


def build():
    model = ForwardCaptioningModel(
        visual=ResNetVisualBackbone("resnet18", dtype=jnp.float32),
        textual=TransformerTextualHead(
            visual_feature_size=512, vocab_size=40, hidden_size=32,
            num_layers=1, attention_heads=4, feedforward_size=64,
            dropout=0.1, max_caption_length=8, dtype=jnp.float32))
    rng = np.random.RandomState(0)
    tokens = rng.randint(4, 40, (4, 8)).astype(np.int32)
    tokens[:, 0] = 1
    batch = {"image": jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32),
             "caption_tokens": jnp.asarray(tokens),
             "noitpac_tokens": jnp.asarray(tokens[:, ::-1].copy()),
             "caption_lengths": jnp.full((4,), 8, jnp.int32)}
    variables = initialize_model(model, batch, jax.random.PRNGKey(0))
    tx = build_optimizer(variables["params"], "sgd",
                         make_schedule("cosine", 100, 5), lr=0.05,
                         cnn_lr=0.05, use_lookahead=True, lookahead_k=3)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    return model, tx, state, batch


def test_resume_is_bit_exact(tmp_path):
    model, tx, state, batch = build()
    step = make_train_step(model, tx, donate=False)
    rng = jax.random.PRNGKey(7)

    # straight run: 5 steps
    s_direct = state
    for _ in range(5):
        s_direct, _ = step(s_direct, batch, rng)

    # interrupted run: 2 steps → checkpoint → restore → 3 steps
    s_part = state
    for _ in range(2):
        s_part, _ = step(s_part, batch, rng)
    mgr = CheckpointManager(str(tmp_path / "ck"), keep_recent=2)
    mgr.step(s_part, 2)
    restored, it = mgr.load(mgr.latest(), state)
    assert it == 2
    for _ in range(3):
        restored, _ = step(restored, batch, rng)

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s_direct.params, restored.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s_direct.opt_state, restored.opt_state)
