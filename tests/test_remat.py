"""Activation rematerialisation knobs (MODEL.VISUAL.REMAT /
MODEL.TEXTUAL.REMAT): per-block / per-layer jax.checkpoint must be a pure
memory-for-FLOPs trade — identical param tree, identical forward, identical
gradients, decode path untouched."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from virtex_tpu.config import Config
from virtex_tpu.engine import TrainState, initialize_model, make_train_step
from virtex_tpu.factories import PretrainingModelFactory
from virtex_tpu.optim import build_optimizer, make_schedule

from tests.test_engine import tiny_batch

TINY = [
    "MODEL.NAME", "bicaptioning",
    "MODEL.VISUAL.NAME", "torchvision::resnet18",
    "MODEL.VISUAL.FEATURE_SIZE", 512,
    "MODEL.TEXTUAL.NAME", "transdec_postnorm::L2_H32_A4_F64",
    "DATA.VOCAB_SIZE", 40,
    "DATA.MAX_CAPTION_LENGTH", 8,
    "DTYPE", "float32",
]


def _models():
    plain = PretrainingModelFactory.from_config(Config(override_list=TINY))
    remat = PretrainingModelFactory.from_config(Config(override_list=TINY + [
        "MODEL.VISUAL.REMAT", True, "MODEL.TEXTUAL.REMAT", True]))
    return plain, remat


@pytest.mark.slow  # compile/mesh-heavy; full suite still runs it
def test_remat_is_pure_memory_trade():
    plain, remat = _models()
    batch = tiny_batch()
    v_plain = initialize_model(plain, batch, jax.random.PRNGKey(0))
    v_remat = initialize_model(remat, batch, jax.random.PRNGKey(0))
    # identical param tree AND identical init values (same rng paths)
    assert (jax.tree_util.tree_structure(v_plain)
            == jax.tree_util.tree_structure(v_remat))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), v_plain, v_remat)

    # one full train step each: loss, grads, new params, BN stats agree
    def run(model, variables):
        tx = build_optimizer(variables["params"], "sgd",
                             make_schedule("none", 100, 0), lr=0.05,
                             cnn_lr=0.05, weight_decay=1e-4,
                             use_lookahead=False)
        state = TrainState.create(variables["params"],
                                  variables["batch_stats"], tx)
        step = make_train_step(model, tx, donate=False)
        return step(state, batch, jax.random.PRNGKey(1))

    s1, m1 = run(plain, v_plain)
    s2, m2 = run(remat, v_remat)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s1.params, s2.params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s1.batch_stats, s2.batch_stats)


def test_remat_decode_path_untouched():
    """init_decode / decode_step are NOT wrapped in remat (only training
    __call__ is) — the KV-cache decode must produce identical tokens."""
    from virtex_tpu.engine.captioner import make_caption_fn
    from virtex_tpu.factories import CaptionDecoderFactory

    plain, remat = _models()
    batch = tiny_batch()
    variables = initialize_model(plain, batch, jax.random.PRNGKey(0))
    decoder = CaptionDecoderFactory.create("beam_search", eos_index=2,
                                           beam_size=2, max_steps=4)
    images = batch["image"]
    p1 = make_caption_fn(plain, decoder)(variables, images)
    p2 = make_caption_fn(remat, decoder)(variables, images)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
