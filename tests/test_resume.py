"""Checkpoint-resume determinism: training N steps straight must equal
training k steps → checkpoint → restore → N−k steps, bit-for-bit (pure
schedules + saved optimizer state + step-keyed RNG folding)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow  # compile/mesh-heavy; full suite still runs it
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


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 virtual devices")
@pytest.mark.slow  # compile/mesh-heavy; full suite still runs it
def test_tp_sharded_save_restore(tmp_path):
    """TP=2 on the 8-device CPU mesh: checkpoint sharded params without a
    host gather, restore into the sharded template, shardings preserved."""
    from virtex_tpu.parallel import create_mesh, shard_batch

    mesh = create_mesh(data=4, model=2)
    model, tx, state, batch = build()
    with mesh:
        sharded_batch = shard_batch(
            {k: np.asarray(v) for k, v in batch.items()}, mesh)
        variables = initialize_model(model, sharded_batch,
                                     jax.random.PRNGKey(0), mesh)
        tx = build_optimizer(variables["params"], "sgd",
                             make_schedule("none", 10, 0), lr=0.01,
                             cnn_lr=0.01, use_lookahead=True)
        state = TrainState.create(variables["params"],
                                  variables["batch_stats"], tx)
        step = make_train_step(model, tx, mesh, donate=False)
        state, _ = step(state, sharded_batch, jax.random.PRNGKey(1))

        # some textual-head param must actually be TP-sharded
        qk = state.params["textual"]["transformer"]["layer_0"][
            "self_attn"]["query"]["kernel"]
        assert not qk.sharding.is_fully_replicated

        mgr = CheckpointManager(str(tmp_path / "tp_ck"), keep_recent=2,
                                async_save=False)
        mgr.step(state, 1, loader_state={"items_consumed": 42})

        class FakeLoader:
            def load_state_dict(self, sd):
                self.restored = sd

        fake = FakeLoader()
        restored, it = mgr.load(mgr.latest(), state, loader=fake)
        assert it == 1
        assert fake.restored == {"items_consumed": 42}
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            jax.device_get(state.params), jax.device_get(restored.params))
        rqk = restored.params["textual"]["transformer"]["layer_0"][
            "self_attn"]["query"]["kernel"]
        assert rqk.sharding == qk.sharding
        # the restored sharded state steps forward
        restored, m = step(restored, sharded_batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 virtual devices")
@pytest.mark.slow  # compile/mesh-heavy; full suite still runs it
def test_restore_across_mesh_shapes(tmp_path):
    """Elasticity: a checkpoint written under one mesh layout restores into
    a template laid out on a DIFFERENT mesh (orbax reshards to the
    template's shardings) — scale-up/down between runs just works."""
    from virtex_tpu.engine import place_state
    from virtex_tpu.parallel import create_mesh

    model, tx, state, batch = build()

    mesh_a = create_mesh(data=8, model=1)
    state_a = place_state(state, mesh_a)
    mgr = CheckpointManager(str(tmp_path / "ck"), keep_recent=2,
                            async_save=False)
    mgr.step(state_a, 5)

    mesh_b = create_mesh(data=4, model=2)
    template_b = place_state(state, mesh_b)
    restored, it = mgr.load(mgr.latest(), template_b)
    assert it == 5
    qk = restored.params["textual"]["transformer"]["layer_0"][
        "self_attn"]["query"]["kernel"]
    assert qk.sharding == template_b.params["textual"]["transformer"][
        "layer_0"]["self_attn"]["query"]["kernel"].sharding
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.device_get(state.params), jax.device_get(restored.params))


def test_old_format_checkpoint_still_loads(tmp_path):
    """Round-1 checkpoints have no 'loader' entry; load() must sniff and
    skip it."""
    import orbax.checkpoint as ocp

    model, tx, state, batch = build()
    path = str(tmp_path / "ck" / "checkpoint_3")
    writer = ocp.StandardCheckpointer()
    writer.save(path, {"state": jax.device_get(state),
                       "iteration": np.asarray(3, np.int32)})
    writer.close()  # this orbax finalizes (tmp->final rename) lazily
    mgr = CheckpointManager(str(tmp_path / "ck"), keep_recent=2)
    restored, it = mgr.load(path, state)
    assert it == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.device_get(state.params), jax.device_get(restored.params))
