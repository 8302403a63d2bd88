"""Engine tests: jitted train step reduces loss (tiny overfit), eval step,
checkpoint save/resume round-trip, pruning + best tracking."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virtex_tpu.engine import (
    CheckpointManager,
    TrainState,
    initialize_model,
    load_checkpoint,
    make_eval_step,
    make_train_step,
)
from virtex_tpu.models import ForwardCaptioningModel
from virtex_tpu.modules import ResNetVisualBackbone, TransformerTextualHead
from virtex_tpu.optim import build_optimizer, make_schedule

VOCAB = 40


def tiny_model():
    return ForwardCaptioningModel(
        visual=ResNetVisualBackbone("resnet18", dtype=jnp.float32),
        textual=TransformerTextualHead(
            visual_feature_size=512, vocab_size=VOCAB, hidden_size=32,
            num_layers=1, attention_heads=4, feedforward_size=64,
            dropout=0.0, max_caption_length=8, dtype=jnp.float32))


def tiny_batch():
    rng = np.random.RandomState(0)
    tokens = rng.randint(4, VOCAB, (4, 6)).astype(np.int32)
    tokens[:, 0] = 1
    return {
        "image": jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32),
        "caption_tokens": jnp.asarray(tokens),
        "noitpac_tokens": jnp.asarray(tokens[:, ::-1].copy()),
        "caption_lengths": jnp.full((4,), 6, jnp.int32),
    }


@pytest.fixture(scope="module")
def trained():
    model = tiny_model()
    batch = tiny_batch()
    variables = initialize_model(model, batch, jax.random.PRNGKey(0))
    tx = build_optimizer(variables["params"], "sgd",
                         make_schedule("none", 100, 0), lr=0.05, cnn_lr=0.05,
                         weight_decay=0.0, use_lookahead=True, lookahead_k=5)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = make_train_step(model, tx, donate=False)
    losses = []
    rng = jax.random.PRNGKey(1)
    for _ in range(12):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    return model, tx, state, batch, losses


def test_train_loss_decreases(trained):
    _, _, state, _, losses = trained
    assert losses[-1] < losses[0] * 0.9
    assert int(state.step) == 12


def test_eval_step(trained):
    model, _, state, batch, _ = trained
    eval_step = make_eval_step(model)
    metrics = eval_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tmp_path, trained):
    model, tx, state, batch, _ = trained
    mgr = CheckpointManager(str(tmp_path / "ckpts"), keep_recent=2)
    mgr.step(state, 12, metric=1.0)

    # fresh template with the same structure
    variables = initialize_model(model, batch, jax.random.PRNGKey(42))
    fresh = TrainState.create(variables["params"], variables["batch_stats"], tx)
    restored, it = mgr.load(mgr.latest(), fresh)
    assert it == 12
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6),
        state.params, restored.params)
    # eval on restored state gives identical loss
    eval_step = make_eval_step(model)
    np.testing.assert_allclose(
        float(eval_step(state, batch)["loss"]),
        float(eval_step(restored, batch)["loss"]), rtol=1e-6)


def test_checkpoint_prune_and_best(tmp_path, trained):
    model, tx, state, batch, _ = trained
    mgr = CheckpointManager(str(tmp_path / "ck2"), keep_recent=2)
    mgr.step(state, 1, metric=0.5)
    mgr.step(state, 2, metric=0.9)
    mgr.step(state, 3, metric=0.7)
    mgr.wait_until_finished()  # commit the async save + deferred prune
    entries = sorted(os.listdir(str(tmp_path / "ck2")))
    assert "checkpoint_1" not in entries  # pruned
    assert {"checkpoint_2", "checkpoint_3", "checkpoint_best"} <= set(entries)
    assert mgr.best_metric == 0.9

    restored, it = load_checkpoint(
        str(tmp_path / "ck2" / "checkpoint_best"), state)
    assert it in (1, 2, 3)


def test_partial_restore_from_pretraining_checkpoint(tmp_path, trained):
    """The real transfer flow: a PRETRAINING checkpoint (params
    {visual, textual}) restored into a downstream template
    ({visual, fc}) — the template's extra/missing keys must not break the
    partial load (a strict tree zip would raise on the key mismatch)."""
    import optax

    from virtex_tpu.engine import apply_backbone_weight_init
    from virtex_tpu.factories import VisualBackboneFactory
    from virtex_tpu.models.downstream import LinearClassifierModel

    _, _, state, _, _ = trained  # ForwardCaptioningModel: visual+textual
    mgr = CheckpointManager(str(tmp_path / "pre"), keep_recent=1)
    mgr.step(state, 5)
    mgr.wait_until_finished()

    visual = VisualBackboneFactory.create("torchvision::resnet18",
                                          frozen=True, dtype=jnp.float32)
    probe = LinearClassifierModel(visual=visual, num_classes=7)
    sample = {"image": jnp.zeros((1, 64, 64, 3)),
              "label": jnp.zeros((1,), jnp.int32)}
    fresh = initialize_model(probe, sample, jax.random.PRNGKey(3))
    out = apply_backbone_weight_init(fresh, "virtex", mgr.latest(),
                                     "resnet18")
    got = out["params"]["visual"]["cnn"]["conv1"]["kernel"]
    want = state.params["visual"]["cnn"]["conv1"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    # the downstream head keeps its fresh init
    assert "fc" in out["params"]


def test_best_metric_survives_resume(tmp_path, trained):
    """After resume, a worse metric must NOT overwrite checkpoint_best
    (the rolling-best value rides in the checkpoint)."""
    _, _, state, _, _ = trained
    d = str(tmp_path / "ck4")
    mgr = CheckpointManager(d, keep_recent=5)
    mgr.step(state, 1, metric=0.9)
    mgr.wait_until_finished()

    mgr2 = CheckpointManager(d, keep_recent=5)
    _, it = mgr2.load(mgr2.latest(), state)
    assert it == 1
    assert mgr2.best_metric == pytest.approx(0.9)
    mgr2.step(state, 2, metric=0.5)  # worse — must not become best
    mgr2.wait_until_finished()
    _, best_it = load_checkpoint(os.path.join(d, "checkpoint_best"), state)
    assert best_it == 1


def test_best_checkpoint_healed_after_crash_before_flush(tmp_path, trained):
    """Preemption between an async save and its deferred best-copy leaves
    checkpoint_best one generation stale while the saved best_metric says
    otherwise; load() must re-copy from the recorded best iteration."""
    import shutil

    _, _, state, _, _ = trained
    d = str(tmp_path / "ck5")
    mgr = CheckpointManager(d, keep_recent=5)
    mgr.step(state, 1, metric=0.7)
    mgr.step(state, 2, metric=0.9)   # flushes iter-1 bookkeeping only
    mgr._ckpt.wait_until_finished()  # iter-2 save commits ...
    # ... and the process "dies" before the deferred flush: checkpoint_best
    # still holds iteration 1 (simulate by dropping the pending flush).
    mgr._pending = None
    _, held = load_checkpoint(os.path.join(d, "checkpoint_best"), state)
    assert held == 1

    mgr2 = CheckpointManager(d, keep_recent=5)
    _, it = mgr2.load(mgr2.latest(), state)
    assert it == 2 and mgr2.best_metric == pytest.approx(0.9)
    _, best_it = load_checkpoint(os.path.join(d, "checkpoint_best"), state)
    assert best_it == 2  # healed from the recorded best iteration
    shutil.rmtree(d, ignore_errors=True)


def test_del_flushes_pending_best(tmp_path, trained):
    # A caller that never calls wait_until_finished (e.g. a script that
    # simply returns after its last step) still gets the rolling-best copy
    # and the final prune when the manager is garbage-collected.
    _, _, state, _, _ = trained
    mgr = CheckpointManager(str(tmp_path / "ck3"), keep_recent=2)
    mgr.step(state, 7, metric=0.8)
    mgr.__del__()
    entries = set(os.listdir(str(tmp_path / "ck3")))
    assert {"checkpoint_7", "checkpoint_best"} <= entries


def test_apply_backbone_weight_init_modes(tmp_path):
    """The shared --weight-init helper (engine/checkpointing.py): 'virtex'
    restores the visual subtree from one of our checkpoints; 'random'
    leaves the fresh init; unknown-without-checkpoint only warns."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from virtex_tpu.engine import (
        CheckpointManager,
        TrainState,
        apply_backbone_weight_init,
        initialize_model,
    )
    from virtex_tpu.factories import VisualBackboneFactory
    from virtex_tpu.models.downstream import LinearClassifierModel
    import optax

    visual = VisualBackboneFactory.create("torchvision::resnet18",
                                          frozen=True, dtype=jnp.float32)
    model = LinearClassifierModel(visual=visual, num_classes=7)
    sample = {"image": jnp.zeros((1, 64, 64, 3)),
              "label": jnp.zeros((1,), jnp.int32)}
    variables = initialize_model(model, sample, jax.random.PRNGKey(0))

    # Save a "pretraining" checkpoint whose params differ from fresh init.
    bumped = jax.tree.map(lambda x: x + 1.0, variables["params"])
    state = TrainState.create(bumped, variables["batch_stats"],
                              optax.sgd(0.1))
    mgr = CheckpointManager(str(tmp_path), keep_recent=1)
    mgr.step(state, 1)
    mgr.wait_until_finished()
    path = mgr.latest()

    fresh = initialize_model(model, sample, jax.random.PRNGKey(0))
    out = apply_backbone_weight_init(fresh, "virtex", path, "resnet18")
    got = out["params"]["visual"]["cnn"]["conv1"]["kernel"]
    want = bumped["visual"]["cnn"]["conv1"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    fresh2 = initialize_model(model, sample, jax.random.PRNGKey(0))
    before = np.asarray(fresh2["params"]["visual"]["cnn"]["conv1"]["kernel"])
    out2 = apply_backbone_weight_init(fresh2, "random", None, "resnet18")
    np.testing.assert_allclose(
        np.asarray(out2["params"]["visual"]["cnn"]["conv1"]["kernel"]),
        before)
    # no checkpoint for a checkpoint-requiring mode: warn, keep init
    out3 = apply_backbone_weight_init(fresh2, "virtex", None, "resnet18")
    np.testing.assert_allclose(
        np.asarray(out3["params"]["visual"]["cnn"]["conv1"]["kernel"]),
        before)


def test_partial_restore_rejects_shape_mismatch(tmp_path, trained):
    """A checkpoint leaf whose shape differs from the template must be
    treated as missing (keep the template's init), not silently accepted
    to explode later inside model.apply."""
    from virtex_tpu.engine.checkpointing import load_model_variables

    _, _, state, _, _ = trained
    mgr = CheckpointManager(str(tmp_path / "shp"), keep_recent=1)
    mgr.step(state, 1)
    mgr.wait_until_finished()

    template = {"params": jax.tree_util.tree_map(lambda x: x, state.params),
                "batch_stats": state.batch_stats}
    # Perturb one template leaf to a different shape: the checkpoint's
    # (old-shape) value must be skipped and this init kept.
    new_kernel = jnp.ones((3, 3, 3, 64), jnp.float32)
    template["params"]["visual"]["cnn"]["conv1"]["kernel"] = new_kernel
    out = load_model_variables(mgr.latest(), template)
    got = out["params"]["visual"]["cnn"]["conv1"]["kernel"]
    assert got.shape == new_kernel.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(new_kernel))
    # an untouched leaf still restores from the checkpoint
    np.testing.assert_allclose(
        np.asarray(out["params"]["visual"]["cnn"]["bn1"]["scale"]),
        np.asarray(state.params["visual"]["cnn"]["bn1"]["scale"]),
        rtol=1e-6)
