"""Gradient accumulation (OPTIM.GRAD_ACCUM_STEPS / make_train_step's
accum_steps): one call = one reference iteration; micro-batches are scanned
in-step, gradients averaged before the single optimizer update, BN stats
updated sequentially per micro-batch (the accumulation analogue of the
reference's per-GPU BN — micro-batch-synced stats, EMA advancing per
micro-step; see engine/trainer.py for the exact semantics). The reference
has no accumulation — this is the TPU-native way to run its global-256
recipe on fewer chips."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virtex_tpu.engine import TrainState, initialize_model, make_train_step
from virtex_tpu.optim import build_optimizer, make_schedule
from virtex_tpu.parallel import create_mesh, shard_batch

from tests.test_engine import tiny_batch, tiny_model

ACCUM = 2


def _setup():
    model = tiny_model()
    batch = tiny_batch()  # leaves (4, ...)
    variables = initialize_model(model, batch, jax.random.PRNGKey(0))
    tx = build_optimizer(variables["params"], "sgd",
                         make_schedule("none", 100, 0), lr=0.05, cnn_lr=0.05,
                         weight_decay=1e-4, use_lookahead=True, lookahead_k=5)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    micro = {k: v.reshape((ACCUM, v.shape[0] // ACCUM) + v.shape[1:])
             for k, v in batch.items()}
    return model, tx, state, batch, micro


def _manual_accum_step(model, tx, state, micro, rng):
    """Eager re-implementation of the scanned accumulation step."""
    step_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(params, stats, mb, mb_rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": stats}, mb, train=True,
            rngs={"dropout": mb_rng}, mutable=["batch_stats"])
        return out["loss"], mutated["batch_stats"]

    stats = state.batch_stats
    gsum = jax.tree.map(jnp.zeros_like, state.params)
    losses = []
    for i in range(ACCUM):
        mb = {k: v[i] for k, v in micro.items()}
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, stats, mb, jax.random.fold_in(step_rng, i))
        gsum = jax.tree.map(jnp.add, gsum, grads)
        losses.append(float(loss))
    grads = jax.tree.map(lambda g: g / ACCUM, gsum)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    import optax
    params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=params,
                         batch_stats=stats, opt_state=opt_state), losses


def _assert_tree_close(a, b, **kw):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), **kw), a, b)


@pytest.mark.slow  # compile/mesh-heavy; full suite still runs it
def test_accum_matches_sequential_microsteps():
    """The jitted scan must equal an eager per-micro-batch loop: same rng
    folds, summed-then-averaged grads, sequential BN stats. Tolerances allow
    the fp32 reassociation between the fused jit program and the op-by-op
    eager loop (observed max |delta| ~7e-6 through R18 fwd+bwd+update); a
    semantic divergence (wrong rng fold, missed micro-batch, stats from the
    wrong pass) moves params by orders of magnitude more."""
    model, tx, state, _, micro = _setup()
    rng = jax.random.PRNGKey(7)

    step = make_train_step(model, tx, donate=False, accum_steps=ACCUM)
    got, metrics = step(state, micro, rng)
    want, losses = _manual_accum_step(model, tx, state, micro, rng)

    _assert_tree_close(got.params, want.params, rtol=2e-3, atol=2e-5)
    _assert_tree_close(got.batch_stats, want.batch_stats, rtol=2e-3,
                       atol=2e-5)
    assert int(got.step) == 1
    np.testing.assert_allclose(float(metrics["loss"]), np.mean(losses),
                               rtol=1e-5)


def test_accum_bn_stats_are_per_microbatch():
    """Accumulated BN stats come from sequential micro-batch updates — NOT
    from one pass over the flat global batch (the two must differ, exactly
    like per-GPU BN vs global-batch BN differ in the reference)."""
    model, tx, state, batch, micro = _setup()
    rng = jax.random.PRNGKey(7)

    accum_state, _ = make_train_step(model, tx, donate=False,
                                     accum_steps=ACCUM)(state, micro, rng)
    flat_state, _ = make_train_step(model, tx, donate=False)(state, batch,
                                                             rng)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        accum_state.batch_stats, flat_state.batch_stats))
    # Meaningfully different (two EMA applications + within-micro variance),
    # not mere float reassociation noise (~1e-6).
    assert max(diffs) > 1e-4


def test_accum_under_mesh_matches_single_device():
    """dp2 mesh with micro-layout sharding == no-mesh accumulation (each
    micro-batch of 2 shards 1-per-device over the data axis)."""
    model, tx, state, _, micro = _setup()
    rng = jax.random.PRNGKey(7)

    want, _ = make_train_step(model, tx, donate=False,
                              accum_steps=ACCUM)(state, micro, rng)

    mesh = create_mesh(data=2, model=1, devices=jax.devices()[:2])
    with mesh:
        sharded = shard_batch(micro, mesh, micro=True)
        from virtex_tpu.engine import place_state
        placed = place_state(state, mesh)
        step = make_train_step(model, tx, mesh, donate=False,
                               accum_steps=ACCUM)
        got, metrics = step(placed, sharded, rng)

    _assert_tree_close(got.params, want.params, rtol=2e-3, atol=2e-5)
    # BN stats reduce over a different tree (per-device partials + psum);
    # with 1 image/device the reassociation reaches ~6e-5 absolute — still
    # orders below the per-shard-BN failure mode this guards against.
    _assert_tree_close(got.batch_stats, want.batch_stats, rtol=2e-3,
                       atol=2e-4)
    assert np.isfinite(float(metrics["loss"]))


def test_accum_steps_validation():
    model, tx, state, _, _ = _setup()
    with pytest.raises(ValueError):
        make_train_step(model, tx, accum_steps=0)
