"""Optimizer-stack tests: schedule golden values, no-decay/dual-LR masks,
lookahead semantics vs a step-by-step numpy simulation of the reference
(lookahead.py:82-102), torch-SGD equivalence of the sgd chain."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from virtex_tpu.optim import (
    build_optimizer,
    cnn_mask,
    decay_mask,
    lookahead,
    make_schedule,
)


def test_schedule_warmup_and_shapes():
    for name in ["none", "multistep", "linear", "cosine"]:
        s = make_schedule(name, total_steps=100, warmup_steps=10,
                          milestones=[50, 80])
        # During warmup: linear ramp.
        np.testing.assert_allclose(float(s(5)), 0.5, rtol=1e-6)
        assert float(s(10)) == pytest.approx(1.0)


def test_cosine_is_cos_squared():
    s = make_schedule("cosine", total_steps=110, warmup_steps=10)
    # halfway through decay: cos²(π/4) = 0.5
    np.testing.assert_allclose(float(s(60)), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(s(110)), 0.0, atol=1e-6)


def test_linear_decay():
    s = make_schedule("linear", total_steps=110, warmup_steps=10)
    np.testing.assert_allclose(float(s(60)), 0.5, atol=1e-6)


def test_multistep():
    s = make_schedule("multistep", total_steps=100, warmup_steps=0,
                      milestones=[50, 80], gamma=0.1)
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(50)) == pytest.approx(0.1)
    assert float(s(90)) == pytest.approx(0.01, rel=1e-5)


def make_params():
    return {
        "visual": {"cnn": {"conv1": {"kernel": jnp.ones((2, 2))}}},
        "textual": {
            "transformer": {
                "layer_0": {
                    "self_attn": {
                        "query": {"kernel": jnp.ones((2, 2)),
                                  "bias": jnp.zeros((2,))},
                    },
                    "norm1": {"scale": jnp.ones((2,)),
                              "bias": jnp.zeros((2,))},
                },
            },
            "embedding": {"layer_norm": {"scale": jnp.ones((2,)),
                                         "bias": jnp.zeros((2,))}},
            "visual_projection": {"kernel": jnp.ones((2, 2)),
                                  "bias": jnp.zeros((2,))},
        },
    }


def test_decay_and_cnn_masks():
    params = make_params()
    dm = decay_mask(params, r".*textual.(embedding|transformer).*(norm.*|bias)")
    # CNN conv kernel: decays.
    assert dm["visual"]["cnn"]["conv1"]["kernel"]
    # transformer norm scale/bias and attention bias: no decay.
    t = dm["textual"]["transformer"]["layer_0"]
    assert not t["norm1"]["scale"] and not t["norm1"]["bias"]
    assert not t["self_attn"]["query"]["bias"]
    assert t["self_attn"]["query"]["kernel"]  # attention kernel decays
    assert not dm["textual"]["embedding"]["layer_norm"]["scale"]
    # visual_projection bias is textual but matches neither embedding nor
    # transformer prefix → decays (same as reference regex).
    assert dm["textual"]["visual_projection"]["kernel"]

    cm = cnn_mask(params)
    assert cm["visual"]["cnn"]["conv1"]["kernel"]
    assert not cm["textual"]["visual_projection"]["kernel"]


def test_lookahead_matches_reference_simulation():
    """5 fast steps of SGD then slow ← slow + α(fast−slow)."""
    k, alpha, lr = 3, 0.5, 0.1
    tx = optax.chain(optax.sgd(lr), lookahead(k=k, alpha=alpha))
    params = {"w": jnp.asarray(1.0)}
    state = tx.init(params)

    # numpy simulation
    fast, slow = 1.0, 1.0
    grads_seq = [0.5, -0.2, 0.3, 0.1, 0.4, -0.3, 0.2]
    for i, g in enumerate(grads_seq):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
        fast = fast - lr * g
        if (i + 1) % k == 0:
            fast = slow + alpha * (fast - slow)
            slow = fast
        np.testing.assert_allclose(float(params["w"]), fast, rtol=1e-6,
                                   err_msg=f"step {i}")


def test_lookahead_slow_params_extraction():
    """Eval-on-slow-weights capability (reference lookahead.py:104-129):
    lookahead_slow_params pulls the slow copy out of a live optimizer state
    and it tracks the reference update rule."""
    from virtex_tpu.optim.optimizer import lookahead_slow_params

    k, alpha, lr = 3, 0.5, 0.1
    tx = optax.chain(optax.sgd(lr), lookahead(k=k, alpha=alpha))
    params = {"w": jnp.asarray(1.0)}
    state = tx.init(params)

    fast, slow = 1.0, 1.0
    for i, g in enumerate([0.5, -0.2, 0.3, 0.1]):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
        fast = fast - lr * g
        if (i + 1) % k == 0:
            fast = slow + alpha * (fast - slow)
            slow = fast
        slow_tree = lookahead_slow_params(state)
        assert slow_tree is not None
        np.testing.assert_allclose(float(slow_tree["w"]), slow, rtol=1e-6,
                                   err_msg=f"step {i}")
    # mid-cycle: slow copy differs from the live fast params
    assert float(slow_tree["w"]) != float(params["w"])

    # chains without lookahead fall back to the given params
    tx2 = optax.chain(optax.sgd(lr))
    state2 = tx2.init(params)
    assert lookahead_slow_params(state2, fallback_params=params) is params


def test_full_chain_sgd_matches_torch_semantics():
    """clip → wd-coupled sgd+momentum → dual-lr: simulate torch param groups."""
    import torch

    params = make_params()
    sched = make_schedule("none", 100, 0)
    tx = build_optimizer(params, "sgd", sched, lr=0.01, cnn_lr=0.2,
                         weight_decay=0.1, momentum=0.9, clip_norm=1e9,
                         use_lookahead=False)
    state = tx.init(params)

    # torch equivalents: one cnn tensor (decay, lr 0.2) and one attention
    # kernel (decay, lr 0.01), one norm scale (no decay, lr 0.01)
    t_cnn = torch.ones(2, 2, requires_grad=True)
    t_qk = torch.ones(2, 2, requires_grad=True)
    t_ns = torch.ones(2, requires_grad=True)
    opt = torch.optim.SGD(
        [{"params": [t_cnn], "lr": 0.2, "weight_decay": 0.1},
         {"params": [t_qk], "lr": 0.01, "weight_decay": 0.1},
         {"params": [t_ns], "lr": 0.01, "weight_decay": 0.0}],
        momentum=0.9)

    for step in range(4):
        g = 0.1 * (step + 1)
        grads = jax.tree.map(lambda p: jnp.full_like(p, g), params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)

        opt.zero_grad()
        for t in (t_cnn, t_qk, t_ns):
            t.grad = torch.full_like(t, g)
        opt.step()

    np.testing.assert_allclose(
        np.asarray(params["visual"]["cnn"]["conv1"]["kernel"]),
        t_cnn.detach().numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params["textual"]["transformer"]["layer_0"]["self_attn"]
                   ["query"]["kernel"]),
        t_qk.detach().numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params["textual"]["transformer"]["layer_0"]["norm1"]
                   ["scale"]),
        t_ns.detach().numpy(), rtol=1e-5)


def test_frozen_pattern_zeroes_all_updates():
    """A frozen backbone must receive NO updates at all — stop_gradient
    zeroes the grads, but weight decay alone would still shrink the
    params every step (the reference's requires_grad=False params are
    skipped by torch SGD entirely)."""
    params = make_params()
    sched = make_schedule("none", 100, 0)
    tx = build_optimizer(params, "sgd", sched, lr=0.01, cnn_lr=0.2,
                         weight_decay=0.1, momentum=0.9, clip_norm=1e9,
                         use_lookahead=False, frozen_pattern="cnn")
    state = tx.init(params)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    for _ in range(3):
        # zero grads = what stop_gradient produces for the frozen subtree
        grads = jax.tree.map(jnp.zeros_like, params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(
        np.asarray(params["visual"]["cnn"]["conv1"]["kernel"]),
        before["visual"]["cnn"]["conv1"]["kernel"])
    # non-frozen params DO decay under the same zero grads
    assert not np.array_equal(
        np.asarray(params["textual"]["transformer"]["layer_0"]["self_attn"]
                   ["query"]["kernel"]),
        before["textual"]["transformer"]["layer_0"]["self_attn"]["query"]
        ["kernel"])
