"""Pallas fused-attention tests.

On CPU hosts the kernel runs in Pallas interpret mode (numerics only); on a
real TPU the compiled kernel is exercised (see also bench/attn_bench.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virtex_tpu.ops import attention as A

B, Tq, Tk, N, D = 2, 8, 16, 4, 32


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def _causal_mask():
    m = jnp.tril(jnp.ones((Tq, Tq), bool))
    return jnp.broadcast_to(m[None, None], (B, 1, Tq, Tq))


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas kernels in interpret mode off-TPU."""
    if jax.devices()[0].platform != "tpu":
        import functools
        from jax.experimental import pallas as pl
        orig = pl.pallas_call
        monkeypatch.setattr(pl, "pallas_call",
                            functools.partial(orig, interpret=True))
    yield


def test_fused_matches_xla_no_mask():
    q, k, v = _rand((B, Tq, N, D), 0), _rand((B, Tk, N, D), 1), _rand(
        (B, Tk, N, D), 2)
    out = A.fused_attention(q, k, v)
    mask = jnp.ones((B, 1, Tq, Tk), bool)
    ref = A.xla_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_matches_xla_causal_mask():
    q, k, v = _rand((B, Tq, N, D), 3), _rand((B, Tq, N, D), 4), _rand(
        (B, Tq, N, D), 5)
    mask = _causal_mask()
    out = A.fused_attention(q, k, v, mask)
    ref = A.xla_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_gradients_match_xla():
    q, k, v = _rand((B, Tq, N, D), 6), _rand((B, Tq, N, D), 7), _rand(
        (B, Tq, N, D), 8)
    mask = _causal_mask()

    def loss_fused(q, k, v):
        return jnp.sum(A.fused_attention(q, k, v, mask) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(A.xla_attention(q, k, v, mask) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_dropout_missing_seed_raises():
    q, k, v = _rand((B, Tq, N, D), 9), _rand((B, Tq, N, D), 10), _rand(
        (B, Tq, N, D), 11)
    with pytest.raises(ValueError, match="dropout_seed"):
        A.fused_attention(q, k, v, dropout_rate=0.1)


def test_fused_dropout_deterministic_given_seed():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("in-kernel PRNG requires a real TPU")
    q, k, v = _rand((B, Tq, N, D), 9), _rand((B, Tq, N, D), 10), _rand(
        (B, Tq, N, D), 11)
    seed = jnp.asarray([123], jnp.int32)
    o1 = A.fused_attention(q, k, v, dropout_rate=0.5, dropout_seed=seed)
    o2 = A.fused_attention(q, k, v, dropout_rate=0.5, dropout_seed=seed)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
    o3 = A.fused_attention(q, k, v, dropout_rate=0.5,
                           dropout_seed=jnp.asarray([7], jnp.int32))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
