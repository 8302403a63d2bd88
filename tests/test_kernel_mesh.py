"""Multi-device Pallas kernel dispatch (ops/_mesh.py).

pallas_call has no SPMD partitioning rules, so under a >1-device mesh the
kernels must run inside shard_map with the real activation layout (batch
on 'data', heads on 'model') and a psum where the math reduces across
shards. These tests run on the suite's 8 virtual CPU devices in interpret
mode and assert the sharded results match single-device autodiff — the
BN case previously diverged (per-shard statistics gradients, 93% of dx
elements off) without the shard_map path.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from virtex_tpu.ops import attention as A
from virtex_tpu.ops import batchnorm as BN
from virtex_tpu.ops._mesh import kernel_mesh, wrap_step_fn

EPS = 1e-5


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if jax.devices()[0].platform != "tpu":
        from jax.experimental import pallas as pl
        orig = pl.pallas_call
        monkeypatch.setattr(pl, "pallas_call",
                            functools.partial(orig, interpret=True))
    yield


def make_mesh(data, model):
    devs = np.array(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def test_bn_sharded_grads_match_single_device():
    mesh = make_mesh(8, 1)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 128),
                          jnp.float32)
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))
    w = jax.random.normal(jax.random.PRNGKey(1), x.shape, jnp.float32)

    def loss(x, s, b):
        y, m, v = BN.bn_train(x, s, b, EPS, jnp.float32, True)
        return jnp.sum(y * w)

    g_single = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with mesh:
        step = wrap_step_fn(jax.jit(jax.grad(loss, argnums=(0, 1, 2))),
                            mesh)
        g_mesh = step(xs, scale, bias)
    for name, a, b in zip(["dx", "dscale", "dbias"], g_mesh, g_single):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_bn_sharded_forward_stats_are_global():
    """mean/var under the mesh must equal global-batch statistics (the
    sync-BN contract), not per-shard ones."""
    mesh = make_mesh(8, 1)
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 4, 4, 128),
                          jnp.float32) * 3 + 1
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))

    def stats(x):
        _, m, v = BN.bn_train(x, scale, bias, EPS, jnp.float32, True)
        return m, v

    m1, v1 = stats(x)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with mesh:
        m8, v8 = wrap_step_fn(jax.jit(stats), mesh)(xs)
    np.testing.assert_allclose(np.asarray(m8), np.asarray(m1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(v8), np.asarray(v1), rtol=1e-5)


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
def test_attention_sharded_matches_single_device(data, model):
    """Batch on 'data', heads on 'model': per-shard attention is exact."""
    mesh = make_mesh(data, model)
    B, Tq, Tk, N, D = 8, 6, 10, 4, 32
    q = jax.random.normal(jax.random.PRNGKey(0), (B, Tq, N, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Tk, N, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, Tk, N, D), jnp.float32)
    mask = jnp.ones((B, 1, Tq, Tk), bool)

    def loss(q, k, v):
        return jnp.sum(A.fused_attention(q, k, v, mask) ** 2)

    out_single = A.fused_attention(q, k, v, mask)
    g_single = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    sh = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(t, sh) for t in (q, k, v))
    with mesh:
        fwd = wrap_step_fn(jax.jit(
            lambda q, k, v: A.fused_attention(q, k, v, mask)), mesh)
        out_mesh = fwd(qs, ks, vs)
        grad = wrap_step_fn(jax.jit(jax.grad(loss, argnums=(0, 1, 2))),
                            mesh)
        g_mesh = grad(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out_mesh), np.asarray(out_single),
                               rtol=2e-4, atol=2e-5)
    for name, a, b in zip("qkv", g_mesh, g_single):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"d{name} {data}x{model}")


def test_attention_sharded_dropout_seed_offsets(monkeypatch):
    """Each (data, model) shard must draw a distinct in-kernel dropout
    stream — local program ids repeat across shards, so an un-offset seed
    would reuse identical masks on every shard. The TPU PRNG doesn't
    lower in CPU interpret mode, so stub the mask with a deterministic
    function of the (offset) seed and check shard outputs differ. The
    real keep-rate law is gated on hardware (tests/tpu_attention_parity)."""

    def fake_mask(shape, seed_ref, b, rate):
        base = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
        return ((base + seed_ref[0] + b) % 3) != 0

    monkeypatch.setattr(A, "_dropout_mask", fake_mask)

    mesh = make_mesh(4, 2)
    B, T, N, D = 8, 4, 4, 32
    q = jnp.zeros((B, T, N, D), jnp.float32)
    v = (jnp.arange(T, dtype=jnp.float32)[None, :, None, None]
         * jnp.ones((B, T, N, D), jnp.float32))
    mask = jnp.ones((B, 1, T, T), bool)
    seed = jnp.asarray([7], jnp.int32)

    def run(with_mesh):
        fn = jax.jit(lambda q, v: A.fused_attention(
            q, q, v, mask, dropout_rate=0.5, dropout_seed=seed))
        if not with_mesh:
            return np.asarray(fn(q, v))
        sh = NamedSharding(mesh, P("data", None, "model", None))
        with mesh:
            return np.asarray(wrap_step_fn(fn, mesh)(
                jax.device_put(q, sh), jax.device_put(v, sh)))

    out = run(with_mesh=True)
    # data-shard decorrelation: image 0 (shard 0) vs image 2 (shard 1)
    # share the local program id b=0; identical seeds would give equal rows
    assert not np.array_equal(out[0], out[2])
    # head-shard decorrelation: the two halves of the head axis live on
    # different 'model' shards with the same b
    assert not np.array_equal(out[0, :, :2], out[0, :, 2:])
    # and dropout actually dropped something (stub keeps 2/3)
    base = run(with_mesh=False)
    assert not np.array_equal(base, np.asarray(
        jnp.broadcast_to(v.mean(1, keepdims=True), v.shape)))
