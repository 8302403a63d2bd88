"""Parity gate for the BN custom-VJP op (ops/batchnorm.py) in Pallas
interpret mode on CPU: forward values, input/scale/bias gradients, and the
(mean, var) output cotangent paths must match plain-jnp autodiff.

The on-TPU compiled-kernel gate is tests/tpu_bn_parity.py (run on real
hardware, like tests/tpu_attention_parity.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virtex_tpu.ops.batchnorm import (
    _plan,
    bn_backward_shape_supported,
    bn_train,
)

EPS = 1e-5


def ref_bn(x, scale, bias, eps=EPS, dtype=jnp.float32):
    """The module's exact-path math (normalization.py), plain autodiff."""
    reduce_axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=reduce_axes)
    mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    shape = (1,) * (x.ndim - 1) + (x.shape[-1],)
    mul = (jnp.reshape(1.0 / jnp.sqrt(var + eps), shape)
           * jnp.reshape(scale, shape)).astype(dtype)
    y = (x.astype(dtype) - jnp.reshape(mean, shape).astype(dtype)) * mul
    y = y + jnp.reshape(bias, shape).astype(dtype)
    return y.astype(dtype), mean, var


def make_inputs(shape, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    C = shape[-1]
    x = jnp.asarray(rng.randn(*shape) * 2.0 + 0.5, dtype)
    scale = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    return x, scale, bias


@pytest.mark.parametrize("shape", [
    (4, 8, 8, 256),    # plain tiling
    (4, 8, 8, 64),     # C < 128: two-pixel channel fold
    (2, 7, 7, 2048),   # M=98 lacks 2-factors → in-bwd jnp fallback
    (16, 4, 4, 128),   # M = 256, exact power of two
])
def test_bn_train_matches_autodiff(shape):
    x, scale, bias = make_inputs(shape)
    w = jnp.asarray(np.random.RandomState(1).randn(*shape), jnp.float32)

    def loss_kernel(x, s, b):
        y, mean, var = bn_train(x, s, b, EPS, jnp.float32, True)
        return jnp.sum(y * w)

    def loss_ref(x, s, b):
        y, mean, var = ref_bn(x, s, b)
        return jnp.sum(y * w)

    y_k, mean_k, var_k = bn_train(x, scale, bias, EPS, jnp.float32, True)
    y_r, mean_r, var_r = ref_bn(x, scale, bias)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean_k), np.asarray(mean_r),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var_k), np.asarray(var_r),
                               rtol=1e-5)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(gk, gr, ["dx", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_bn_train_stat_output_cotangents():
    """Gradient THROUGH the (mean, var) outputs (zero at runtime in the
    trainer, but part of the op contract) must match autodiff."""
    x, scale, bias = make_inputs((4, 4, 4, 128), seed=3)
    a = jnp.asarray(np.random.RandomState(4).randn(128), jnp.float32)
    b2 = jnp.asarray(np.random.RandomState(5).randn(128), jnp.float32)

    def loss_kernel(x):
        y, mean, var = bn_train(x, scale, bias, EPS, jnp.float32, True)
        return jnp.sum(mean * a) + jnp.sum(var * b2) + jnp.sum(y)

    def loss_ref(x):
        y, mean, var = ref_bn(x, scale, bias)
        return jnp.sum(mean * a) + jnp.sum(var * b2) + jnp.sum(y)

    gk = jax.grad(loss_kernel)(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=2e-4, atol=2e-5)


def test_bn_train_bf16_compute_dtype():
    """bf16 input/compute (the production configuration): forward must be
    bit-identical to the module's jnp staging, gradients close in f32."""
    x, scale, bias = make_inputs((8, 4, 4, 128), seed=7, dtype=jnp.bfloat16)
    y_k, mean_k, var_k = bn_train(x, scale, bias, EPS, jnp.bfloat16, True)
    y_r, mean_r, var_r = ref_bn(x, scale, bias, dtype=jnp.bfloat16)
    assert y_k.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(y_k, np.float32),
                                  np.asarray(y_r, np.float32))

    # Gradient accuracy: compare BOTH paths against an f64 ground truth
    # (comparing the two bf16 paths to each other is ill-posed — their
    # bf16 rounding noise differs while both are "correct"; and for
    # degenerate losses like Σy² the true BN gradient cancels to ~0,
    # leaving only noise). The kernel's f32 analytic backward must be at
    # least as accurate as bf16 autodiff — measured ~4-5× better.
    w = jnp.asarray(np.random.RandomState(8).randn(*x.shape), jnp.float32)

    def loss(fn, x):
        y = fn(x)
        return jnp.sum(y.astype(jnp.float32) * w)

    gk = jax.grad(lambda x: loss(
        lambda x: bn_train(x, scale, bias, EPS, jnp.bfloat16, True)[0],
        x))(x)
    gr = jax.grad(lambda x: loss(
        lambda x: ref_bn(x, scale, bias, dtype=jnp.bfloat16)[0], x))(x)

    # f64 ground truth via the analytic BN gradient in numpy:
    #   dx = γ·rstd·(w − Σw/M − x̂·Σ(w·x̂)/M)
    x64 = np.asarray(x, np.float64)
    w64 = np.asarray(w, np.float64)
    C = x64.shape[-1]
    M = x64.size // C
    flat_x = x64.reshape(M, C)
    flat_w = w64.reshape(M, C)
    mu = flat_x.mean(0)
    rstd = 1.0 / np.sqrt(flat_x.var(0) + EPS)
    xhat = (flat_x - mu) * rstd
    gt = (np.asarray(scale, np.float64) * rstd
          * (flat_w - flat_w.mean(0)
             - xhat * (flat_w * xhat).mean(0))).reshape(x64.shape)
    err_k = np.abs(np.asarray(gk, np.float64) - gt).max()
    err_r = np.abs(np.asarray(gr, np.float64) - gt).max()
    assert err_k <= err_r * 1.5 + 1e-6, (err_k, err_r)


def test_plan_covers_resnet50_shapes():
    """Every train-time BN shape in R-50/R-101/W2X at batch 128 must tile
    (no silent fallback on the production path)."""
    B = 128
    shapes = [(B, 112, 112, 64)]
    for (h, c) in [(56, 64), (56, 256), (56, 128), (28, 128), (28, 512),
                   (28, 256), (14, 256), (14, 1024), (14, 512), (7, 512),
                   (7, 2048), (7, 1024), (56, 512), (28, 1024), (14, 2048),
                   (7, 4096)]:
        shapes.append((B, h, h, c))
    for s in shapes:
        assert bn_backward_shape_supported(s), s
        C = s[-1]
        M = s[0] * s[1] * s[2]
        fold, bm, c_eff = _plan(M, C)
        assert c_eff % 128 == 0
        assert (M // fold) % bm == 0
        # block ≤ ~2 MB bf16 and at least min-tile rows
        assert 16 <= bm * c_eff * 2 <= (1 << 21) or bm * c_eff == M * C


def test_unsupported_shapes_fall_back():
    assert not bn_backward_shape_supported((3, 7, 7, 96))  # C % 128 != 0
    # odd M with C=64 (fold impossible): 3·7·7 odd
    assert not bn_backward_shape_supported((3, 7, 7, 64))
