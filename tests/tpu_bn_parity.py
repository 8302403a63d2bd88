r"""
On-TPU Pallas BatchNorm-backward parity at the real ResNet-50 shapes — run
directly on a TPU host (the pytest suite pins the CPU platform, so this is
a standalone check like ``tpu_attention_parity.py``):

    python tests/tpu_bn_parity.py [batch]

Asserts, for every distinct BN shape in R-50 at the production batch size
(plus the stem's channel-fold case):

- compiled ``bn_train`` FORWARD (y, mean, var) is bit-identical to the
  module's jnp exact path (same math, same dtype staging — toggling the
  kernel must not move the forward at all);
- compiled GRADIENTS (dx, dscale, dbias through the custom VJP's fused
  Pallas reduction) match XLA autodiff of the jnp path within the
  accumulation-order tolerance.

The op is the TPU default inside SubsampledBatchNorm (ops/batchnorm.py),
so this is the production train path's correctness gate on real hardware.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    from virtex_tpu.utils.common import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from virtex_tpu.ops import batchnorm as BN

    if jax.devices()[0].platform != "tpu":
        print("SKIP: no TPU (compiled-kernel parity needs real hardware)")
        return 0

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    EPS = 1e-5

    def ref_bn(x, scale, bias, dtype):
        reduce_axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=reduce_axes)
        mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        shp = (1,) * (x.ndim - 1) + (x.shape[-1],)
        mul = (jnp.reshape(1.0 / jnp.sqrt(var + EPS), shp)
               * jnp.reshape(scale, shp)).astype(dtype)
        y = (x.astype(dtype) - jnp.reshape(mean, shp).astype(dtype)) * mul
        return (y + jnp.reshape(bias, shp).astype(dtype)).astype(dtype), \
            mean, var

    # every distinct (H, C) BN shape in R-50 + the 112² stem (C=64 fold)
    shapes = [(112, 64), (56, 64), (56, 256), (56, 128), (28, 128),
              (28, 512), (28, 256), (14, 256), (14, 1024), (14, 512),
              (7, 512), (7, 2048)]
    for (H, C) in shapes:
        shape = (B, H, H, C)
        assert BN.bn_backward_shape_supported(shape), shape
        key = jax.random.PRNGKey(H * 1000 + C)
        kx, kw, ks, kb = jax.random.split(key, 4)
        x = (jax.random.normal(kx, shape, jnp.float32) * 2 + 0.3).astype(
            jnp.bfloat16)
        scale = jax.random.uniform(ks, (C,), jnp.float32, 0.5, 1.5)
        bias = jax.random.normal(kb, (C,), jnp.float32) * 0.1
        w = jax.random.normal(kw, shape, jnp.float32)

        yk, mk, vk = jax.jit(
            lambda x, s, b: BN.bn_train(x, s, b, EPS, jnp.bfloat16))(
                x, scale, bias)
        yr, mr, vr = jax.jit(
            lambda x, s, b: ref_bn(x, s, b, jnp.bfloat16))(x, scale, bias)
        np.testing.assert_array_equal(
            np.asarray(yk, np.float32), np.asarray(yr, np.float32),
            err_msg=f"forward y @ {shape}")
        np.testing.assert_allclose(np.asarray(mk), np.asarray(mr),
                                   rtol=1e-6, err_msg=f"mean @ {shape}")
        np.testing.assert_allclose(np.asarray(vk), np.asarray(vr),
                                   rtol=1e-5, err_msg=f"var @ {shape}")

        def loss_k(x, s, b):
            y, _, _ = BN.bn_train(x, s, b, EPS, jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32) * w)

        def loss_r(x, s, b):
            y, _, _ = ref_bn(x, s, b, jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32) * w)

        gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(x, scale, bias)
        gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(x, scale, bias)
        for name, a, bb in zip(["dx", "dscale", "dbias"], gk, gr):
            a = np.asarray(a, np.float64)
            bb = np.asarray(bb, np.float64)
            denom = max(np.abs(bb).max(), 1e-6)
            # dx is bf16 (two valid roundings may differ by 1 ulp ≈ 0.8%);
            # dscale/dbias are f32 sums over M ≥ 6k elements whose
            # accumulation order differs between kernel and XLA.
            tol = 2e-2 if name == "dx" else 1e-3
            np.testing.assert_allclose(
                a, bb, rtol=tol, atol=tol * denom,
                err_msg=f"{name} @ {shape}")
        print(f"BN {shape}: fwd bit-exact, grads OK", flush=True)

    print("tpu_bn_parity: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
