r"""
On-TPU Pallas BatchNorm-backward parity at the real ResNet-50 shapes — run
directly on a TPU host (the pytest suite pins the CPU platform, so this is
a standalone check like ``tpu_attention_parity.py``):

    python tests/tpu_bn_parity.py [batch] [--quick]

Asserts, for every distinct BN shape in R-50 at the production batch size
(plus the stem's channel-fold case; ``--quick`` runs a 4-shape
representative subset):

- compiled ``bn_train`` FORWARD (y, mean, var) is bit-identical to the
  module's jnp exact path (same math, same dtype staging — toggling the
  kernel must not move the forward at all);
- compiled GRADIENTS (dx, dscale, dbias through the custom VJP's fused
  Pallas reduction) match XLA autodiff of the jnp path within the
  accumulation-order tolerance.

Tunnel hygiene (axon dev environment): inputs are built by per-shape
jitted functions (eager ops each cost a remote compile), loss weights are
ARGUMENTS (closed-over arrays bake into the HLO and blow the
remote_compile size limit), and comparisons run on device so only scalars
cross the wire.
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

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    quick = "--quick" in sys.argv[1:]
    B = int(args[0]) if args else 128
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
    if quick:
        shapes = [(112, 64), (56, 256), (14, 1024), (7, 2048)]

    @jax.jit
    def maxdiff(a, b):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        return (jnp.max(jnp.abs(a - b)),
                jnp.max(jnp.abs(b)),
                jnp.all(a == b))

    for (H, C) in shapes:
        shape = (B, H, H, C)
        assert BN.bn_backward_shape_supported(shape), shape

        def build(key, shape=shape, C=C):
            kx, kw, ks, kb = jax.random.split(key, 4)
            x = (jax.random.normal(kx, shape, jnp.float32) * 2
                 + 0.3).astype(jnp.bfloat16)
            scale = jax.random.uniform(ks, (C,), jnp.float32, 0.5, 1.5)
            bias = jax.random.normal(kb, (C,), jnp.float32) * 0.1
            w = jax.random.normal(kw, shape, jnp.bfloat16)
            return x, scale, bias, w

        x, scale, bias, w = jax.jit(build)(jax.random.PRNGKey(H * 997 + C))

        yk, mk, vk = jax.jit(
            lambda x, s, b: BN.bn_train(x, s, b, EPS, jnp.bfloat16))(
                x, scale, bias)
        yr, mr, vr = jax.jit(
            lambda x, s, b: ref_bn(x, s, b, jnp.bfloat16))(x, scale, bias)
        _, _, y_equal = maxdiff(yk, yr)
        assert bool(y_equal), f"forward y differs @ {shape}"
        dm, sm, _ = maxdiff(mk, mr)
        assert float(dm) <= 1e-6 * max(float(sm), 1e-6), f"mean @ {shape}"
        dv, sv, _ = maxdiff(vk, vr)
        assert float(dv) <= 1e-5 * max(float(sv), 1e-6), f"var @ {shape}"
        print(f"BN {shape}: fwd bit-exact", flush=True)

        def loss_k(x, s, b, w):
            y, _, _ = BN.bn_train(x, s, b, EPS, jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32) * w.astype(jnp.float32))

        def loss_r(x, s, b, w):
            y, _, _ = ref_bn(x, s, b, jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32) * w.astype(jnp.float32))

        gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(x, scale, bias, w)
        gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(x, scale, bias, w)
        for name, a, bb in zip(["dx", "dscale", "dbias"], gk, gr):
            d, s, _ = maxdiff(a, bb)
            # Both sides are valid gradients of slightly different bf16
            # STAGINGS of the same forward: autodiff reduces Σ dy·(x−μ)
            # with the bf16-rounded (x−μ) the forward materialised, the
            # kernel recomputes x̂ in f32 (measured 4-5× closer to the f64
            # truth, tests/test_batchnorm_op.py). The bf16 staging noise
            # is ~0.4%/element ⇒ rel ~5e-3 on √M-cancelling sums; 2e-2
            # bounds it. Exact-math parity is pinned at f32 on CPU
            # (rtol 2e-4, same file).
            tol = 2e-2
            assert float(d) <= tol * max(float(s), 1e-6), (
                f"{name} @ {shape}: maxdiff {float(d)} vs scale {float(s)}")
        print(f"BN {shape}: grads OK", flush=True)

    print("tpu_bn_parity: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
