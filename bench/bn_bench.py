r"""
BN-backward A/B at ResNet-50 shapes: XLA autodiff of the jnp exact path vs
the custom-VJP op with the fused Pallas (dβ, dγ) reduction
(ops/batchnorm.py). Times one full fwd+bwd of an isolated BN layer per
shape (identical forwards, so the delta is pure backward), plus the
dy+x one-pass HBM floor for reference.

Usage: python bench/bn_bench.py [batch]   (default 128)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from virtex_tpu.utils.common import setup_compilation_cache

HBM_GBPS = 819e9  # v5e chip


def timed_loop(grad_fn, x, scale, bias, w, iters=30):
    """Time ``iters`` fwd+bwd executions INSIDE one jit via fori_loop.

    Repeated host-side calls with identical arguments are memoized by the
    axon tunnel relay (measured: 30 "calls" of a 1.7 ms-floor program in
    1 ms total), so the loop must live on device with a data dependency
    between iterations (x perturbed by a tiny multiple of dx) to prevent
    both memoization and loop-invariant hoisting. The perturbation adds
    one elementwise pass per iteration — identical for every variant, so
    deltas between variants remain meaningful."""
    import jax
    import jax.numpy as jnp

    def many(x, scale, bias, w):
        def body(i, carry):
            x, acc = carry
            dx, ds, db = grad_fn(x, scale, bias, w)
            x = (x.astype(jnp.float32)
                 + dx.astype(jnp.float32) * 1e-8).astype(x.dtype)
            return (x, acc + jnp.sum(ds))
        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))

    f = jax.jit(many)
    float(f(x, scale, bias, w)[1])  # compile + warm (VALUE fetch: see below)
    # Time with DIFFERENT input content (the relay memoizes identical-arg
    # executions) and synchronize via a SCALAR VALUE FETCH —
    # block_until_ready does NOT block through the tunnel (measured: a
    # 35 ms-floor program "blocked" in 0.2 ms; its value fetch took the
    # real time).
    x2 = jax.jit(lambda x: x * jnp.bfloat16(1.5) + jnp.bfloat16(0.01))(x)
    float(jnp.sum(x2.astype(jnp.float32)))
    t0 = time.perf_counter()
    acc = float(f(x2, scale, bias, w)[1])
    dt = time.perf_counter() - t0
    assert acc == acc  # the fetch is the fence; keep it live
    return dt / iters * 1e3  # ms


def main():
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from virtex_tpu.ops import batchnorm as BN

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    EPS = 1e-5

    def ref_bn(x, scale, bias):
        reduce_axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=reduce_axes)
        mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        shp = (1,) * (x.ndim - 1) + (x.shape[-1],)
        mul = (jnp.reshape(1.0 / jnp.sqrt(var + EPS), shp)
               * jnp.reshape(scale, shp)).astype(jnp.bfloat16)
        y = (x.astype(jnp.bfloat16)
             - jnp.reshape(mean, shp).astype(jnp.bfloat16)) * mul
        return y + jnp.reshape(bias, shp).astype(jnp.bfloat16)

    def kernel_bn(x, scale, bias):
        y, _, _ = BN.bn_train(x, scale, bias, EPS, jnp.bfloat16)
        return y

    # distinct (H, C) and their multiplicity in R-50 (conv-BN count)
    shapes = [(112, 64, 1), (56, 64, 6), (56, 256, 4), (56, 128, 1),
              (28, 128, 8), (28, 512, 5), (28, 256, 1), (14, 256, 12),
              (14, 1024, 7), (14, 512, 1), (7, 512, 6), (7, 2048, 4)]
    rows, tot_xla, tot_ker, tot_floor = [], 0.0, 0.0, 0.0
    for (H, C, mult) in shapes:
        shape = (B, H, H, C)
        kx, kw = jax.random.split(jax.random.PRNGKey(H + C))
        x = (jax.random.normal(kx, shape, jnp.float32)).astype(jnp.bfloat16)
        w = jax.random.normal(kw, shape, jnp.bfloat16)
        scale = jnp.ones((C,), jnp.float32)
        bias = jnp.zeros((C,), jnp.float32)

        def make(fn):
            # w as an argument, NOT a closure: closed-over arrays become
            # HLO constants (tunnel remote_compile rejects the payload).
            def loss(x, s, b, w):
                return jnp.sum((fn(x, s, b) * w).astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1, 2))

        t_xla = timed_loop(make(ref_bn), x, scale, bias, w)
        t_ker = timed_loop(make(kernel_bn), x, scale, bias, w)
        # fwd+bwd floor: fwd stats+apply (read x, write y ≈ 2 passes),
        # bwd reduce (dy+x) + dx pass (dy+x read, dx write) ≈ 5 passes,
        # + 3 passes for the timing harness's x-perturbation (read x, dx,
        # write x) — included because the measured loop pays it too.
        nbytes = x.size * 2
        floor = 10 * nbytes / HBM_GBPS * 1e3
        tot_xla += t_xla * mult
        tot_ker += t_ker * mult
        tot_floor += floor * mult
        row = {"shape": f"{B}x{H}x{H}x{C}", "mult": mult,
               "xla_ms": round(t_xla, 3), "kernel_ms": round(t_ker, 3),
               "floor_ms": round(floor, 3),
               "speedup": round(t_xla / t_ker, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    summary = {"metric": "R50 BN fwd+bwd total (weighted by layer count)",
               "xla_ms": round(tot_xla, 2), "kernel_ms": round(tot_ker, 2),
               "floor_ms": round(tot_floor, 2),
               "saved_ms": round(tot_xla - tot_ker, 2),
               "speedup": round(tot_xla / tot_ker, 3)}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
