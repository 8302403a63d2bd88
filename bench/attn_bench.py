r"""
Fused Pallas attention (the TPU default) vs the XLA einsum path, at VirTex
shapes (B·K beams × heads over ≤30 caption + 49 visual tokens) and larger.
Forward A/B plus a fwd+bwd (training-direction) A/B per shape.

Usage: python bench/attn_bench.py   (VIRTEX_TPU_NO_PALLAS=1 flips default)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from virtex_tpu.utils.common import setup_compilation_cache


def timeit(fn, q, k, v, iters=50):
    """Time ``iters`` executions INSIDE one jit via fori_loop, feeding a
    tiny multiple of each iteration's first output leaf back into q.

    The axon tunnel relay memoizes repeated executions with identical
    arguments (round-3 discovery: constant-arg host loops measure RPC
    latency, not compute), and loop-invariant bodies get hoisted — the
    data dependency defeats both. The q-update adds one small elementwise
    pass per iteration, identical across compared variants."""
    import jax
    import jax.numpy as jnp

    def many(q, k, v):
        def body(i, carry):
            q, acc = carry
            out = fn(q, k, v)
            lead = jax.tree.leaves(out)[0]
            q = (q.astype(jnp.float32)
                 + lead.astype(jnp.float32).reshape(q.shape) * 1e-6
                 ).astype(q.dtype)
            return (q, acc + jnp.sum(lead.astype(jnp.float32)))
        return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))

    f = jax.jit(many)
    float(f(q, k, v)[1])  # compile + warm (value fetch = the only fence)
    # fresh content (relay memoizes identical-arg executions); sync via
    # scalar fetch — block_until_ready does NOT block through the tunnel
    q2 = jax.jit(lambda x: x * jnp.asarray(1.25, x.dtype))(q)
    float(jnp.sum(q2.astype(jnp.float32)))
    t0 = time.perf_counter()
    acc = float(f(q2, k, v)[1])
    dt = time.perf_counter() - t0
    assert acc == acc
    return dt / iters * 1e6  # µs


def main():
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from virtex_tpu.ops import attention as A

    results = []
    for (B, Tq, Tk, N, D) in [
        (128, 30, 30, 16, 64),    # self-attn, pretrain batch
        (128, 30, 49, 16, 64),    # cross-attn, pretrain batch
        (256, 30, 79, 32, 64),    # H2048 wide head
    ]:
        q = jax.random.normal(jax.random.PRNGKey(0), (B, Tq, N, D),
                              jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, Tk, N, D),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, Tk, N, D),
                              jnp.bfloat16)
        mask = jnp.ones((B, 1, Tq, Tk), bool)

        xla = jax.jit(lambda q, k, v: A.xla_attention(q, k, v, mask))
        t_xla = timeit(xla, q, k, v)
        row = {"shape": f"B{B} Tq{Tq} Tk{Tk} N{N} D{D}",
               "xla_us": round(t_xla, 1)}

        def grads_of(attn_fn):
            def loss(q, k, v):
                return jnp.sum(attn_fn(q, k, v, mask).astype(jnp.float32)
                               ** 2)
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        row["xla_fwdbwd_us"] = round(timeit(grads_of(A.xla_attention),
                                            q, k, v), 1)
        if A.pallas_available():
            fused = jax.jit(lambda q, k, v: A.fused_attention(q, k, v, mask))
            row["pallas_us"] = round(timeit(fused, q, k, v), 1)
            row["speedup"] = round(t_xla / row["pallas_us"], 2)
            row["pallas_fwdbwd_us"] = round(
                timeit(grads_of(A.fused_attention), q, k, v), 1)
            row["fwdbwd_speedup"] = round(
                row["xla_fwdbwd_us"] / row["pallas_fwdbwd_us"], 2)
        results.append(row)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
