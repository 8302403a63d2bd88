r"""
On-TPU Pallas attention parity at FLAGSHIP shapes — run directly on a TPU
host (the pytest suite pins the CPU platform, so this is a standalone check
like ``multihost_smoke.py``):

    python tests/tpu_attention_parity.py

Asserts, for the shapes the captioning model actually uses (self-attention
B·K up to 640 beams, T=30; cross-attention to the 49 visual tokens, Tk up
to 79):

- compiled-kernel FORWARD output matches the XLA einsum path;
- compiled-kernel GRADIENTS (dq, dk, dv through the custom VJP's
  rematerialising backward kernel) match XLA autodiff.

The Pallas kernel is the TPU default (ops/attention.py), so this is the
production path's correctness gate on real hardware.
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

    from virtex_tpu.ops import attention as A

    if jax.devices()[0].platform != "tpu":
        print("SKIP: no TPU (compiled-kernel parity needs real hardware)")
        return 0

    shapes = [
        # (B, Tq, Tk, N, D, causal)
        (128, 30, 30, 16, 64, True),    # pretrain self-attn (H1024)
        (128, 30, 49, 16, 64, False),   # pretrain cross-attn to 7x7 grid
        (640, 30, 30, 16, 64, True),    # beam decode B*K=640 self-attn
        (640, 30, 79, 32, 64, False),   # H2048 wide head, Tk=30+49
    ]
    for (B, Tq, Tk, N, D, causal) in shapes:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(B + Tk), 3)
        q = jax.random.normal(kq, (B, Tq, N, D), jnp.float32)
        k = jax.random.normal(kk, (B, Tk, N, D), jnp.float32)
        v = jax.random.normal(kv, (B, Tk, N, D), jnp.float32)
        if causal:
            mask = jnp.broadcast_to(
                jnp.tril(jnp.ones((Tq, Tk), bool))[None, None],
                (B, 1, Tq, Tk))
        else:
            mask = jnp.ones((B, 1, Tq, Tk), bool)

        # NOTE on tolerances: on TPU, f32 dot_generals run through the MXU
        # with default (bf16-pass) precision in BOTH implementations, so
        # they agree to ~1e-3 absolute, not f32 epsilon (CPU interpret-mode
        # tests in test_ops.py check the tight numerics).
        out_f = jax.jit(lambda q, k, v: A.fused_attention(q, k, v, mask))(
            q, k, v)
        out_x = jax.jit(lambda q, k, v: A.xla_attention(q, k, v, mask))(
            q, k, v)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                                   rtol=3e-3, atol=3e-3)

        def loss_f(q, k, v):
            return jnp.sum(A.fused_attention(q, k, v, mask) ** 2)

        def loss_x(q, k, v):
            return jnp.sum(A.xla_attention(q, k, v, mask) ** 2)

        g_f = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(q, k, v)
        g_x = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))(q, k, v)
        for name, a, b in zip("qkv", g_f, g_x):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1e-6)
            np.testing.assert_allclose(
                a, b, rtol=3e-3, atol=3e-3 * scale,
                err_msg=f"d{name} @ B{B} Tq{Tq} Tk{Tk} N{N} D{D}")
        print(f"B{B} Tq{Tq} Tk{Tk} N{N} D{D} causal={causal}: "
              f"fwd+grad parity OK", flush=True)

    # In-kernel dropout keep-rate: with q = k = 0 attention is uniform
    # (p = 1/Tk), so E[output] with v = 1 equals actual_keep / nominal_keep.
    # A signed/unsigned PRNG mix-up (keep ≈ 0.5 − rate instead of 1 − rate)
    # shows up as a mean far from 1 (measured 0.44 before the fix).
    B, Tq, Tk, N, D, rate = 8, 128, 128, 8, 32, 0.1
    z = jnp.zeros((B, Tq, N, D), jnp.float32)
    zk = jnp.zeros((B, Tk, N, D), jnp.float32)
    ones = jnp.ones((B, Tk, N, D), jnp.float32)
    o = jax.jit(lambda: A.fused_attention(
        z, zk, ones, dropout_rate=rate,
        dropout_seed=jnp.asarray([42], jnp.int32)))()
    mean = float(jnp.mean(o))
    keep = mean * (1.0 - rate)
    assert abs(mean - 1.0) < 0.02, f"dropout keep-rate off: mean={mean:.4f}"
    print(f"in-kernel dropout keep fraction @ rate {rate}: {keep:.4f} OK",
          flush=True)
    print("tpu_attention_parity: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
