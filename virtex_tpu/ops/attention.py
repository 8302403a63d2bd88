r"""
Fused scaled-dot-product attention as a Pallas TPU kernel.

Motivation (SURVEY §5.7): VirTex attention is tiny — ≤30 caption tokens
attending over ≤30 caption + 49 visual tokens — so the whole working set of
one (batch, head) program fits comfortably in VMEM. The fused kernel does
QKᵀ → mask → fp32 softmax → (optional in-kernel dropout via the TPU PRNG) →
PV in one pass, avoiding HBM round-trips for the (Tq, Tk) probability
matrix that the unfused XLA path materialises. A custom VJP recomputes the
probabilities in a backward Pallas kernel (flash-attention-style
rematerialisation; cheap at these shapes) and regenerates identical dropout
bits from the same seed.

Layouts: q (B, Tq, N, D), k/v (B, Tk, N, D), mask bool (B, 1, Tq, Tk) or
(B, N, Tq, Tk); grid = (B, N), one program per batch-head.

The XLA einsum path in :mod:`virtex_tpu.modules.transformer` remains the
fallback/reference implementation (``VIRTEX_TPU_NO_PALLAS=1`` disables the
kernel; it is also skipped automatically off-TPU).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU test hosts
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

NEG_INF = -1e9


def pallas_available() -> bool:
    """Opt-in: set VIRTEX_TPU_PALLAS=1 to route attention through the Pallas
    kernel on TPU. Off by default — on the development tunnel (axon, remote
    mosaic compile) kernel compiles are orders of magnitude slower than XLA,
    and at VirTex's tiny attention shapes XLA's fusion is already near the
    HBM roofline; benchmark with bench/attn_bench.py before enabling."""
    if not os.environ.get("VIRTEX_TPU_PALLAS"):
        return False
    if os.environ.get("VIRTEX_TPU_NO_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _fwd_kernel(q_ref, k_ref, v_ref, m_ref, seed_ref, o_ref, *,
                scale: float, dropout_rate: float):
    b, n = pl.program_id(0), pl.program_id(1)
    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = jnp.where(m_ref[0, 0], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b * pl.num_programs(1) + n)
        bits = pltpu.prng_random_bits(p.shape)
        keep = (bits.astype(jnp.float32) / jnp.float32(2**32)
                >= dropout_rate)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, m_ref, seed_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, dropout_rate: float):
    b, n = pl.program_id(0), pl.program_id(1)
    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    g = g_ref[0, 0, :, :].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = jnp.where(m_ref[0, 0], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)

    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b * pl.num_programs(1) + n)
        bits = pltpu.prng_random_bits(p.shape)
        keep = (bits.astype(jnp.float32) / jnp.float32(2**32)
                >= dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        pd = jnp.where(keep, p * inv, 0.0)
    else:
        keep, inv, pd = None, 1.0, p

    vf = v.astype(jnp.float32)
    # dv = pdᵀ g
    dv = jax.lax.dot_general(pd, g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # dpd = g vᵀ
    dpd = jax.lax.dot_general(g, vf, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        dp = jnp.where(keep, dpd * inv, 0.0)
    else:
        dp = dpd
    # softmax backward: ds = p ⊙ (dp − Σ_k dp ⊙ p)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = jnp.where(m_ref[0, 0], ds, 0.0) * scale
    dq = jax.lax.dot_general(ds, k.astype(jnp.float32),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q.astype(jnp.float32),
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)


def _specs(B, N, Tq, Tk, D, mask_heads):
    # Arrays are laid out (B, N, T, D) inside the kernels so each program's
    # block keeps the full (T, D) plane in its last two dims (a Mosaic
    # lowering requirement: last-two block dims must equal the array's).
    q_spec = pl.BlockSpec((1, 1, Tq, D), lambda b, n: (b, n, 0, 0))
    kv_spec = pl.BlockSpec((1, 1, Tk, D), lambda b, n: (b, n, 0, 0))
    m_spec = pl.BlockSpec(
        (1, 1, Tq, Tk),
        (lambda b, n: (b, n, 0, 0)) if mask_heads else
        (lambda b, n: (b, 0, 0, 0)))
    return q_spec, kv_spec, m_spec


def _to_bntd(x):
    return x.transpose(0, 2, 1, 3)  # (B, T, N, D) → (B, N, T, D)


def _call_fwd(q, k, v, mask, seed, scale, dropout_rate):
    B, Tq, N, D = q.shape
    Tk = k.shape[1]
    mask_heads = mask.shape[1] == N
    q_spec, kv_spec, m_spec = _specs(B, N, Tq, Tk, D, mask_heads)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale,
                          dropout_rate=dropout_rate),
        grid=(B, N),
        in_specs=[q_spec, kv_spec, kv_spec, m_spec, seed_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, Tq, D), q.dtype),
    )(_to_bntd(q), _to_bntd(k), _to_bntd(v), mask, seed)
    return _to_bntd(out)  # back to (B, Tq, N, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_sdpa(q, k, v, mask, seed, scale, dropout_rate):
    return _call_fwd(q, k, v, mask, seed, scale, dropout_rate)


def _fused_fwd(q, k, v, mask, seed, scale, dropout_rate):
    out = _call_fwd(q, k, v, mask, seed, scale, dropout_rate)
    return out, (q, k, v, mask, seed)


def _fused_bwd(scale, dropout_rate, res, g):
    q, k, v, mask, seed = res
    B, Tq, N, D = q.shape
    Tk = k.shape[1]
    mask_heads = mask.shape[1] == N
    q_spec, kv_spec, m_spec = _specs(B, N, Tq, Tk, D, mask_heads)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale,
                          dropout_rate=dropout_rate),
        grid=(B, N),
        in_specs=[q_spec, kv_spec, kv_spec, m_spec, seed_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec),
        out_shape=(jax.ShapeDtypeStruct((B, N, Tq, D), q.dtype),
                   jax.ShapeDtypeStruct((B, N, Tk, D), k.dtype),
                   jax.ShapeDtypeStruct((B, N, Tk, D), v.dtype)),
    )(_to_bntd(q), _to_bntd(k), _to_bntd(v), mask, seed, _to_bntd(g))
    return _to_bntd(dq), _to_bntd(dk), _to_bntd(dv), None, None


_fused_sdpa.defvjp(_fused_fwd, _fused_bwd)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    dropout_rate: float = 0.0,
                    dropout_seed: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    r"""Fused SDPA. Shapes: q (B, Tq, N, D); k, v (B, Tk, N, D); bool
    ``mask`` (B, 1|N, Tq, Tk), True = attend. Returns (B, Tq, N, D)."""
    B, Tq, N, D = q.shape
    Tk = k.shape[1]
    if mask is None:
        mask = jnp.ones((B, 1, Tq, Tk), dtype=bool)
    else:
        mask = jnp.broadcast_to(mask, (B, mask.shape[1], Tq, Tk))
    seed = (dropout_seed if dropout_seed is not None
            else jnp.zeros((1,), jnp.int32))
    seed = seed.reshape((1,)).astype(jnp.int32)
    scale = 1.0 / (D ** 0.5)
    return _fused_sdpa(q, k, v, mask, seed, scale, float(dropout_rate))


def xla_attention(q, k, v, mask=None):
    """Reference einsum path (identical math, no dropout)."""
    depth = q.shape[-1]
    s = jnp.einsum("bqnd,bknd->bnqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(jnp.float32(depth))
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
