r"""
Fused scaled-dot-product attention as a Pallas TPU kernel.

Motivation (SURVEY §5.7): VirTex attention is tiny — ≤30 caption tokens
attending over ≤30 caption + 49 visual tokens — so one BATCH ELEMENT's
entire working set (all heads) fits comfortably in VMEM. Each program
handles one batch element and performs head-batched dot_generals:
QKᵀ → mask → fp32 softmax → (optional in-kernel dropout via the TPU PRNG) →
PV in one pass, with no HBM round-trip for the (N, Tq, Tk) probability
tensor. A custom VJP recomputes the probabilities in a backward Pallas
kernel (flash-attention-style rematerialisation; cheap at these shapes) and
regenerates identical dropout bits from the same seed.

Measured on v5e (bench/attn_bench.py): the per-(batch, head) grid of the
first iteration ran at 0.5–0.7× XLA (2048 tiny programs, MXU underfilled);
this per-batch batched-heads layout reaches ~1.0× XLA on self-attention and
~1.35× on cross-attention to the 49 visual tokens.

Layouts: q (B, Tq, N, D), k/v (B, Tk, N, D), mask bool (B, 1, Tq, Tk) or
(B, N, Tq, Tk); grid = (B,).

This kernel is the DEFAULT on TPU (see :func:`pallas_available`); the XLA
einsum path in :mod:`virtex_tpu.modules.transformer` remains the
fallback/reference implementation (``VIRTEX_TPU_NO_PALLAS=1`` disables the
kernel and selects it).
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

# head-batched contractions: (N, Tq, D) x (N, Tk, D) -> (N, Tq, Tk)
_QK_DIMS = (((2,), (2,)), ((0,), (0,)))
# (N, Tq, Tk) x (N, Tk, D) -> (N, Tq, D)
_PV_DIMS = (((2,), (1,)), ((0,), (0,)))
# (N, Tq, Tk) x (N, Tq, D) -> (N, Tk, D)   [dv = pᵀ g]
_PT_G_DIMS = (((1,), (1,)), ((0,), (0,)))
# (N, Tq, D) x (N, Tk, D) -> (N, Tq, Tk)   [dp = g vᵀ]
_G_VT_DIMS = (((2,), (2,)), ((0,), (0,)))
# (N, Tq, Tk) x (N, Tk, D) -> (N, Tq, D)   [dq = ds k]
_DS_K_DIMS = (((2,), (1,)), ((0,), (0,)))
# (N, Tq, Tk) x (N, Tq, D) -> (N, Tk, D)   [dk = dsᵀ q]
_DST_Q_DIMS = (((1,), (1,)), ((0,), (0,)))


def pallas_available() -> bool:
    """Default ON for TPU: the batched-heads kernel measured +3.4% on the
    full train step vs the XLA attention path (in-kernel dropout avoids the
    separate RNG materialisation). VIRTEX_TPU_NO_PALLAS=1 falls back to the
    XLA einsum path."""
    if os.environ.get("VIRTEX_TPU_NO_PALLAS"):
        return False
    if pltpu is None:  # pallas import failed (jax/libtpu mismatch)
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _dropout_mask(shape, seed_ref, b, rate):
    pltpu.prng_seed(seed_ref[0] + b)
    # prng_random_bits yields SIGNED int32 on this backend; treating the
    # bits as unsigned ([0, 2^32) / 2^32 >= rate) silently halves the keep
    # probability (measured 0.40 instead of 0.90 at rate 0.1 on v5e).
    # Compare in the integer domain instead: bitcast to int32 (no-op if
    # already signed) and keep iff the implied u = (bits + 2^31) / 2^32 in
    # [0, 1) is >= rate — exact, and cheaper than the float division.
    bits = jax.lax.bitcast_convert_type(pltpu.prng_random_bits(shape),
                                        jnp.int32)
    threshold = min(2**31 - 1, round(rate * 2**32 - 2**31))
    return bits >= jnp.int32(threshold)


def _fwd_kernel(q_ref, k_ref, v_ref, m_ref, seed_ref, o_ref, *,
                scale: float, dropout_rate: float):
    b = pl.program_id(0)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]           # (N, T, D)
    s = jax.lax.dot_general(q, k, _QK_DIMS,
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(m_ref[0], s, NEG_INF)              # mask (1|N, Tq, Tk)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        keep = _dropout_mask(p.shape, seed_ref, b, dropout_rate)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    o = jax.lax.dot_general(p.astype(v.dtype), v, _PV_DIMS,
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, m_ref, seed_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, dropout_rate: float):
    b = pl.program_id(0)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    g = g_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, _QK_DIMS,
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(m_ref[0], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)

    if dropout_rate > 0.0:
        keep = _dropout_mask(p.shape, seed_ref, b, dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        pd = jnp.where(keep, p * inv, 0.0)
    else:
        keep, inv, pd = None, 1.0, p

    vf = v.astype(jnp.float32)
    dv = jax.lax.dot_general(pd, g, _PT_G_DIMS,
                             preferred_element_type=jnp.float32)
    dpd = jax.lax.dot_general(g, vf, _G_VT_DIMS,
                              preferred_element_type=jnp.float32)
    dp = jnp.where(keep, dpd * inv, 0.0) if dropout_rate > 0.0 else dpd
    # softmax backward: ds = p ⊙ (dp − Σ_k dp ⊙ p)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = jnp.where(m_ref[0], ds, 0.0) * scale
    dq = jax.lax.dot_general(ds, k.astype(jnp.float32), _DS_K_DIMS,
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q.astype(jnp.float32), _DST_Q_DIMS,
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(N, Tq, Tk, D, mask_heads):
    # One program per batch element; blocks carry all heads so the kernel's
    # dot_generals batch over N (fills the MXU far better than per-head
    # programs at these tiny T×D shapes).
    q_spec = pl.BlockSpec((1, N, Tq, D), lambda b: (b, 0, 0, 0))
    kv_spec = pl.BlockSpec((1, N, Tk, D), lambda b: (b, 0, 0, 0))
    m_spec = pl.BlockSpec((1, N if mask_heads else 1, Tq, Tk),
                          lambda b: (b, 0, 0, 0))
    return q_spec, kv_spec, m_spec


def _to_bntd(x):
    return x.transpose(0, 2, 1, 3)  # (B, T, N, D) → (B, N, T, D)


def _call_fwd(q, k, v, mask, seed, scale, dropout_rate):
    B, Tq, N, D = q.shape
    Tk = k.shape[1]
    mask_heads = mask.shape[1] == N
    q_spec, kv_spec, m_spec = _specs(N, Tq, Tk, D, mask_heads)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale,
                          dropout_rate=dropout_rate),
        grid=(B,),
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
    q_spec, kv_spec, m_spec = _specs(N, Tq, Tk, D, mask_heads)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale,
                          dropout_rate=dropout_rate),
        grid=(B,),
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
    if dropout_rate > 0.0 and dropout_seed is None:
        # A silent constant seed would reuse the identical keep-mask every
        # step/layer — statistically-correlated dropout with no symptom.
        raise ValueError("fused_attention: dropout_rate > 0 requires "
                         "dropout_seed")
    seed = (dropout_seed if dropout_seed is not None
            else jnp.zeros((1,), jnp.int32))
    seed = seed.reshape((1,)).astype(jnp.int32)
    scale = 1.0 / (D ** 0.5)
    rate = float(dropout_rate)

    # Under an active kernel mesh (>1 device) the kernel must be wrapped
    # in shard_map with the real activation layout — batch on 'data',
    # heads on 'model' (pallas has no SPMD rules; see ops/_mesh.py).
    # Attention is independent per (batch, head), so per-shard execution
    # is exact; only the in-kernel dropout stream needs a per-shard seed
    # offset (local program ids repeat across shards).
    from virtex_tpu.ops._mesh import active_mesh, mesh_axes
    data_par, model_par = mesh_axes()
    if data_par * model_par > 1:
        divisible = (B % data_par == 0 and N % model_par == 0
                     and (mask.shape[1] == 1
                          or mask.shape[1] % model_par == 0))
        if not divisible:
            # A plain pallas_call under a multi-device mesh is either
            # gathered (slow) or wrong — refuse rather than guess. The
            # XLA einsum path partitions natively but has no in-kernel
            # dropout.
            if rate > 0.0:
                raise ValueError(
                    f"fused_attention under a {data_par}x{model_par} mesh "
                    f"needs B % data == 0 and heads % model == 0 "
                    f"(got B={B}, N={N}); adjust batch/heads or disable "
                    "the kernel (VIRTEX_TPU_NO_PALLAS=1)")
            return xla_attention(q, k, v, mask)
    if data_par * model_par > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        qspec = P("data", None, "model", None)
        mspec = P("data", "model" if mask.shape[1] == N else None,
                  None, None)

        def body(q, k, v, mask, seed):
            if rate > 0.0:
                idx = (jax.lax.axis_index("data") * model_par
                       + jax.lax.axis_index("model"))
                seed = seed + idx * jnp.int32(1000003)
            return _fused_sdpa(q, k, v, mask, seed, scale, rate)

        return shard_map(body, mesh=active_mesh(),
                         in_specs=(qspec, qspec, qspec, mspec, P()),
                         out_specs=qspec, check_vma=False)(
            q, k, v, mask, seed)
    return _fused_sdpa(q, k, v, mask, seed, scale, rate)


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
