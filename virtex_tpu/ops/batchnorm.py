r"""
BatchNorm training-mode custom VJP with a fused Pallas backward reduction.

Why (docs/design.md "Round-2 kernel micro"): the BN backward needs two
full-tensor channel reductions — dβ = Σ dy and dγ = Σ dy·x̂ — plus the
gradient of the batch statistics themselves. XLA autodiff runs the
reductions at ~3.1× the HBM floor at the ResNet-50 layer1 shape (1.56 ms
vs 0.50 ms for one pass over dy and x) and pays a further elementwise
scatter pass for the statistics gradient. This op:

- keeps the FORWARD as plain jnp (identical math to
  :class:`~virtex_tpu.modules.normalization.SubsampledBatchNorm`'s exact
  path) so XLA still co-fuses the statistics pass with the producing conv
  — a Pallas forward would *add* an HBM pass, not remove one;
- replaces the whole BACKWARD with the analytic BN gradient
  ``dx = γ·rstd·(dy − dβ/M − x̂·dγ/M)`` where (dβ, dγ) come from ONE
  fused Pallas pass reading dy and x once, and the dx elementwise stage
  stays jnp so XLA can fuse it into the neighbouring conv backward.

The reference gets the equivalent fusion for free from cuDNN's
``batch_norm_backward`` (reference ``virtex/modules/visual_backbones.py:43``
builds torchvision ResNets whose BN lowers to it).

Layout notes (TPU): NHWC tensors are viewed as (M, C) with C on lanes.
C < 128 (the stem's 64) is folded two-pixels-per-row to keep lanes full;
the per-lane partial sums are then summed pairwise outside the kernel.
The block's row count is the largest power-of-two divisor of M within a
VMEM budget — shapes whose M lacks 2-factors fall back to XLA autodiff.

Status: CORRECT but opt-in (``VIRTEX_TPU_PALLAS_BN=1``) — the round-3
end-to-end A/B measured a ~35% train-step REGRESSION on v5e despite the
micro-level win; see :func:`bn_kernel_enabled` and docs/design.md
"BN-backward custom VJP: closed NEGATIVE". CPU tests run the same kernel
in interpret mode.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU test hosts
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_LANES = 128
# Per-block element budget: bf16 block ≈ 2 MB → two double-buffered input
# streams ≈ 8 MB VMEM, comfortably inside the ~16 MB/core budget.
_BLOCK_ELEMS = 1 << 20


def bn_kernel_enabled() -> bool:
    """Default OFF — opt in with ``VIRTEX_TPU_PALLAS_BN=1`` (TPU only).

    Measured round 3 (docs/design.md "BN-backward custom VJP: closed
    NEGATIVE"): the kernel is exact (tests/tpu_bn_parity.py) and beats
    XLA at the micro level, but END-TO-END the train step REGRESSES
    ~35% (1270 vs 1960 img/s) — the 53 opaque custom calls in the
    backward break XLA's fusion/scheduling around them. Kept for other
    hardware/XLA versions where the trade-off may differ."""
    if not os.environ.get("VIRTEX_TPU_PALLAS_BN"):
        return False
    if os.environ.get("VIRTEX_TPU_NO_PALLAS"):
        return False
    if os.environ.get("VIRTEX_TPU_NO_PALLAS_BN"):
        return False
    if pltpu is None:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pow2_divisor(n: int) -> int:
    return n & -n


def _plan(M: int, C: int) -> Optional[Tuple[int, int, int]]:
    """Choose (fold, BM, C_eff) for the reduce kernel, or None → XLA path.

    fold: pixels folded per row so C_eff = fold·C ≥ 128 lanes.
    BM: rows per block — a power-of-two divisor of M_eff within budget.
    """
    if C >= _LANES:
        if C % _LANES:
            return None
        fold = 1
    else:
        if _LANES % C:
            return None
        fold = _LANES // C
        if M % fold:
            return None
    c_eff = C * fold
    m_eff = M // fold
    cap = max(16, _pow2_divisor(max(16, _BLOCK_ELEMS // c_eff)))
    bm = min(_pow2_divisor(m_eff), cap)
    if bm < 16 and bm < m_eff:
        return None  # not enough 2-factors to tile cleanly
    bm = min(bm, m_eff)
    return fold, bm, c_eff


def bn_backward_shape_supported(shape) -> bool:
    """True when the fused reduce kernel can tile this NHWC shape — the
    PER-SHARD shape when a kernel mesh is active (batch sharded over
    'data', see ops/_mesh.py)."""
    from virtex_tpu.ops._mesh import mesh_axes
    data_par, _ = mesh_axes()
    shape = tuple(shape)
    if data_par > 1:
        if shape[0] % data_par:
            return False
        shape = (shape[0] // data_par,) + shape[1:]
    C = shape[-1]
    M = 1
    for s in shape[:-1]:
        M *= s
    return _plan(M, C) is not None


def _reduce_kernel(dy_ref, x_ref, mv_ref, out_ref):
    # The out block's index map is constant, so its VMEM buffer persists
    # across grid steps — accumulate into it directly (flushed to HBM once
    # at the end of the grid).
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    dy = dy_ref[...].astype(jnp.float32)            # (BM, C)
    x = x_ref[...].astype(jnp.float32)
    xhat = (x - mv_ref[0:1, :]) * mv_ref[1:2, :]    # (x − μ)·rstd
    db = jnp.sum(dy, axis=0, keepdims=True)
    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)
    out_ref[...] += jnp.concatenate([db, dg], axis=0)


def _sums_call(dy, x, mean, rstd, interpret: bool) -> jnp.ndarray:
    """One fused Pallas pass over (this shard of) dy and x → (2, C) f32
    ``[Σ dy; Σ dy·x̂]``. Caller guarantees the shape tiles (``_plan``)."""
    C = x.shape[-1]
    M = x.size // C
    fold, bm, c_eff = _plan(M, C)
    m_eff = M // fold

    dy2 = dy.reshape(m_eff, c_eff)
    x2 = x.reshape(m_eff, c_eff)
    mv = jnp.stack([jnp.tile(mean.astype(jnp.float32), fold),
                    jnp.tile(rstd.astype(jnp.float32), fold)])  # (2, C_eff)

    data_spec = pl.BlockSpec((bm, c_eff), lambda i: (i, 0))
    mv_spec = pl.BlockSpec((2, c_eff), lambda i: (0, 0))
    sums = pl.pallas_call(
        _reduce_kernel,
        grid=(m_eff // bm,),
        in_specs=[data_spec, data_spec, mv_spec],
        out_specs=pl.BlockSpec((2, c_eff), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, c_eff), jnp.float32),
        interpret=interpret,
    )(dy2, x2, mv)
    if fold > 1:
        sums = sums.reshape(2, fold, C).sum(axis=1)
    return sums


def bn_backward_sums(dy: jnp.ndarray, x: jnp.ndarray, mean: jnp.ndarray,
                     rstd: jnp.ndarray, *, interpret: bool = False
                     ) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Fused (dβ, dγ) = (Σ dy, Σ dy·x̂) over all but the channel axis.

    One Pallas pass reading ``dy`` and ``x`` once. Returns float32 (C,)
    pairs, or None when the shape doesn't tile (caller falls back to XLA).

    Under an active kernel mesh (ops/_mesh.py) with >1 'data' shard the
    pass runs per shard inside ``shard_map`` and the partial sums are
    ``psum``-reduced over 'data' — pallas has no SPMD rules, so without
    this the reductions would be per-shard (wrong) or gathered (slow).
    """
    if pltpu is None and not interpret:
        return None
    if not bn_backward_shape_supported(x.shape):
        return None

    from virtex_tpu.ops._mesh import active_mesh, mesh_axes
    data_par, _ = mesh_axes()
    if data_par > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def body(dy, x, mean, rstd):
            return jax.lax.psum(_sums_call(dy, x, mean, rstd, interpret),
                                "data")

        sums = shard_map(body, mesh=active_mesh(),
                         in_specs=(P("data"), P("data"), P(), P()),
                         out_specs=P(), check_vma=False)(
            dy, x, mean.astype(jnp.float32), rstd.astype(jnp.float32))
    else:
        sums = _sums_call(dy, x, mean, rstd, interpret)
    return sums[0], sums[1]


def _bn_forward(x, scale, bias, eps, dtype):
    """Exact-BN forward, identical math/dtype staging to the module's jnp
    path (normalization.py) so toggling the kernel changes nothing
    numerically in the forward."""
    reduce_axes = tuple(range(x.ndim - 1))
    xf32 = x.astype(jnp.float32)
    mean = jnp.mean(xf32, axis=reduce_axes)
    mean2 = jnp.mean(jnp.square(xf32), axis=reduce_axes)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    rstd = 1.0 / jnp.sqrt(var + eps)
    stats_shape = (1,) * (x.ndim - 1) + (x.shape[-1],)
    y = x.astype(dtype)
    mul = (jnp.reshape(rstd, stats_shape)
           * jnp.reshape(scale, stats_shape)).astype(dtype)
    y = (y - jnp.reshape(mean, stats_shape).astype(dtype)) * mul
    y = y + jnp.reshape(bias, stats_shape).astype(dtype)
    return y.astype(dtype), mean, var, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def bn_train(x, scale, bias, eps: float, dtype=jnp.bfloat16,
             interpret: bool = False):
    """Training-mode BatchNorm over all but the last axis.

    Returns ``(y, mean, var)`` — mean/var feed the running-statistics
    update exactly like the jnp path. Forward is jnp (XLA-fused with the
    producing conv); backward is the analytic BN gradient with the channel
    reductions fused into one Pallas pass (falls back to an equivalent jnp
    reduction when the shape doesn't tile).
    """
    y, mean, var, _ = _bn_forward(x, scale, bias, eps, dtype)
    return y, mean, var


def _bn_train_fwd(x, scale, bias, eps, dtype, interpret):
    y, mean, var, rstd = _bn_forward(x, scale, bias, eps, dtype)
    return (y, mean, var), (x, mean, rstd, scale)


def _bn_train_bwd(eps, dtype, interpret, res, cts):
    x, mean, rstd, scale = res
    dy, gmean, gvar = cts
    C = x.shape[-1]
    M = x.size // C

    sums = bn_backward_sums(dy, x, mean, rstd, interpret=interpret)
    if sums is None:  # non-tiling shape: same math, XLA reductions
        reduce_axes = tuple(range(x.ndim - 1))
        dyf = dy.astype(jnp.float32)
        xhat_full = ((x.astype(jnp.float32)
                      - mean.reshape((1,) * (x.ndim - 1) + (C,)))
                     * rstd.reshape((1,) * (x.ndim - 1) + (C,)))
        db = jnp.sum(dyf, axis=reduce_axes)
        dg = jnp.sum(dyf * xhat_full, axis=reduce_axes)
    else:
        db, dg = sums

    stats_shape = (1,) * (x.ndim - 1) + (C,)
    mean_b = jnp.reshape(mean, stats_shape)
    rstd_b = jnp.reshape(rstd, stats_shape)
    inv_m = 1.0 / M

    # Analytic train-mode BN input gradient (statistics gradient folded):
    #   dx = γ·rstd·(dy − dβ/M − x̂·dγ/M)
    # plus the cotangents of the (mean, var) outputs themselves, which the
    # running-stat update receives as zeros at runtime:
    #   dx += gmean/M + gvar·2(x−μ)/M
    xm = x.astype(jnp.float32) - mean_b
    xhat = xm * rstd_b
    dx = (jnp.reshape(scale, stats_shape).astype(jnp.float32) * rstd_b
          * (dy.astype(jnp.float32)
             - jnp.reshape(db, stats_shape) * inv_m
             - xhat * jnp.reshape(dg, stats_shape) * inv_m))
    dx = dx + jnp.reshape(gmean, stats_shape) * inv_m
    dx = dx + jnp.reshape(gvar, stats_shape) * (2.0 * inv_m) * xm
    return (dx.astype(x.dtype), dg.astype(scale.dtype),
            db.astype(scale.dtype))


bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)
