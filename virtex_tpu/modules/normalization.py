r"""
BatchNorm with optionally subsampled training statistics — the TPU
HBM-bandwidth fix for the dominant non-conv cost in the train step.

Why this exists (measured profile, docs/design.md): BatchNorm's statistics
reductions re-read every conv activation from HBM (bf16→f32 convert+reduce,
forward and backward) and accounted for 36.5% of the ResNet-50 train step.
The normalize *apply* fuses into neighbouring elementwise work, but the
mean/variance reduction is an unavoidable extra pass over the full tensor —
unless we estimate the statistics from a subsample.

Two sampling schemes (``stat_sample``), both gated on ``stat_stride > 1``:

- ``"batch"`` (the DEFAULT): statistics from the leading ``b // stride``
  images (clamped to ≥ ``b // 8``) — a contiguous batch prefix, which is
  exactly the reference's per-GPU sample size when stride = number of
  GPUs (the reference trains *unsynced* per-GPU BN; SURVEY §7 hard
  parts).
- ``"rows"``: every ``stride``-th spatial ROW (``x[:, ::stride]``). Rows
  are contiguous in TPU memory (W×C spans whole HBM transfer chunks), so
  the slice genuinely skips traffic, unlike a lane-dim stride. Small
  feature maps keep more rows via the ``max(1, min(stride, H // 4))``
  clamp (≥4 rows whenever H ≥ 8; the 7×7 layer4 grid is never
  subsampled).

In both schemes the gradient of the statistics flows only through the
sampled slice (autodiff), shrinking the backward stats pass by the same
factor, and sample counts stay huge (batch 128 at 56² with stride 4:
~100k elements per channel either way).

With ``stat_stride=1`` this is exactly standard BatchNorm (parity with
``flax.linen.BatchNorm`` is unit-tested), which stays the semantic
reference. Parameter/stat names (``scale``/``bias``, ``mean``/``var``)
match ``nn.BatchNorm`` so checkpoint conversion (reference
``running_mean``/``running_var`` → ``mean``/``var``) is unchanged.

Statistics are computed over the *global* (sharded) batch — XLA inserts the
cross-chip reduction from the batch sharding, i.e. sync-BN by construction
(see ``engine/trainer.py`` note).

Running-variance updates apply Bessel's correction (×n/(n−1), n = elements
per channel in the stats sample) like torch ``BatchNorm2d`` — the reference's
training semantics (torch ``_BatchNorm`` tracks the *unbiased* variance while
normalizing with the biased one; flax tracks the biased one). At real batch
sizes the factor is ~1+2.5e-6, but the 7-step training-trajectory parity gate
(tests/test_train_trajectory_parity.py) resolves the difference on its 2×2
layer4 grids.
"""
from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from virtex_tpu.ops import batchnorm

Dtype = Any


class SubsampledBatchNorm(nn.Module):
    r"""BatchNorm whose training statistics come from a row-strided spatial
    subsample.

    Attributes:
        use_running_average: eval mode — normalize with stored statistics.
        momentum: running-average decay (flax convention: 0.9 ≡ torch 0.1).
        epsilon: numerical floor added to the variance.
        dtype: compute dtype of the normalized output.
        param_dtype: dtype of scale/bias and running statistics.
        stat_stride: training-time row stride for statistics (1 = exact BN).
        scale_init: initializer for scale (zeros for zero_init_residual).
    """
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    stat_stride: int = 1
    # How the training statistics sample is drawn when stat_stride > 1:
    #   "batch": leading B/stride images, full spatial extent — a contiguous
    #     slice whose gradient is a pad (fuses; strided-row gathers measured
    #     SLOWER on TPU), and statistically the reference's per-GPU BN (the
    #     reference computes stats over its local batch-32 shard).
    #   "rows": every stride-th spatial row (kept for experiments).
    stat_sample: str = "batch"
    use_scale: bool = True
    use_bias: bool = True
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, self.param_dtype))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, self.param_dtype))

        def update_running(mean, var, n):
            # torch _BatchNorm semantics: EMA of the UNBIASED variance
            # (Bessel ×n/(n−1)), biased var used for normalization.
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var
                            * (n / max(n - 1, 1)))

        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
        elif (self.stat_stride == 1 and x.ndim == 4
              and self.use_scale and self.use_bias
              and batchnorm.bn_kernel_enabled()
              and batchnorm.bn_backward_shape_supported(x.shape)):
            # Exact BN via the custom-VJP op: identical jnp forward (still
            # conv-co-fused by XLA), analytic backward with the dβ/dγ
            # channel reductions fused into one Pallas pass
            # (ops/batchnorm.py; reference gets cuDNN's fused BN-grad,
            # virtex/modules/visual_backbones.py:43).
            scale = self.param("scale", self.scale_init, (features,),
                               self.param_dtype)
            bias = self.param("bias", self.bias_init, (features,),
                              self.param_dtype)
            y, mean, var = batchnorm.bn_train(x, scale, bias,
                                              float(self.epsilon),
                                              self.dtype)
            if not self.is_initializing():
                update_running(mean, var, x.size // features)
            return y
        else:
            sample = x
            if x.ndim == 4 and self.stat_stride > 1:
                if self.stat_sample == "batch":
                    b = x.shape[0]
                    # keep ≥8 images in the sample; tiny batches stay exact
                    div = max(1, min(self.stat_stride, b // 8))
                    if div > 1:
                        sample = x[: b // div]
                elif self.stat_sample == "rows":
                    h = x.shape[1]
                    # keep ≥4 rows whenever possible; tiny grids stay exact
                    stride = max(1, min(self.stat_stride, h // 4))
                    if stride > 1:
                        sample = x[:, ::stride]
                else:
                    raise ValueError(
                        f"unknown stat_sample {self.stat_sample!r}")
            reduce_axes = tuple(range(sample.ndim - 1))
            sf32 = sample.astype(jnp.float32)
            mean = jnp.mean(sf32, axis=reduce_axes)
            # fast variance E[x²] − E[x]² (one fused pass over the sample)
            mean2 = jnp.mean(jnp.square(sf32), axis=reduce_axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                update_running(mean, var, sample.size // features)

        y = x.astype(self.dtype)
        stats_shape = (1,) * (x.ndim - 1) + (features,)
        mul = jnp.reshape(1.0 / jnp.sqrt(var + self.epsilon), stats_shape)
        if self.use_scale:
            scale = self.param("scale", self.scale_init, (features,),
                               self.param_dtype)
            mul = mul * jnp.reshape(scale, stats_shape)
        y = (y - jnp.reshape(mean, stats_shape).astype(self.dtype)) \
            * mul.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (features,),
                              self.param_dtype)
            y = y + jnp.reshape(bias, stats_shape).astype(self.dtype)
        return y.astype(self.dtype)
