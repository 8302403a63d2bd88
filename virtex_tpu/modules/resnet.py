r"""
ResNet visual backbones in JAX/flax, NHWC (TPU-native) layout.

Behavioral parity target: the reference wraps torchvision ResNets and returns
the layer4 spatial grid, skipping avgpool/fc
(``virtex/modules/visual_backbones.py:20-74``); pretraining uses
``zero_init_residual=True`` (``visual_backbones.py:43-45``). This module
re-implements the architecture family from its published description
(He et al. 2016; torchvision "v1.5" stride-on-3x3 variant) directly in flax:

- NHWC everywhere (XLA:TPU's preferred conv layout; the reference's NCHW is a
  CUDA convention and would force transposes on TPU).
- BatchNorm state in a ``batch_stats`` collection; flax ``momentum=0.9``
  equals the torch ``momentum=0.1`` running-average convention.
- ``zero_init_residual``: the last BN scale of every residual branch starts
  at zero so each block is the identity at init.
- Compute dtype is configurable (bfloat16 default on TPU); parameters and BN
  statistics stay float32.

Supported names (factory grammar ``torchvision::<name>`` kept for config
compatibility): resnet18/34/50/101/152, wide_resnet50_2, resnext50_32x4d,
resnext101_32x8d.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from virtex_tpu.modules.normalization import SubsampledBatchNorm

ModuleDef = Any


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 1
    base_width: int = 64
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, name="conv2")(y)
        # Residual-branch-final BN: scale zero-initialised (zero_init_residual).
        y = self.norm(scale_init=nn.initializers.zeros, name="bn2")(y)
        if self.downsample:
            residual = self.conv(
                self.planes * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 4
    base_width: int = 64
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        residual = x
        y = self.conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        # Stride on the 3x3 conv (torchvision v1.5 placement).
        y = self.conv(width, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      feature_group_count=self.groups, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      name="conv3")(y)
        y = self.norm(scale_init=nn.initializers.zeros, name="bn3")(y)
        if self.downsample:
            residual = self.conv(
                self.planes * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class SpaceToDepthStem(nn.Module):
    r"""Weight-equivalent space-to-depth reparametrisation of the ResNet stem
    conv (7x7, stride 2, pad 3) — the MLPerf-era TPU trick: a stride-2 conv
    on a 3-channel image underfills the MXU's 128-wide contraction lanes;
    rearranging 2x2 pixel blocks into channels turns it into a stride-1
    4x4 conv over 4x the channels with identical outputs.

    Derivation: pad the 7x7 kernel to 8x8 with a zero row/col at the
    top/left (taps at offsets -4..+3), pad the image by 4 on every side,
    space-to-depth both by 2, run the 4x4 conv VALID at stride 1, and drop
    the one extra trailing output row/col. Every output pixel sums exactly
    the same products as the original conv.

    The parameter is the ORIGINAL (7, 7, C, F) HWIO kernel under the same
    ``conv1`` name, so checkpoints, the torch converter and the Detectron2
    export contract are untouched by this knob.
    """
    features: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (7, 7, c, self.features), jnp.float32)
        k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k = k.reshape(4, 2, 4, 2, c, self.features)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        b, h, w, _ = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, :-1, :-1, :]


class ResNet(nn.Module):
    r"""ResNet trunk emitting the layer4 spatial grid (B, H/32, W/32, C_out)
    — the reference's (B, 2048, 7, 7) in NHWC (``visual_backbones.py:68-74``).

    Attributes:
        stage_sizes: blocks per stage, e.g. (3, 4, 6, 3) for ResNet-50.
        block_cls: BasicBlock or Bottleneck.
        dtype: compute dtype (bfloat16 on TPU); params/stats stay float32.
    """
    stage_sizes: Sequence[int]
    block_cls: ModuleDef = Bottleneck
    num_filters: int = 64
    base_width: int = 64
    groups: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    bn_momentum: float = 0.9  # == torch momentum 0.1
    bn_eps: float = 1e-5
    # Training-time BN statistics row stride (modules/normalization.py):
    # >1 estimates mean/var from every Nth spatial row, cutting the BN-stat
    # HBM reduction passes by that factor. 1 = exact full-tensor BN.
    bn_stat_stride: int = 1
    # Space-to-depth stem (see SpaceToDepthStem): weight-equivalent MXU
    # layout for the stride-2 stem conv. Same param tree either way.
    stem_s2d: bool = False
    # Rematerialise each residual block in backward (jax.checkpoint):
    # activation HBM ~ one block instead of the whole trunk, at the cost of
    # a second forward pass in backward. Bit-exact; param tree and BN-stat
    # updates unchanged (verified in tests/test_remat.py).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        # torchvision's conv init: kaiming_normal(mode='fan_out',
        # nonlinearity='relu') — std sqrt(2/fan_out). flax's default
        # lecun_normal (fan_in, ~3x larger std for the stem) would
        # silently change from-scratch training dynamics vs the
        # reference (torchvision resnet.py _resnet init).
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=nn.initializers.variance_scaling(
                           2.0, 'fan_out', 'normal'))
        norm = partial(SubsampledBatchNorm, use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=self.bn_eps,
                       stat_stride=self.bn_stat_stride,
                       dtype=self.dtype, param_dtype=jnp.float32)
        x = x.astype(self.dtype)
        if self.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = SpaceToDepthStem(features=self.num_filters,
                                 dtype=self.dtype, name="conv1")(x)
        else:
            x = conv(self.num_filters, (7, 7), strides=(2, 2),
                     padding=[(3, 3), (3, 3)], use_bias=False,
                     name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        expansion = self.block_cls.expansion
        block_cls = nn.remat(self.block_cls) if self.remat else self.block_cls
        in_planes = self.num_filters
        for stage, num_blocks in enumerate(self.stage_sizes):
            planes = self.num_filters * (2 ** stage)
            for block in range(num_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                needs_down = stride != 1 or in_planes != planes * expansion
                x = block_cls(
                    planes=planes, stride=stride, downsample=needs_down,
                    conv=conv, norm=norm, base_width=self.base_width,
                    groups=self.groups,
                    name=f"layer{stage + 1}_{block}")(x)
                in_planes = planes * expansion
        return x


_RESNET_DEFS = {
    "resnet18": dict(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock),
    "resnet34": dict(stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock),
    "resnet50": dict(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck),
    "resnet101": dict(stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck),
    "resnet152": dict(stage_sizes=(3, 8, 36, 3), block_cls=Bottleneck),
    "wide_resnet50_2": dict(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck,
                            base_width=128),
    "resnext50_32x4d": dict(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck,
                            base_width=4, groups=32),
    "resnext101_32x8d": dict(stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck,
                             base_width=8, groups=32),
}


def feature_size(name: str) -> int:
    """Output channel count of the layer4 grid for a named ResNet."""
    d = _RESNET_DEFS[name]
    return 512 * d["block_cls"].expansion


def make_resnet(name: str, dtype: jnp.dtype = jnp.bfloat16,
                bn_stat_stride: int = 1, stem_s2d: bool = False,
                remat: bool = False) -> ResNet:
    if name not in _RESNET_DEFS:
        raise ValueError(
            f"Unknown resnet {name!r}; supported: {sorted(_RESNET_DEFS)}")
    return ResNet(dtype=dtype, bn_stat_stride=bn_stat_stride,
                  stem_s2d=stem_s2d, remat=remat, **_RESNET_DEFS[name])
