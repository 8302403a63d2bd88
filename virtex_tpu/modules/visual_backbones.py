r"""
Visual backbone wrapper + Detectron2 export contract.

Parity target: ``virtex/modules/visual_backbones.py:8-120`` — a backbone that
returns the layer4 spatial grid (no pooling/classifier), an optional frozen
mode, and ``detectron2_backbone_state_dict()`` which renames parameters to
Detectron2's ResNet convention (layer1→res2 … stem prefix) so pretrained
checkpoints flow into Detectron2 unchanged (``visual_backbones.py:76-120``).

TPU-native notes: grids are NHWC; the Detectron2 export transposes conv
kernels to torch OIHW layout and emits numpy arrays, so the output dict can
be serialised with ``torch.save``/pickle and consumed by an unmodified
Detectron2 on GPU hosts.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from virtex_tpu.modules.resnet import feature_size, make_resnet


class ResNetVisualBackbone(nn.Module):
    r"""Wraps a :class:`~virtex_tpu.modules.resnet.ResNet`; forward emits the
    (B, Hg, Wg, C) layer4 grid — the reference's (B, 2048, 7, 7) in NHWC
    (``visual_backbones.py:68-74``).

    ``frozen=True`` reproduces the reference's frozen mode
    (``visual_backbones.py:50-53``): BN uses running statistics and no
    gradient flows into the CNN.
    """
    name_or_arch: str = "resnet50"
    frozen: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    bn_stat_stride: int = 1  # see modules/normalization.py
    stem_s2d: bool = False  # see modules/resnet.py SpaceToDepthStem
    remat: bool = False  # per-block activation remat (modules/resnet.py)

    def setup(self):
        self.cnn = make_resnet(self.name_or_arch, dtype=self.dtype,
                               bn_stat_stride=self.bn_stat_stride,
                               stem_s2d=self.stem_s2d, remat=self.remat)

    def __call__(self, image: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # uint8 feed path: ImageNet normalization happens HERE on device
        # (fuses into the stem conv) so the host ships 4x fewer bytes.
        if jnp.issubdtype(image.dtype, jnp.integer):
            mean = jnp.asarray([0.485, 0.456, 0.406], self.dtype)
            std = jnp.asarray([0.229, 0.224, 0.225], self.dtype)
            image = (image.astype(self.dtype) / 255.0 - mean) / std
        if self.frozen:
            out = self.cnn(image, train=False)
            return jax.lax.stop_gradient(out)
        return self.cnn(image, train=train)

    @property
    def visual_feature_size(self) -> int:
        return feature_size(self.name_or_arch)


# alias kept so configs/docs referring to the reference class name still read
TorchvisionVisualBackbone = ResNetVisualBackbone


def _conv_to_torch(kernel: jnp.ndarray) -> np.ndarray:
    """flax HWIO conv kernel → torch OIHW (single shared implementation —
    a drifting second copy of the layout transpose is a silent-corruption
    hazard)."""
    from virtex_tpu.utils.checkpoint_convert import _f_conv
    return _f_conv(jax.device_get(kernel))


def _emit_block(out: Dict[str, np.ndarray], prefix: str,
                params: Dict[str, Any], stats: Dict[str, Any]) -> None:
    for conv_name, torch_name in [("conv1", "conv1"), ("conv2", "conv2"),
                                  ("conv3", "conv3"),
                                  ("downsample_conv", "shortcut")]:
        if conv_name in params:
            out[f"{prefix}.{torch_name}.weight"] = _conv_to_torch(
                params[conv_name]["kernel"])
    for bn_name, torch_name in [("bn1", "conv1.norm"), ("bn2", "conv2.norm"),
                                ("bn3", "conv3.norm"),
                                ("downsample_bn", "shortcut.norm")]:
        if bn_name in params:
            p, s = params[bn_name], stats[bn_name]
            out[f"{prefix}.{torch_name}.weight"] = np.asarray(p["scale"])
            out[f"{prefix}.{torch_name}.bias"] = np.asarray(p["bias"])
            out[f"{prefix}.{torch_name}.running_mean"] = np.asarray(s["mean"])
            out[f"{prefix}.{torch_name}.running_var"] = np.asarray(s["var"])


def detectron2_backbone_state_dict(
    cnn_params: Dict[str, Any], cnn_batch_stats: Dict[str, Any]
) -> Dict[str, Any]:
    r"""Rename this backbone's variables to Detectron2 convention
    (reference ``visual_backbones.py:76-120``): ``layer1 → res2`` …
    ``layer4 → res5``, BN folded under ``conv.norm``, stem prefix.

    Args:
        cnn_params: the ``params`` collection of the inner ResNet (i.e.
            ``variables["params"]["cnn"]``).
        cnn_batch_stats: matching ``batch_stats`` collection.

    Returns:
        ``{"model": {torch_name: np.ndarray}, "__author__": …,
        "matching_heuristics": True}``.
    """
    out: Dict[str, np.ndarray] = {}
    # Stem.
    out["stem.conv1.weight"] = _conv_to_torch(cnn_params["conv1"]["kernel"])
    p, s = cnn_params["bn1"], cnn_batch_stats["bn1"]
    out["stem.conv1.norm.weight"] = np.asarray(p["scale"])
    out["stem.conv1.norm.bias"] = np.asarray(p["bias"])
    out["stem.conv1.norm.running_mean"] = np.asarray(s["mean"])
    out["stem.conv1.norm.running_var"] = np.asarray(s["var"])
    # Stages: layer{k}_{b} → res{k+1}.{b}
    for key in sorted(cnn_params):
        if not key.startswith("layer"):
            continue
        stage, block = key[len("layer"):].split("_")
        prefix = f"res{int(stage) + 1}.{int(block)}"
        _emit_block(out, prefix, cnn_params[key], cnn_batch_stats[key])
    return {
        "model": out,
        "__author__": "virtex_tpu",
        "matching_heuristics": True,
    }
