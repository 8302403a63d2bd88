r"""
Hub-style entry point: a pretrained VirTex ResNet-50 feature extractor.

Parity target: reference ``hubconf.py:10-35`` —
``torch.hub.load("kdexd/virtex", "resnet50")`` returns the CNN with
avgpool/fc stripped, emitting the 7×7×2048 spatial grid. Here
``resnet50(pretrained)`` returns ``(apply_fn, variables)`` where
``apply_fn(variables, images_nhwc)`` → (B, 7, 7, 2048) features; weights
come from the local zoo (see :mod:`virtex_tpu.model_zoo`).
"""
from __future__ import annotations

dependencies = ["jax", "flax"]


def resnet50(pretrained: bool = False, **kwargs):
    import jax

    from virtex_tpu import model_zoo

    model, variables, _C = model_zoo.get(
        "width_ablations/bicaptioning_R_50_L1_H1024.yaml",
        pretrained=pretrained)

    backbone_vars = {
        "params": {"cnn": variables["params"]["visual"]["cnn"]},
        "batch_stats": {"cnn": variables["batch_stats"]["visual"]["cnn"]},
    }
    visual = model.visual

    @jax.jit
    def apply_fn(vars_, images):
        return visual.apply(vars_, images, train=False)

    return apply_fn, backbone_vars


def resnet50_extractor(pretrained: bool = False, **kwargs):
    r"""The reference-shaped contract: ONE callable, ``f(images) ->
    (B, 7, 7, 2048)`` features — what ``torch.hub.load(...)(image_batch)``
    gives reference users, with the variables closed over. Accepts NHWC
    float arrays (jax or numpy); NCHW torch-convention input is
    transposed automatically (detected by the channel axis)."""
    import jax.numpy as jnp

    apply_fn, variables = resnet50(pretrained=pretrained, **kwargs)

    def extractor(images):
        images = jnp.asarray(images, jnp.float32)
        if images.ndim != 4:
            raise ValueError(f"expected (B, H, W, 3) images, got "
                             f"{images.shape}")
        if images.shape[1] == 3 and images.shape[-1] != 3:
            images = images.transpose(0, 2, 3, 1)  # NCHW → NHWC
        return apply_fn(variables, images)

    return extractor
