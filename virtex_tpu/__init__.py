r"""
virtex_tpu: a TPU-native (JAX / XLA / Pallas / pjit) visual-representation
pretraining framework with the full capabilities of kdexd/virtex (CVPR 2021):
joint CNN + transformer pretraining on COCO Captions via five pretext tasks,
autoregressive caption decoding, and downstream transfer of the backbone.

Built TPU-first: functional flax models, a single pjit-sharded train step on a
``jax.sharding.Mesh``, bf16 compute, optax optimization, orbax checkpoints,
Pallas fused attention over the 7x7 visual grid, and lax.while_loop KV-cached
decoding.
"""

__version__ = "0.1.0"

from virtex_tpu.config import Config

__all__ = ["Config", "__version__"]


def __getattr__(name):
    # Lazy submodule access (keeps `import virtex_tpu` light: no jax/flax
    # import until model code is actually touched).
    import importlib
    if name in {"data", "engine", "factories", "model_zoo", "models",
                "modules", "ops", "optim", "parallel", "utils"}:
        return importlib.import_module(f"virtex_tpu.{name}")
    raise AttributeError(f"module 'virtex_tpu' has no attribute {name!r}")
