from virtex_tpu.ops.attention import (
    fused_attention,
    pallas_available,
    xla_attention,
)
from virtex_tpu.ops.batchnorm import (
    bn_backward_shape_supported,
    bn_kernel_enabled,
    bn_train,
)

__all__ = ["fused_attention", "pallas_available", "xla_attention",
           "bn_train", "bn_kernel_enabled", "bn_backward_shape_supported"]
