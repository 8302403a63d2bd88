from virtex_tpu.ops.attention import (
    fused_attention,
    pallas_available,
    xla_attention,
)

__all__ = ["fused_attention", "pallas_available", "xla_attention"]
