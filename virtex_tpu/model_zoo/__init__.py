from virtex_tpu.model_zoo.model_zoo import get

__all__ = ["get"]
