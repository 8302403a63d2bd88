from . import roi_heads  # noqa: F401
