from virtex_tpu.optim.lr_schedules import (
    make_schedule,
    warmup_cosine_decay,
    warmup_linear_decay,
    warmup_multistep,
    warmup_no_decay,
)
from virtex_tpu.optim.optimizer import (
    build_optimizer,
    cnn_mask,
    decay_mask,
    lookahead,
    lookahead_slow_params,
    param_path_names,
    scale_by_dual_lr,
)

__all__ = [
    "make_schedule",
    "warmup_cosine_decay",
    "warmup_linear_decay",
    "warmup_multistep",
    "warmup_no_decay",
    "build_optimizer",
    "cnn_mask",
    "decay_mask",
    "lookahead",
    "lookahead_slow_params",
    "param_path_names",
    "scale_by_dual_lr",
]
