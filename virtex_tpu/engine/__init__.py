from virtex_tpu.engine.checkpointing import (
    CheckpointManager,
    apply_backbone_weight_init,
    load_checkpoint,
    load_model_variables,
)
from virtex_tpu.engine.captioner import (
    cast_decode_params,
    decode_predictions,
    make_caption_fn,
)
from virtex_tpu.engine.train_state import TrainState
from virtex_tpu.engine.trainer import (
    initialize_model,
    make_eval_step,
    make_train_step,
    place_state,
    state_mesh_sharding,
)

__all__ = [
    "CheckpointManager",
    "apply_backbone_weight_init",
    "load_checkpoint",
    "load_model_variables",
    "cast_decode_params",
    "decode_predictions",
    "make_caption_fn",
    "TrainState",
    "initialize_model",
    "make_eval_step",
    "make_train_step",
    "place_state",
    "state_mesh_sharding",
]
