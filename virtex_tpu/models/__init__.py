from virtex_tpu.models.captioning import (
    BidirectionalCaptioningModel,
    CaptioningModel,
    ForwardCaptioningModel,
    VirTexModel,
    token_cross_entropy,
)
from virtex_tpu.models.classification import (
    ClassificationModel,
    MultiLabelClassificationModel,
    TokenClassificationModel,
    instance_label_set_loss,
)
from virtex_tpu.models.masked_lm import MaskedLMModel

__all__ = [
    "BidirectionalCaptioningModel",
    "CaptioningModel",
    "ForwardCaptioningModel",
    "VirTexModel",
    "token_cross_entropy",
    "ClassificationModel",
    "MultiLabelClassificationModel",
    "TokenClassificationModel",
    "instance_label_set_loss",
    "MaskedLMModel",
]
