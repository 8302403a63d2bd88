from virtex_tpu.modules.embedding import WordAndPositionalEmbedding
from virtex_tpu.modules.resnet import ResNet, feature_size, make_resnet
from virtex_tpu.modules.textual_heads import (
    LinearTextualHead,
    TransformerTextualHead,
)
from virtex_tpu.modules.transformer import (
    DecoderLayer,
    MultiHeadAttention,
    TransformerDecoder,
    make_self_attention_mask,
)
from virtex_tpu.modules.visual_backbones import (
    ResNetVisualBackbone,
    TorchvisionVisualBackbone,
    detectron2_backbone_state_dict,
)

__all__ = [
    "WordAndPositionalEmbedding",
    "ResNet",
    "feature_size",
    "make_resnet",
    "LinearTextualHead",
    "TransformerTextualHead",
    "DecoderLayer",
    "MultiHeadAttention",
    "TransformerDecoder",
    "make_self_attention_mask",
    "ResNetVisualBackbone",
    "TorchvisionVisualBackbone",
    "detectron2_backbone_state_dict",
]
