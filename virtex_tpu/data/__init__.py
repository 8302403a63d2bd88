from virtex_tpu.data.datasets.captioning import CaptioningDataset
from virtex_tpu.data.datasets.classification import (
    MultiLabelClassificationDataset,
    TokenClassificationDataset,
)
from virtex_tpu.data.datasets.downstream import (
    ImageDirectoryDataset,
    ImageNetDataset,
    INaturalist2018Dataset,
    VOC07ClassificationDataset,
)
from virtex_tpu.data.datasets.masked_lm import MaskedLmDataset
from virtex_tpu.data.loader import DataLoader, ShardedSampler
from virtex_tpu.data.readers import CocoCaptionsReader
from virtex_tpu.data.tokenizers import SentencePieceBPETokenizer, train_tokenizer

__all__ = [
    "CaptioningDataset",
    "TokenClassificationDataset",
    "MultiLabelClassificationDataset",
    "ImageDirectoryDataset",
    "ImageNetDataset",
    "INaturalist2018Dataset",
    "VOC07ClassificationDataset",
    "MaskedLmDataset",
    "DataLoader",
    "ShardedSampler",
    "CocoCaptionsReader",
    "SentencePieceBPETokenizer",
    "train_tokenizer",
]
