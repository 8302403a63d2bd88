r"""
Factories: create framework components from names / Config.

Parity target: reference ``virtex/factories.py:40-584`` — registry base with
``PRODUCTS`` + ``create(name, …)`` + ``from_config(Config)``, plus the two
string micro-grammars ``torchvision::resnet50`` (``factories.py:333-339``)
and ``transdec_{post,pre}norm::L{l}_H{h}_A{a}_F{f}`` (``:384-392``), and
transform kwargs via ``"name::{dict}"`` — parsed here with
``ast.literal_eval`` instead of the reference's ``eval``
(``factories.py:161-164``, SURVEY §5.6).
"""
from __future__ import annotations

import ast
import re
from functools import partial
from typing import Any, Callable, Dict, Iterable

import jax.numpy as jnp

from virtex_tpu.config import Config
from virtex_tpu.data import (
    CaptioningDataset,
    ImageNetDataset,
    INaturalist2018Dataset,
    MaskedLmDataset,
    MultiLabelClassificationDataset,
    SentencePieceBPETokenizer,
    TokenClassificationDataset,
    VOC07ClassificationDataset,
)
from virtex_tpu.data import transforms as T
from virtex_tpu.models import (
    BidirectionalCaptioningModel,
    ForwardCaptioningModel,
    MaskedLMModel,
    MultiLabelClassificationModel,
    TokenClassificationModel,
)
from virtex_tpu.modules.textual_heads import (
    LinearTextualHead,
    TransformerTextualHead,
)
from virtex_tpu.modules.visual_backbones import ResNetVisualBackbone
from virtex_tpu.optim import build_optimizer, make_schedule
from virtex_tpu.utils.beam_search import AutoRegressiveBeamSearch
from virtex_tpu.utils.nucleus_sampling import AutoRegressiveNucleusSampling


class Factory:
    r"""Base factory (reference ``factories.py:40-78``): non-instantiable
    registry with ``create`` by name and config-driven ``from_config``."""

    PRODUCTS: Dict[str, Callable] = {}

    def __init__(self):
        raise ValueError(
            f"Cannot instantiate {self.__class__.__name__}; "
            "call create(name, ...) instead.")

    @classmethod
    def create(cls, name: str, *args, **kwargs) -> Any:
        if name not in cls.PRODUCTS:
            raise KeyError(f"{cls.__name__} cannot create {name!r}; "
                           f"choices: {sorted(cls.PRODUCTS)}")
        return cls.PRODUCTS[name](*args, **kwargs)

    @classmethod
    def from_config(cls, config: Config, **kwargs) -> Any:
        raise NotImplementedError


class TokenizerFactory(Factory):
    PRODUCTS = {"SentencePieceBPETokenizer": SentencePieceBPETokenizer}

    @classmethod
    def from_config(cls, config: Config) -> SentencePieceBPETokenizer:
        return SentencePieceBPETokenizer(config.DATA.TOKENIZER_MODEL)


class ImageTransformsFactory(Factory):
    r"""Transform names (kwargs overridable via ``"name::{'key': val}"``,
    literal-eval'd); products mirror ``factories.py:111-173``."""

    PRODUCTS = {
        "random_resized_crop": partial(T.RandomResizedSquareCrop,
                                       scale=(0.2, 1.0), p=1.0),
        "center_crop": partial(T.CenterSquareCrop, p=1.0),
        "smallest_resize": partial(T.SmallestMaxSizeResize, p=1.0),
        "global_resize": partial(T.SquareResize, p=1.0),
        "color_jitter": partial(T.ColorJitter, brightness=0.4, contrast=0.4,
                                saturation=0.4, hue=0.1, p=0.8),
        "horizontal_flip": partial(T.HorizontalFlip, p=0.5),
        "normalize": partial(T.Normalize, mean=T.IMAGENET_COLOR_MEAN,
                             std=T.IMAGENET_COLOR_STD, p=1.0),
    }

    @classmethod
    def create(cls, name: str, *args, **kwargs) -> Any:
        if "::" in name:
            name, extra = name.split("::", 1)
            kwargs.update(ast.literal_eval(extra))
        return super().create(name, *args, **kwargs)


def _compose_transforms(names: Iterable[str], crop_size: int,
                        drop_normalize: bool = False) -> T.Compose:
    """Compose named transforms; resize/crop transforms get the crop size
    (reference ``factories.py:216-228``). ``drop_normalize`` skips the
    normalize stage when DATA.DEVICE_NORMALIZE moves it onto the device."""
    out = []
    for name in names:
        base = name.split("::")[0]
        if drop_normalize and base == "normalize":
            continue
        if base in {"random_resized_crop", "center_crop", "global_resize",
                    "smallest_resize"}:
            out.append(ImageTransformsFactory.create(name, crop_size))
        else:
            out.append(ImageTransformsFactory.create(name))
    return T.Compose(out)


class PretrainingDatasetFactory(Factory):
    PRODUCTS = {
        "virtex": CaptioningDataset,
        "bicaptioning": CaptioningDataset,
        "captioning": CaptioningDataset,
        "masked_lm": MaskedLmDataset,
        "token_classification": TokenClassificationDataset,
        "multilabel_classification": MultiLabelClassificationDataset,
    }

    @classmethod
    def from_config(cls, config: Config, split: str = "train"):
        _C = config
        name = _C.MODEL.NAME
        transform_names = (_C.DATA.IMAGE_TRANSFORM_TRAIN if split == "train"
                           else _C.DATA.IMAGE_TRANSFORM_VAL)
        image_transform = _compose_transforms(
            transform_names, _C.DATA.IMAGE_CROP_SIZE,
            drop_normalize=_C.DATA.DEVICE_NORMALIZE)

        kwargs = {"data_root": _C.DATA.ROOT, "split": split,
                  "image_transform": image_transform}
        if name != "multilabel_classification":
            # caption-consuming datasets share the native C++ fast path and
            # take the tokenizer (reference factories.py:231-243)
            kwargs.update(
                use_native=("auto" if _C.DATA.USE_NATIVE_LOADER else None),
                crop_size=_C.DATA.IMAGE_CROP_SIZE,
                emit_uint8=_C.DATA.DEVICE_NORMALIZE,
                tokenizer=TokenizerFactory.from_config(_C),
                max_caption_length=_C.DATA.MAX_CAPTION_LENGTH)
        if name == "masked_lm":
            kwargs.update(
                mask_proportion=_C.DATA.MASKED_LM.MASK_PROPORTION,
                mask_probability=_C.DATA.MASKED_LM.MASK_PROBABILITY,
                replace_probability=_C.DATA.MASKED_LM.REPLACE_PROBABILITY)
        return cls.create(name, **kwargs)


class DownstreamDatasetFactory(Factory):
    """Keyed by dataset directory name in ``DATA.ROOT``
    (reference ``factories.py:257-261``)."""

    PRODUCTS = {
        "datasets/VOC2007": VOC07ClassificationDataset,
        "datasets/imagenet": ImageNetDataset,
        "datasets/inaturalist": INaturalist2018Dataset,
    }

    @classmethod
    def from_config(cls, config: Config, split: str = "train"):
        _C = config
        root = _C.DATA.ROOT
        key = None
        for product in cls.PRODUCTS:
            if root.rstrip("/").endswith(product.split("/")[-1]):
                key = product
                break
        if key is None:
            raise KeyError(f"No downstream dataset for root {root!r}")
        names = (_C.DATA.IMAGE_TRANSFORM_TRAIN if "train" in split
                 else _C.DATA.IMAGE_TRANSFORM_VAL)
        transform = _compose_transforms(
            names, _C.DATA.IMAGE_CROP_SIZE,
            drop_normalize=_C.DATA.DEVICE_NORMALIZE)
        return cls.PRODUCTS[key](data_root=root, split=split,
                                 image_transform=transform)


class VisualBackboneFactory(Factory):
    r"""``torchvision::<name>`` grammar kept for config parity
    (``factories.py:330-341``); all products are our flax ResNets."""

    PRODUCTS = {"torchvision": ResNetVisualBackbone}

    @classmethod
    def create(cls, name: str, *args, **kwargs) -> ResNetVisualBackbone:
        if "::" in name:
            zoo, arch = name.split("::", 1)
        else:
            zoo, arch = "torchvision", name
        if zoo not in cls.PRODUCTS:
            raise KeyError(f"Unknown visual backbone family {zoo!r}")
        return cls.PRODUCTS[zoo](arch, *args, **kwargs)

    @classmethod
    def from_config(cls, config: Config) -> ResNetVisualBackbone:
        _C = config
        dtype = jnp.bfloat16 if _C.DTYPE == "bfloat16" else jnp.float32
        return cls.create(_C.MODEL.VISUAL.NAME,
                          frozen=_C.MODEL.VISUAL.FROZEN, dtype=dtype,
                          bn_stat_stride=_C.MODEL.VISUAL.BN_STAT_STRIDE,
                          stem_s2d=_C.MODEL.VISUAL.STEM_S2D,
                          remat=_C.MODEL.VISUAL.REMAT)


class TextualHeadFactory(Factory):
    r"""``transdec_{post,pre}norm::L{l}_H{h}_A{a}_F{f}`` regex grammar
    (``factories.py:384-392``); ``"none"`` → :class:`LinearTextualHead`."""

    NAME_RE = re.compile(
        r"transdec_(?P<norm>post|pre)norm::"
        r"L(?P<L>\d+)_H(?P<H>\d+)_A(?P<A>\d+)_F(?P<F>\d+)")

    @classmethod
    def from_config(cls, config: Config):
        _C = config
        name = _C.MODEL.TEXTUAL.NAME
        vocab_size = _C.DATA.VOCAB_SIZE
        feature_size = _C.MODEL.VISUAL.FEATURE_SIZE
        dtype = jnp.bfloat16 if _C.DTYPE == "bfloat16" else jnp.float32

        if name == "none":
            return LinearTextualHead(visual_feature_size=feature_size,
                                     vocab_size=vocab_size)
        m = cls.NAME_RE.fullmatch(name)
        if not m:
            raise ValueError(f"Cannot parse textual head name {name!r}")
        # Future positions masked only for autoregressive captioning tasks
        # (factories.py:395).
        mask_future = _C.MODEL.NAME in {"virtex", "captioning",
                                        "bicaptioning"}
        bidirectional = _C.MODEL.NAME in {"virtex", "bicaptioning"}
        return TransformerTextualHead(
            visual_feature_size=feature_size,
            vocab_size=vocab_size,
            hidden_size=int(m.group("H")),
            num_layers=int(m.group("L")),
            attention_heads=int(m.group("A")),
            feedforward_size=int(m.group("F")),
            dropout=_C.MODEL.TEXTUAL.DROPOUT,
            norm_type=m.group("norm"),
            mask_future_positions=mask_future,
            max_caption_length=_C.DATA.MAX_CAPTION_LENGTH,
            padding_idx=_C.DATA.UNK_INDEX,
            bidirectional=bidirectional,
            dtype=dtype,
            remat=_C.MODEL.TEXTUAL.REMAT,
        )


class PretrainingModelFactory(Factory):
    PRODUCTS = {
        "virtex": BidirectionalCaptioningModel,
        "bicaptioning": BidirectionalCaptioningModel,
        "captioning": ForwardCaptioningModel,
        "masked_lm": MaskedLMModel,
        "token_classification": TokenClassificationModel,
        "multilabel_classification": MultiLabelClassificationModel,
    }

    @classmethod
    def from_config(cls, config: Config):
        _C = config
        visual = VisualBackboneFactory.from_config(_C)
        textual = TextualHeadFactory.from_config(_C)
        name = _C.MODEL.NAME

        if name in {"virtex", "bicaptioning"}:
            return cls.PRODUCTS[name](
                visual=visual, textual=textual, caption_backward=True,
                sos_index=_C.DATA.SOS_INDEX, eos_index=_C.DATA.EOS_INDEX,
                padding_idx=_C.DATA.UNK_INDEX)
        if name == "captioning":
            return cls.PRODUCTS[name](
                visual=visual, textual=textual, caption_backward=False,
                sos_index=_C.DATA.SOS_INDEX, eos_index=_C.DATA.EOS_INDEX,
                padding_idx=_C.DATA.UNK_INDEX)
        if name == "masked_lm":
            return cls.PRODUCTS[name](visual=visual, textual=textual,
                                      padding_idx=_C.DATA.UNK_INDEX)
        if name == "token_classification":
            # ignore special token indices (factories.py:452-460)
            return cls.PRODUCTS[name](
                visual=visual, textual=textual,
                ignore_indices=(_C.DATA.UNK_INDEX, _C.DATA.SOS_INDEX,
                                _C.DATA.EOS_INDEX, _C.DATA.MASK_INDEX))
        if name == "multilabel_classification":
            return cls.PRODUCTS[name](visual=visual, textual=textual,
                                      ignore_indices=(0,))
        raise KeyError(f"Unknown model {name!r}")


class CaptionDecoderFactory(Factory):
    PRODUCTS = {
        "beam_search": AutoRegressiveBeamSearch,
        "nucleus_sampling": AutoRegressiveNucleusSampling,
    }

    @classmethod
    def from_config(cls, config: Config):
        _C = config
        name = _C.MODEL.DECODER.NAME
        kwargs = {"eos_index": _C.DATA.EOS_INDEX,
                  "max_steps": _C.MODEL.DECODER.MAX_DECODING_STEPS}
        if name == "beam_search":
            kwargs["beam_size"] = _C.MODEL.DECODER.BEAM_SIZE
        elif name == "nucleus_sampling":
            kwargs["nucleus_size"] = _C.MODEL.DECODER.NUCLEUS_SIZE
        return cls.create(name, **kwargs)


class OptimizerFactory(Factory):
    r"""Whole optimizer chain (clip → sgd/adamw+decay-mask → dual-LR ×
    schedule → lookahead) — reference param groups + Lookahead + LambdaLR
    collapsed into one optax transform (``factories.py:503-584``)."""

    PRODUCTS = {"sgd": "sgd", "adamw": "adamw"}

    @classmethod
    def from_config(cls, config: Config, params_template: Any):
        _C = config
        schedule = LRSchedulerFactory.from_config(_C)
        return build_optimizer(
            params_template,
            optimizer_name=_C.OPTIM.OPTIMIZER_NAME,
            schedule=schedule,
            lr=_C.OPTIM.LR,
            cnn_lr=_C.OPTIM.CNN_LR,
            weight_decay=_C.OPTIM.WEIGHT_DECAY,
            no_decay_pattern=_C.OPTIM.NO_DECAY,
            momentum=_C.OPTIM.SGD_MOMENTUM,
            clip_norm=_C.OPTIM.CLIP_GRAD_NORM,
            use_lookahead=_C.OPTIM.LOOKAHEAD.USE,
            lookahead_k=_C.OPTIM.LOOKAHEAD.STEPS,
            lookahead_alpha=_C.OPTIM.LOOKAHEAD.ALPHA,
            # reference requires_grad=False semantics: a frozen backbone's
            # params receive NO updates (weight decay included)
            frozen_pattern="cnn" if _C.MODEL.VISUAL.FROZEN else None,
        )


class LRSchedulerFactory(Factory):
    PRODUCTS = {"none": "none", "multistep": "multistep",
                "linear": "linear", "cosine": "cosine"}

    @classmethod
    def from_config(cls, config: Config):
        _C = config
        name = _C.OPTIM.LR_DECAY_NAME
        if name not in cls.PRODUCTS:
            raise KeyError(f"Unknown LR schedule {name!r}")
        return make_schedule(
            name, total_steps=_C.OPTIM.NUM_ITERATIONS,
            warmup_steps=_C.OPTIM.WARMUP_STEPS,
            milestones=list(_C.OPTIM.LR_STEPS), gamma=_C.OPTIM.LR_GAMMA)
