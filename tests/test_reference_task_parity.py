"""Composed-model loss parity for the NON-captioning pretext tasks against
the ACTUAL imported reference models (captioning is covered by
test_reference_parity.py and test_train_trajectory_parity.py).

Reference side: ``virtex.models.masked_lm.MaskedLMModel`` and
``virtex.models.classification.{TokenClassification,MultiLabelClassification}
Model`` (``/root/reference/virtex/models/masked_lm.py:11-106``,
``classification.py:12-174``) composed with the reference's own
``TorchvisionVisualBackbone`` + ``TransformerDecoderTextualHead`` /
``LinearTextualHead`` — only ``torchvision.models.resnet18`` is injected
(see reference_stubs.py). Our side loads the converted state dict and must
reproduce the training loss.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_stubs import install_reference_stubs

install_reference_stubs()

try:
    from virtex.models.classification import (
        MultiLabelClassificationModel as RefMultiLabel,
        TokenClassificationModel as RefTokenCls,
    )
    from virtex.models.masked_lm import MaskedLMModel as RefMaskedLM
    from virtex.modules.textual_heads import (
        LinearTextualHead as RefLinearHead,
        TransformerDecoderTextualHead,
    )
    from virtex.modules.visual_backbones import TorchvisionVisualBackbone
    HAVE_REFERENCE = True
except Exception:  # reference tree not mounted
    HAVE_REFERENCE = False

from virtex_tpu.models.classification import (
    MultiLabelClassificationModel,
    TokenClassificationModel,
)
from virtex_tpu.models.masked_lm import MaskedLMModel
from virtex_tpu.modules.textual_heads import (
    LinearTextualHead,
    TransformerTextualHead,
)
from virtex_tpu.modules.visual_backbones import ResNetVisualBackbone
from virtex_tpu.utils.checkpoint_convert import (
    convert_virtex_checkpoint,
    export_virtex_checkpoint,
)

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE,
                                reason="reference repo not available")

VOCAB, H, HEADS, FF, L, MAXLEN = 40, 32, 4, 64, 1, 10
B, T, IMG = 4, 8, 64


def _image_batch(seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(B, 3, IMG, IMG).astype(np.float32) - 0.5) / 0.25


def _ref_visual():
    return TorchvisionVisualBackbone("resnet18", visual_feature_size=512)


def test_masked_lm_composed_loss_parity():
    torch.manual_seed(5)
    textual = TransformerDecoderTextualHead(
        visual_feature_size=512, vocab_size=VOCAB, hidden_size=H,
        num_layers=L, attention_heads=HEADS, feedforward_size=FF,
        dropout=0.0, norm_first=False, mask_future_positions=False,
        max_caption_length=MAXLEN, padding_idx=0)
    ref = RefMaskedLM(_ref_visual(), textual)
    ref.train()

    rng = np.random.RandomState(1)
    images = _image_batch(1)
    tokens = rng.randint(4, VOCAB, (B, T)).astype(np.int64)
    tokens[:, 0] = 1
    lengths = np.full((B,), T, np.int64)
    tokens[0, 6:], lengths[0] = 0, 6
    # masked positions: labels are the original token, pad elsewhere
    # (reference masked_lm.py:68-72 via the dataset; here hand-built)
    masked_labels = np.zeros_like(tokens)
    masked_labels[0, 2], masked_labels[1, 3] = tokens[0, 2], tokens[1, 3]
    masked_labels[2, 1], masked_labels[3, 5] = tokens[2, 1], tokens[3, 5]
    tokens[0, 2] = tokens[1, 3] = tokens[2, 1] = tokens[3, 5] = 3  # [MASK]

    with torch.no_grad():
        out = ref({"image": torch.tensor(images),
                   "caption_tokens": torch.tensor(tokens),
                   "masked_labels": torch.tensor(masked_labels),
                   "caption_lengths": torch.tensor(lengths)})

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_virtex_checkpoint(sd, num_layers=L, prenorm=False)
    model = MaskedLMModel(
        visual=ResNetVisualBackbone("resnet18", dtype=jnp.float32),
        textual=TransformerTextualHead(
            visual_feature_size=512, vocab_size=VOCAB, hidden_size=H,
            num_layers=L, attention_heads=HEADS, feedforward_size=FF,
            dropout=0.0, norm_type="post", mask_future_positions=False,
            max_caption_length=MAXLEN, padding_idx=0,
            dtype=jnp.float32))
    ours = model.apply(
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]},
        {"image": jnp.asarray(images.transpose(0, 2, 3, 1)),
         "caption_tokens": jnp.asarray(tokens, jnp.int32),
         "masked_labels": jnp.asarray(masked_labels, jnp.int32),
         "caption_lengths": jnp.asarray(lengths, jnp.int32)},
        train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)})[0]

    np.testing.assert_allclose(float(ours["loss"]), float(out["loss"]),
                               rtol=1e-4)


@pytest.mark.parametrize("task", ["token", "multilabel"])
def test_classification_composed_loss_parity(task):
    torch.manual_seed(7)
    n_classes = VOCAB if task == "token" else 81
    ignore = [0, 1, 2, 3] if task == "token" else [0]
    ref_cls = RefTokenCls if task == "token" else RefMultiLabel
    ref = ref_cls(_ref_visual(),
                  RefLinearHead(visual_feature_size=512,
                                vocab_size=n_classes),
                  ignore_indices=ignore)
    ref.train()

    rng = np.random.RandomState(2)
    images = _image_batch(2)
    # padded label sets with duplicates (the reference uniques per row,
    # classification.py:86-90) and pad/special entries filtered by
    # ignore_indices; every row keeps >=1 valid label
    labels = rng.randint(max(ignore) + 1, n_classes, (B, 5)).astype(np.int64)
    labels[0, 3:] = 0
    labels[1, 2] = labels[1, 1]  # duplicate
    labels[2, 4] = ignore[-1]

    with torch.no_grad():
        out = ref({"image": torch.tensor(images),
                   "labels": torch.tensor(labels)})

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_virtex_checkpoint(sd)
    model_cls = (TokenClassificationModel if task == "token"
                 else MultiLabelClassificationModel)
    model = model_cls(
        visual=ResNetVisualBackbone("resnet18", dtype=jnp.float32),
        textual=LinearTextualHead(visual_feature_size=512,
                                  vocab_size=n_classes),
        ignore_indices=tuple(ignore))
    ours = model.apply(
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]},
        {"image": jnp.asarray(images.transpose(0, 2, 3, 1)),
         "labels": jnp.asarray(labels, jnp.int32)},
        train=True, mutable=["batch_stats"])[0]

    np.testing.assert_allclose(float(ours["loss"]), float(out["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(
        float(ours["loss_components"]["classification"]),
        float(out["loss_components"]["classification"]), rtol=1e-4)


def test_linear_head_checkpoint_roundtrip():
    """convert → export must reproduce the reference linear-head state dict
    (the classification-model interchange path)."""
    torch.manual_seed(9)
    ref = RefTokenCls(_ref_visual(),
                      RefLinearHead(visual_feature_size=512,
                                    vocab_size=VOCAB),
                      ignore_indices=[0, 1, 2, 3])
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_virtex_checkpoint(sd)
    back = export_virtex_checkpoint(converted)
    want = {k for k in sd if "num_batches_tracked" not in k}
    got = {k for k in back if "num_batches_tracked" not in k}
    assert got == want
    for k in want:
        np.testing.assert_allclose(back[k], sd[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)
