"""Checkpoint-converter parity tests.

The strongest available parity check without torchvision: build REAL torch
modules (nn.TransformerDecoder with packed in_proj, torch Conv2d+BatchNorm in
torchvision's naming convention), convert their state dicts with
checkpoint_convert, and require the flax modules to reproduce torch's
outputs on the same inputs (SURVEY §7.2 — the converter is the north-star
verification artifact)."""
import os
import sys

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from tests.utils_fixtures import dummy_stem_sd

from virtex_tpu.modules.transformer import TransformerDecoder
from virtex_tpu.utils.checkpoint_convert import (
    convert_resnet,
    convert_transformer_stack,
)

H, HEADS, FF, L = 32, 4, 64, 2
B, T, V = 2, 5, 7  # V = visual tokens


@pytest.mark.parametrize("prenorm", [False, True])
def test_transformer_decoder_matches_torch(prenorm):
    torch.manual_seed(0)
    layer = tnn.TransformerDecoderLayer(
        d_model=H, nhead=HEADS, dim_feedforward=FF, dropout=0.0,
        activation="gelu", batch_first=True, norm_first=prenorm)
    torch_dec = tnn.TransformerDecoder(
        layer, num_layers=L,
        norm=tnn.LayerNorm(H) if prenorm else None)
    torch_dec.eval()

    tgt = torch.randn(B, T, H)
    memory = torch.randn(B, V, H)
    causal = torch.triu(torch.full((T, T), float("-inf")), diagonal=1)
    with torch.no_grad():
        ref = torch_dec(tgt, memory, tgt_mask=causal).numpy()

    sd = {k: v.numpy() for k, v in torch_dec.state_dict().items()}
    # our converter expects the reference's "<prefix>.layers.N" naming
    params = convert_transformer_stack(
        {f"x.{k}": v for k, v in sd.items()}, "x", L, prenorm)

    flax_dec = TransformerDecoder(
        num_layers=L, hidden_size=H, num_heads=HEADS, feedforward_size=FF,
        dropout=0.0, norm_type="pre" if prenorm else "post",
        dtype=jnp.float32)
    mask = jnp.broadcast_to(jnp.tril(jnp.ones((T, T), bool))[None, None],
                            (B, 1, T, T))
    out = flax_dec.apply({"params": params},
                         jnp.asarray(tgt.numpy()),
                         jnp.asarray(memory.numpy()),
                         mask, True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_conv_bn_matches_torch():
    """torch Conv2d(OIHW, NCHW) + BatchNorm running stats vs our flax
    NHWC path through the converter's kernel transpose."""
    torch.manual_seed(1)
    conv = tnn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    bn = tnn.BatchNorm2d(8)
    bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
    bn.weight.data.normal_(); bn.bias.data.normal_()
    conv.eval(); bn.eval()

    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        ref = bn(conv(x)).numpy().transpose(0, 2, 3, 1)  # → NHWC

    from flax import linen as nn
    class Mini(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        name="conv1")(x)
            return nn.BatchNorm(use_running_average=True, momentum=0.9,
                                epsilon=1e-5, name="bn1")(x)

    sd = {"conv1.weight": conv.weight.detach().numpy(),
          "bn1.weight": bn.weight.detach().numpy(),
          "bn1.bias": bn.bias.detach().numpy(),
          "bn1.running_mean": bn.running_mean.numpy(),
          "bn1.running_var": bn.running_var.numpy()}
    from virtex_tpu.utils.checkpoint_convert import _t_conv
    variables = {
        "params": {"conv1": {"kernel": _t_conv(sd["conv1.weight"])},
                   "bn1": {"scale": sd["bn1.weight"],
                           "bias": sd["bn1.bias"]}},
        "batch_stats": {"bn1": {"mean": sd["bn1.running_mean"],
                                "var": sd["bn1.running_var"]}},
    }
    out = Mini().apply(jax.tree.map(jnp.asarray, variables),
                       jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


class TorchBottleneck(tnn.Module):
    """torchvision-layout Bottleneck (same parameter names, stride on conv2
    = the 'v1.5' placement, downsample = [conv, bn]) for converter parity.
    Exercises the SURVEY §7 'hard parts': downsample ordering and BN
    running-stat conventions at full-block scale."""

    def __init__(self, cin, planes, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = tnn.Sequential(
            tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


def test_full_bottleneck_block_matches_torch():
    torch.manual_seed(3)
    block = TorchBottleneck(cin=16, planes=8, stride=2)
    # randomize BN stats/affine so eval mode is non-trivial
    for bn in [block.bn1, block.bn2, block.bn3, block.downsample[1]]:
        bn.running_mean.normal_(std=0.1)
        bn.running_var.uniform_(0.5, 1.5)
        bn.weight.data.normal_(1.0, 0.1)
        bn.bias.data.normal_(0.0, 0.1)
    block.eval()

    x = torch.randn(2, 16, 10, 10)
    with torch.no_grad():
        ref = block(x).numpy().transpose(0, 2, 3, 1)

    # TorchBottleneck already uses torchvision names; just add the prefix.
    sd = {f"layer1.0.{k}": v.numpy() for k, v in block.state_dict().items()}
    # converter needs the stem too
    sd.update(dummy_stem_sd(prefix=""))
    params, stats = convert_resnet(sd)

    from virtex_tpu.modules.resnet import Bottleneck
    from functools import partial
    import flax.linen as fnn
    flax_block = Bottleneck(
        planes=8, stride=2, downsample=True,
        conv=partial(fnn.Conv, dtype=jnp.float32),
        norm=partial(fnn.BatchNorm, use_running_average=True,
                     momentum=0.9, epsilon=1e-5, dtype=jnp.float32))
    out = flax_block.apply(
        {"params": params["layer1_0"],
         "batch_stats": stats["layer1_0"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_stem_conv_maxpool_matches_torch():
    """torchvision stem semantics: 7×7 s2 p3 conv then MaxPool2d(3, 2, 1)
    — window placement and −inf padding must match flax's max_pool."""
    torch.manual_seed(5)
    conv = tnn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
    pool = tnn.MaxPool2d(3, stride=2, padding=1)
    x = torch.randn(2, 3, 33, 33)  # odd size exercises edge windows
    with torch.no_grad():
        ref = pool(conv(x)).numpy().transpose(0, 2, 3, 1)

    from flax import linen as fnn
    import jax

    class Stem(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            x = fnn.Conv(8, (7, 7), strides=(2, 2),
                         padding=[(3, 3), (3, 3)], use_bias=False,
                         name="conv1")(x)
            return fnn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)])

    from virtex_tpu.utils.checkpoint_convert import _t_conv
    out = Stem().apply(
        {"params": {"conv1": {"kernel": jnp.asarray(
            _t_conv(conv.weight.detach().numpy()))}}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_resnet_converter_naming_roundtrip():
    """convert_resnet output keys must exactly match flax ResNet init
    structure (tested for resnet18-style block names on synthetic dicts)."""
    rng = np.random.RandomState(0)

    def conv(o, i, k):
        return rng.randn(o, i, k, k).astype(np.float32)

    sd = {"conv1.weight": conv(64, 3, 7)}
    for bn in ["bn1"]:
        sd[f"{bn}.weight"] = np.ones(64, np.float32)
        sd[f"{bn}.bias"] = np.zeros(64, np.float32)
        sd[f"{bn}.running_mean"] = np.zeros(64, np.float32)
        sd[f"{bn}.running_var"] = np.ones(64, np.float32)
    # one basic block layer1.0 with two convs
    for c, shapes in [("conv1", (64, 64, 3)), ("conv2", (64, 64, 3))]:
        sd[f"layer1.0.{c}.weight"] = conv(*shapes)
    for bn in ["layer1.0.bn1", "layer1.0.bn2"]:
        sd[f"{bn}.weight"] = np.ones(64, np.float32)
        sd[f"{bn}.bias"] = np.zeros(64, np.float32)
        sd[f"{bn}.running_mean"] = np.zeros(64, np.float32)
        sd[f"{bn}.running_var"] = np.ones(64, np.float32)

    params, stats = convert_resnet(sd)
    assert params["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert "layer1_0" in params and "conv2" in params["layer1_0"]
    assert stats["layer1_0"]["bn2"]["var"].shape == (64,)


def test_export_resnet_roundtrip():
    """export_resnet is the exact inverse of convert_resnet (torchvision
    naming, incl. downsample blocks)."""
    import jax
    import jax.numpy as jnp

    from virtex_tpu.modules.resnet import make_resnet
    from virtex_tpu.utils.checkpoint_convert import (
        convert_resnet,
        export_resnet,
    )

    model = make_resnet("resnet18", dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = export_resnet(params, stats)
    assert "layer1.0.conv1.weight" in sd
    assert "layer2.0.downsample.0.weight" in sd
    assert sd["bn1.num_batches_tracked"].dtype == np.int64

    p2, s2 = convert_resnet(sd)
    for tree, tree2 in ((params, p2), (stats, s2)):
        flat = jax.tree_util.tree_leaves_with_path(tree)
        flat2 = dict(jax.tree_util.tree_leaves_with_path(tree2))
        assert len(flat) == len(flat2)
        for path, leaf in flat:
            np.testing.assert_array_equal(leaf, flat2[path], err_msg=str(path))


@pytest.mark.parametrize("prenorm", [False, True])
def test_export_virtex_checkpoint_reverse_parity(prenorm):
    """Reverse interchange: OUR randomly-initialised textual head exported
    with export_virtex_checkpoint loads into the ACTUAL reference
    TransformerDecoderTextualHead (strict), which then reproduces our
    logits — models pretrained here flow back into reference tooling."""
    import sys

    if "/root/reference" not in sys.path:  # END: no top-level shadowing
        sys.path.append("/root/reference")
    try:
        from virtex.modules.textual_heads import TransformerDecoderTextualHead
    except Exception:
        pytest.skip("reference repo not available")

    import jax
    import jax.numpy as jnp

    from virtex_tpu.modules.textual_heads import TransformerTextualHead
    from virtex_tpu.utils.checkpoint_convert import export_virtex_checkpoint

    VIS, VOCAB, H, HEADS, FF, L, MAXLEN = 64, 50, 32, 4, 64, 2, 10
    norm_type = "pre" if prenorm else "post"
    ours = TransformerTextualHead(
        visual_feature_size=VIS, vocab_size=VOCAB, hidden_size=H,
        num_layers=L, attention_heads=HEADS, feedforward_size=FF,
        dropout=0.0, norm_type=norm_type, mask_future_positions=True,
        max_caption_length=MAXLEN, padding_idx=0, dtype=jnp.float32)

    B, T = 2, 6
    rng = np.random.RandomState(5)
    grid = rng.randn(B, 2, 2, VIS).astype(np.float32)
    tokens = rng.randint(4, VOCAB, (B, T))
    tokens[:, 0] = 1
    tokens[0, -1] = 0
    lengths = np.array([T - 1, T])

    variables = ours.init(jax.random.PRNGKey(3), jnp.asarray(grid),
                          jnp.asarray(tokens), jnp.asarray(lengths))
    our_logits = np.asarray(ours.apply(
        variables, jnp.asarray(grid), jnp.asarray(tokens),
        jnp.asarray(lengths), deterministic=True))

    sd = export_virtex_checkpoint(
        {"params": {"textual": variables["params"]},
         "batch_stats": {}})
    head_sd = {k[len("textual."):]: torch.tensor(v)
               for k, v in sd.items() if k.startswith("textual.")}

    ref = TransformerDecoderTextualHead(
        visual_feature_size=VIS, vocab_size=VOCAB, hidden_size=H,
        num_layers=L, attention_heads=HEADS, feedforward_size=FF,
        dropout=0.0, norm_first=prenorm, max_caption_length=MAXLEN,
        padding_idx=0)
    missing, unexpected = ref.load_state_dict(head_sd, strict=False)
    assert not unexpected, unexpected
    # only buffers torch does not checkpoint may be missing
    assert all("future_mask" in m or "position" in m for m in missing), missing
    ref.eval()
    with torch.no_grad():
        ref_logits = ref(torch.tensor(grid.transpose(0, 3, 1, 2)),
                         torch.tensor(tokens), torch.tensor(lengths)).numpy()
    np.testing.assert_allclose(ref_logits, our_logits, rtol=5e-4, atol=5e-4)


def test_export_bicaptioning_roundtrip():
    """Full-model round trip: export_virtex_checkpoint →
    convert_virtex_checkpoint reproduces the original trees, including the
    backward transformer and the reference's shared-module duplicate keys."""
    import jax
    import jax.numpy as jnp

    from virtex_tpu.modules.textual_heads import TransformerTextualHead
    from virtex_tpu.modules.visual_backbones import ResNetVisualBackbone
    from virtex_tpu.models.captioning import BidirectionalCaptioningModel
    from virtex_tpu.utils.checkpoint_convert import (
        convert_virtex_checkpoint,
        export_virtex_checkpoint,
    )

    model = BidirectionalCaptioningModel(
        visual=ResNetVisualBackbone("resnet18", dtype=jnp.float32),
        textual=TransformerTextualHead(
            visual_feature_size=512, vocab_size=40, hidden_size=32,
            num_layers=1, attention_heads=4, feedforward_size=64,
            dropout=0.0, norm_type="post", mask_future_positions=True,
            max_caption_length=8, padding_idx=0, bidirectional=True,
            dtype=jnp.float32))
    tokens = jnp.ones((2, 8), jnp.int32)
    batch = {"image": jnp.zeros((2, 64, 64, 3)), "caption_tokens": tokens,
             "noitpac_tokens": tokens, "caption_lengths": jnp.full((2,), 8)}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    variables = jax.tree.map(np.asarray, dict(variables))

    sd = export_virtex_checkpoint(variables)
    # shared modules appear under both prefixes, bit-identical
    np.testing.assert_array_equal(sd["textual.embedding.words.weight"],
                                  sd["backward_textual.embedding.words.weight"])
    assert "backward_textual.transformer.layers.0.self_attn.in_proj_weight" \
        in sd

    back = convert_virtex_checkpoint(sd, num_layers=1, prenorm=False)
    for coll in ("params", "batch_stats"):
        want = variables[coll]["visual"]["cnn"]
        got = back[coll]["visual"]["cnn"]
        flat = dict(jax.tree_util.tree_leaves_with_path(want))
        flat2 = dict(jax.tree_util.tree_leaves_with_path(got))
        assert flat.keys() == flat2.keys()
        for path in flat:
            np.testing.assert_array_equal(flat[path], flat2[path])
    flat = dict(jax.tree_util.tree_leaves_with_path(
        variables["params"]["textual"]))
    flat2 = dict(jax.tree_util.tree_leaves_with_path(
        back["params"]["textual"]))
    assert flat.keys() == flat2.keys()
    for path in flat:
        np.testing.assert_array_equal(flat[path], flat2[path],
                                      err_msg=str(path))


def test_export_cli_roundtrip(tmp_path):
    """scripts/export_torch_checkpoint.py: orbax checkpoint in → reference
    .pth out, reloadable by our own torch-import path (closing the loop)."""
    import argparse

    import jax
    import jax.numpy as jnp
    import optax

    from virtex_tpu.config import Config
    from virtex_tpu.engine import (
        CheckpointManager,
        TrainState,
        initialize_model,
    )
    from virtex_tpu.factories import PretrainingModelFactory
    from virtex_tpu.utils.checkpoint_convert import load_torch_checkpoint

    overrides = [
        "MODEL.NAME", "bicaptioning",
        "MODEL.VISUAL.NAME", "torchvision::resnet18",
        "MODEL.VISUAL.FEATURE_SIZE", 512,
        "MODEL.TEXTUAL.NAME", "transdec_postnorm::L1_H64_A4_F128",
        "DATA.MAX_CAPTION_LENGTH", 8,
        "DATA.IMAGE_CROP_SIZE", 64,
    ]
    _C = Config(override_list=overrides)
    model = PretrainingModelFactory.from_config(_C)
    tokens = np.ones((1, 8), np.int32)
    sample = {"image": np.zeros((1, 64, 64, 3), np.float32),
              "caption_tokens": tokens, "noitpac_tokens": tokens,
              "caption_lengths": np.full((1,), 8, np.int32)}
    variables = initialize_model(model, sample, jax.random.PRNGKey(0))
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              optax.sgd(0.1))
    mgr = CheckpointManager(str(tmp_path / "ser"), keep_recent=1)
    mgr.step(state, 7)
    mgr.wait_until_finished()

    out_pth = str(tmp_path / "export.pth")
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import export_torch_checkpoint as cli
    ns = argparse.Namespace(config=None, config_override=overrides,
                            checkpoint_path=mgr.latest(), output=out_pth,
                            iteration=7)
    cli.main(ns)

    sd = load_torch_checkpoint(out_pth)
    assert "visual.cnn.conv1.weight" in sd
    assert "backward_textual.transformer.layers.0.linear1.weight" in sd
    np.testing.assert_array_equal(
        sd["visual.cnn.conv1.weight"].shape, (64, 3, 7, 7))
    want = np.asarray(variables["params"]["visual"]["cnn"]["conv1"]["kernel"])
    np.testing.assert_allclose(sd["visual.cnn.conv1.weight"],
                               want.transpose(3, 2, 0, 1), rtol=1e-6)
