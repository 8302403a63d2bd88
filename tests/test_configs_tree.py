"""Every shipped YAML config must load, resolve _BASE_ inheritance, and
build its model/optimizer/dataset-factory products (no yaml typos, no
grammar drift)."""
import glob
import os

import pytest

from virtex_tpu.config import Config
from virtex_tpu.factories import (
    CaptionDecoderFactory,
    LRSchedulerFactory,
    PretrainingModelFactory,
    TextualHeadFactory,
    VisualBackboneFactory,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRETRAIN_CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "configs", "*.yaml"))
    + glob.glob(os.path.join(REPO, "configs", "*_ablations", "*.yaml")))
DOWNSTREAM_CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "configs", "downstream", "*.yaml")))


@pytest.mark.parametrize("path", PRETRAIN_CONFIGS,
                         ids=[os.path.relpath(p, REPO) for p in PRETRAIN_CONFIGS])
def test_pretrain_config_builds(path):
    cfg = Config(path)
    model = PretrainingModelFactory.from_config(cfg)
    assert model is not None
    VisualBackboneFactory.from_config(cfg)
    TextualHeadFactory.from_config(cfg)
    CaptionDecoderFactory.from_config(cfg)
    LRSchedulerFactory.from_config(cfg)
    # batch/iteration schedule matches the reference protocol
    assert cfg.OPTIM.BATCH_SIZE == 256
    assert cfg.OPTIM.NUM_ITERATIONS == 500000


@pytest.mark.parametrize("path", DOWNSTREAM_CONFIGS,
                         ids=[os.path.basename(p) for p in DOWNSTREAM_CONFIGS])
def test_downstream_config_loads(path):
    cfg = Config(path)
    LRSchedulerFactory.from_config(cfg)
    assert cfg.DATA.ROOT


REFERENCE_CONFIGS = sorted(
    glob.glob("/root/reference/configs/*.yaml")
    + glob.glob("/root/reference/configs/*_ablations/*.yaml"))


@pytest.mark.skipif(not REFERENCE_CONFIGS,
                    reason="reference repo not mounted")
@pytest.mark.parametrize("path", REFERENCE_CONFIGS,
                         ids=[os.path.basename(p) for p in REFERENCE_CONFIGS])
def test_reference_config_files_load_unchanged(path):
    """Drop-in config compatibility: the reference's own pretraining YAMLs
    (schema incl. AMP/CUDNN keys, _BASE_ inheritance) build our models."""
    cfg = Config(path)
    model = PretrainingModelFactory.from_config(cfg)
    assert model is not None
    TextualHeadFactory.from_config(cfg)


def test_width_ablation_grammar_values():
    cfg = Config(os.path.join(
        REPO, "configs", "width_ablations", "bicaptioning_R_50_L1_H2048.yaml"))
    head = TextualHeadFactory.from_config(cfg)
    assert (head.hidden_size, head.attention_heads,
            head.feedforward_size) == (2048, 32, 8192)
    assert head.bidirectional


def test_backbone_ablation_wide():
    cfg = Config(os.path.join(
        REPO, "configs", "backbone_ablations",
        "bicaptioning_R_50W2X_L1_H1024.yaml"))
    vb = VisualBackboneFactory.from_config(cfg)
    assert vb.name_or_arch == "wide_resnet50_2"
    assert vb.visual_feature_size == 2048
