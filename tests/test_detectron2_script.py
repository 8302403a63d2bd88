"""eval_detectron2 script helpers, runnable WITHOUT detectron2 installed:
depth inference from both visual-name grammars, weight-init assembly for
random / torchvision / virtex modes, and the D2 rename contract."""
import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from eval_detectron2 import gather_backbone_weights, infer_resnet_depth

from virtex_tpu.config import Config


def tiny_config(tmp_path=None, arch="resnet18"):
    return Config(override_list=[
        "MODEL.VISUAL.NAME", f"torchvision::{arch}",
        "MODEL.VISUAL.FEATURE_SIZE", 512,
    ])


def test_depth_inference_grammars():
    assert infer_resnet_depth("torchvision::resnet50") == 50
    assert infer_resnet_depth("torchvision::resnet101") == 101
    assert infer_resnet_depth("resnet50") == 50  # bare name, factory-valid
    assert infer_resnet_depth("detectron2::FPN_R_101_asdf") == 101
    assert infer_resnet_depth("something_else") == 0


def test_virtex_mode_without_checkpoint_exports_random_init():
    # --weight-init virtex with no --checkpoint-path must fall back to a
    # random-init export (same guard as apply_backbone_weight_init), not
    # crash on load_model_variables(None).
    d2 = gather_backbone_weights(tiny_config(), "virtex",
                                 checkpoint_path=None)
    assert d2["matching_heuristics"] is True
    assert d2["model"]["stem.conv1.weight"].shape == (64, 3, 7, 7)


def test_random_init_export_shapes():
    d2 = gather_backbone_weights(tiny_config(), "random")
    assert d2["matching_heuristics"] is True
    m = d2["model"]
    assert m["stem.conv1.weight"].shape == (64, 3, 7, 7)  # torch OIHW
    assert "res2.0.conv1.norm.running_mean" in m
    assert "res5.1.conv2.weight" in m  # resnet18 layer4_1


def test_torchvision_init_roundtrip(tmp_path):
    # a torchvision-training-script style checkpoint: {"state_dict": ...}
    from torchvision_stub import make_torch_resnet18_sd
    sd = make_torch_resnet18_sd()
    path = str(tmp_path / "tv.pth")
    torch.save({"state_dict": {k: torch.tensor(v) for k, v in sd.items()}},
               path)
    d2 = gather_backbone_weights(tiny_config(), "torchvision",
                                 checkpoint_path=path)
    m = d2["model"]
    # conv weights flow through flax (HWIO) and back to torch OIHW unchanged
    np.testing.assert_allclose(m["stem.conv1.weight"], sd["conv1.weight"],
                               rtol=1e-6)
    np.testing.assert_allclose(m["res2.0.conv1.weight"],
                               sd["layer1.0.conv1.weight"], rtol=1e-6)
    np.testing.assert_allclose(m["res2.0.conv1.norm.running_var"],
                               sd["layer1.0.bn1.running_var"], rtol=1e-6)


def test_unknown_mode_rejected():
    with pytest.raises(ValueError):
        gather_backbone_weights(tiny_config(), "bogus")
