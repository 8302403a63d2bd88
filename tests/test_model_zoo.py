"""Model zoo + hub API tests: config resolution, model construction,
pretrained loading from a local orbax checkpoint and from a converted torch
state dict."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from virtex_tpu import model_zoo
from virtex_tpu.model_zoo.model_zoo import _MODEL_ZOO_CONFIGS, _configs_root


def test_zoo_covers_reference_families():
    families = {p.split("/")[0] for p in _MODEL_ZOO_CONFIGS}
    assert families == {"task_ablations", "width_ablations",
                        "depth_ablations", "backbone_ablations"}
    assert len(_MODEL_ZOO_CONFIGS) == 16  # reference model_zoo.py:35-60
    # every zoo config file actually exists
    for rel in _MODEL_ZOO_CONFIGS:
        assert os.path.exists(os.path.join(_configs_root(), rel)), rel


def test_zoo_get_builds_model():
    model, variables, cfg = model_zoo.get(
        "width_ablations/bicaptioning_R_50_L1_H512.yaml", pretrained=False,
        overrides=["DATA.IMAGE_CROP_SIZE", 64, "DATA.MAX_CAPTION_LENGTH", 8,
                   "MODEL.VISUAL.NAME", "torchvision::resnet18",
                   "MODEL.VISUAL.FEATURE_SIZE", 512])
    assert cfg.MODEL.TEXTUAL.NAME == "transdec_postnorm::L1_H512_A8_F2048"
    assert model.caption_backward
    assert "textual" in variables["params"]
    assert "backward_transformer" in variables["params"]["textual"]


def test_zoo_pretrained_requires_dir(monkeypatch):
    monkeypatch.delenv("VIRTEX_TPU_ZOO_DIR", raising=False)
    with pytest.raises(RuntimeError, match="VIRTEX_TPU_ZOO_DIR"):
        model_zoo.get("width_ablations/bicaptioning_R_50_L1_H512.yaml",
                      pretrained=True,
                      overrides=["DATA.IMAGE_CROP_SIZE", 64,
                                 "MODEL.VISUAL.NAME", "torchvision::resnet18",
                                 "MODEL.VISUAL.FEATURE_SIZE", 512])


def test_zoo_loads_torch_pth(tmp_path):
    """A reference-style torch .pth checkpoint loads through the converter
    (tiny synthetic model)."""
    import torch

    import sys
    if "/root/reference" not in sys.path:  # END: no top-level shadowing
        sys.path.append("/root/reference")
    try:
        from virtex.modules.textual_heads import TransformerDecoderTextualHead
    except Exception:
        pytest.skip("reference not available")

    head = TransformerDecoderTextualHead(
        visual_feature_size=512, vocab_size=100, hidden_size=32,
        num_layers=1, attention_heads=4, feedforward_size=64, dropout=0.0,
        max_caption_length=8, padding_idx=0)
    sd = {f"textual.{k}": v for k, v in head.state_dict().items()}
    torch.save({"model": sd}, tmp_path / "ckpt.pth")

    model, variables, cfg = model_zoo.get(
        "width_ablations/bicaptioning_R_50_L1_H512.yaml", pretrained=True,
        checkpoint_path=str(tmp_path / "ckpt.pth"),
        overrides=["DATA.IMAGE_CROP_SIZE", 64, "DATA.MAX_CAPTION_LENGTH", 8,
                   "DATA.VOCAB_SIZE", 100,
                   "MODEL.VISUAL.NAME", "torchvision::resnet18",
                   "MODEL.VISUAL.FEATURE_SIZE", 512,
                   "MODEL.TEXTUAL.NAME", "transdec_postnorm::L1_H32_A4_F64"])
    got = variables["params"]["textual"]["visual_projection"]["kernel"]
    want = head.visual_projection.weight.detach().numpy().T
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_fetch_file_url_cache_and_checksum(tmp_path):
    """URL fetch path (reference's Dropbox download, model_zoo.py:96-103):
    file:// exercises download+cache+checksum offline; https shares the
    same code path."""
    import hashlib

    from virtex_tpu.model_zoo.model_zoo import fetch

    src = tmp_path / "weights.pth"
    src.write_bytes(b"fake-checkpoint-bytes")
    sha = hashlib.sha256(src.read_bytes()).hexdigest()
    cache = tmp_path / "cache"
    url = f"file://{src}"

    got = fetch(url, sha256=sha, cache_dir=str(cache))
    assert os.path.exists(got)
    assert open(got, "rb").read() == b"fake-checkpoint-bytes"

    # cache hit: same path, no re-download even if the source disappears
    src.unlink()
    assert fetch(url, sha256=sha, cache_dir=str(cache)) == got

    # checksum mismatch removes the cached file and raises
    with pytest.raises(RuntimeError, match="checksum mismatch"):
        fetch(url, sha256="0" * 64, cache_dir=str(cache))
    assert not os.path.exists(got)


def test_fetch_sha256_fragment(tmp_path):
    import hashlib

    from virtex_tpu.model_zoo.model_zoo import fetch

    src = tmp_path / "w.pth"
    src.write_bytes(b"abc123")
    sha = hashlib.sha256(b"abc123").hexdigest()
    got = fetch(f"file://{src}#sha256={sha}", cache_dir=str(tmp_path / "c"))
    assert open(got, "rb").read() == b"abc123"
    with pytest.raises(RuntimeError, match="checksum"):
        fetch(f"file://{src}#sha256={'f' * 64}",
              cache_dir=str(tmp_path / "c2"))


def test_zoo_dir_url_resolution(tmp_path, monkeypatch):
    """$VIRTEX_TPU_ZOO_DIR may be an URL base: '<base>/<name>.pth' is
    fetched through the cache."""
    from virtex_tpu.model_zoo.model_zoo import _zoo_checkpoint_path

    (tmp_path / "bicaptioning_R_50_L1_H512.pth").write_bytes(b"zoo")
    monkeypatch.setenv("VIRTEX_TPU_ZOO_DIR", f"file://{tmp_path}")
    monkeypatch.setenv("VIRTEX_TPU_CACHE_DIR", str(tmp_path / "cache"))
    p = _zoo_checkpoint_path(os.path.join(
        _configs_root(), "width_ablations/bicaptioning_R_50_L1_H512.yaml"))
    assert open(p, "rb").read() == b"zoo"
