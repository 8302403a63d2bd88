r"""
Model zoo: build (and optionally load pretrained weights for) any config
shipped with the package.

Parity target: reference ``virtex/model_zoo/model_zoo.py:30-105`` —
``get("config/...yaml", pretrained=True)`` resolves a packaged config,
builds the model via factories and loads zoo weights. The reference
downloads torch pickles from Dropbox; in an air-gapped TPU environment the
zoo root is a local directory ($VIRTEX_TPU_ZOO_DIR) holding either native
orbax checkpoints or original torch ``.pth`` files (converted on the fly via
:mod:`virtex_tpu.utils.checkpoint_convert`).
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

from virtex_tpu.config import Config
from virtex_tpu.factories import PretrainingModelFactory

ZOO_DIR_ENV = "VIRTEX_TPU_ZOO_DIR"
CACHE_DIR_ENV = "VIRTEX_TPU_CACHE_DIR"
_URL_SCHEMES = ("https://", "http://", "file://")

# config path (relative to configs/) → zoo checkpoint basename.
# Mirrors the 16 zoo entries over 4 ablation families
# (reference model_zoo.py:35-60).
_MODEL_ZOO_CONFIGS: Dict[str, str] = {
    # Pretraining task ablations
    "task_ablations/bicaptioning_R_50_L1_H2048.yaml": "bicaptioning_R_50_L1_H2048",
    "task_ablations/captioning_R_50_L1_H2048.yaml": "captioning_R_50_L1_H2048",
    "task_ablations/token_classification_R_50.yaml": "token_classification_R_50",
    "task_ablations/multilabel_classification_R_50.yaml": "multilabel_classification_R_50",
    "task_ablations/masked_lm_R_50_L1_H2048.yaml": "masked_lm_R_50_L1_H2048",
    # Width ablations
    "width_ablations/bicaptioning_R_50_L1_H512.yaml": "bicaptioning_R_50_L1_H512",
    "width_ablations/bicaptioning_R_50_L1_H768.yaml": "bicaptioning_R_50_L1_H768",
    "width_ablations/bicaptioning_R_50_L1_H1024.yaml": "bicaptioning_R_50_L1_H1024",
    "width_ablations/bicaptioning_R_50_L1_H2048.yaml": "bicaptioning_R_50_L1_H2048",
    # Depth ablations
    "depth_ablations/bicaptioning_R_50_L1_H1024.yaml": "bicaptioning_R_50_L1_H1024",
    "depth_ablations/bicaptioning_R_50_L2_H1024.yaml": "bicaptioning_R_50_L2_H1024",
    "depth_ablations/bicaptioning_R_50_L3_H1024.yaml": "bicaptioning_R_50_L3_H1024",
    "depth_ablations/bicaptioning_R_50_L4_H1024.yaml": "bicaptioning_R_50_L4_H1024",
    # Backbone ablations
    "backbone_ablations/bicaptioning_R_50_L1_H1024.yaml": "bicaptioning_R_50_L1_H1024",
    "backbone_ablations/bicaptioning_R_50W2X_L1_H1024.yaml": "bicaptioning_R_50W2X_L1_H1024",
    "backbone_ablations/bicaptioning_R_101_L1_H1024.yaml": "bicaptioning_R_101_L1_H1024",
}


def _configs_root() -> str:
    """Configs dir, resolved like the reference's packaged configs
    (``setup.py:9-39`` symlinks them into the package): the in-package
    copy (``virtex_tpu/model_zoo/configs`` — a symlink in the dev
    checkout, a real directory in built wheels) wins unless
    $VIRTEX_TPU_CONFIGS_DIR overrides; repo-root ``configs/`` is the
    final fallback."""
    env = os.environ.get("VIRTEX_TPU_CONFIGS_DIR")
    if env:
        return env
    packaged = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "configs")
    if os.path.isdir(packaged):
        return packaged
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "configs")


def get(config_path: str, pretrained: bool = False,
        checkpoint_path: Optional[str] = None,
        overrides: Optional[list] = None) -> Tuple[Any, Dict[str, Any], Config]:
    r"""Build a model from a zoo config.

    Args:
        config_path: path relative to ``configs/`` (e.g.
            ``"width_ablations/bicaptioning_R_50_L1_H1024.yaml"``) or an
            absolute path.
        pretrained: load weights (from ``checkpoint_path`` or the zoo dir).
        checkpoint_path: explicit checkpoint (orbax dir or torch ``.pth``).

    Returns:
        ``(model, variables, config)`` — ``variables`` holds
        ``{"params", "batch_stats"}``, randomly initialised unless
        pretrained.
    """
    import jax
    import numpy as np

    if not os.path.isabs(config_path):
        config_path = os.path.join(_configs_root(), config_path)
    _C = Config(config_path, overrides or [])
    model = PretrainingModelFactory.from_config(_C)

    # init with a minimal synthetic batch shaped by the config
    T = _C.DATA.MAX_CAPTION_LENGTH
    tokens = np.full((1, T), _C.DATA.EOS_INDEX, np.int32)
    tokens[:, 0] = _C.DATA.SOS_INDEX
    batch = {
        "image": np.zeros((1, _C.DATA.IMAGE_CROP_SIZE,
                           _C.DATA.IMAGE_CROP_SIZE, 3), np.float32),
        "caption_tokens": tokens,
        "noitpac_tokens": tokens[:, ::-1].copy(),
        "caption_lengths": np.full((1,), T, np.int32),
        "labels": tokens,
        "masked_labels": tokens,
    }
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    if pretrained:
        path = checkpoint_path or _zoo_checkpoint_path(config_path)
        if isinstance(path, str) and path.startswith(_URL_SCHEMES):
            path = fetch(path)
        variables = _load_weights(path, variables, _C)
    return model, variables, _C


def fetch(url: str, sha256: Optional[str] = None,
          cache_dir: Optional[str] = None) -> str:
    """Download ``url`` to the local cache (once) and return the file path
    — the networked-host equivalent of the reference's Dropbox fetch
    (``model_zoo.py:96-103``, via fvcore's download+cache).

    A ``#sha256=<hex>`` URL fragment (or the ``sha256`` argument) is
    verified after download AND on every cache hit; mismatches delete the
    file and raise. ``file://`` URLs are supported (tests, air-gapped
    mirrors)."""
    import hashlib
    import urllib.parse
    import urllib.request

    parsed = urllib.parse.urlparse(url)
    if parsed.fragment.startswith("sha256="):
        sha256 = parsed.fragment[len("sha256="):]
        url = url.split("#", 1)[0]
    cache_dir = cache_dir or os.environ.get(CACHE_DIR_ENV) or os.path.join(
        os.path.expanduser("~"), ".cache", "virtex_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    # unique per-URL cache name (two zoo mirrors may share basenames)
    digest = hashlib.sha256(url.encode()).hexdigest()[:16]
    target = os.path.join(cache_dir,
                          f"{digest}_{os.path.basename(parsed.path)}")

    def _check(path: str) -> None:
        if not sha256:
            return
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        if h.hexdigest() != sha256:
            os.remove(path)
            raise RuntimeError(
                f"checksum mismatch for {url}: expected {sha256}, "
                f"got {h.hexdigest()} (corrupt download removed)")

    if os.path.exists(target):
        _check(target)
        return target
    tmp = target + ".part"
    with urllib.request.urlopen(url, timeout=600) as r, \
            open(tmp, "wb") as f:
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
    os.replace(tmp, target)
    _check(target)
    return target


def _zoo_checkpoint_path(config_path: str) -> str:
    zoo_dir = os.environ.get(ZOO_DIR_ENV)
    if not zoo_dir:
        raise RuntimeError(
            f"pretrained=True needs ${ZOO_DIR_ENV} pointing at a directory "
            "of zoo checkpoints (orbax dirs or reference .pth files), or "
            "an http(s):// base URL hosting '<name>.pth' files.")
    rel = os.path.relpath(config_path, _configs_root())
    base = _MODEL_ZOO_CONFIGS.get(rel.replace(os.sep, "/"))
    if base is None:
        base = os.path.splitext(os.path.basename(config_path))[0]
    if zoo_dir.startswith(_URL_SCHEMES):
        return fetch(f"{zoo_dir.rstrip('/')}/{base}.pth")
    for cand in (os.path.join(zoo_dir, base),
                 os.path.join(zoo_dir, base + ".pth")):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"No zoo checkpoint for {base!r} in {zoo_dir}")


def _load_weights(path: str, variables, _C: Config):
    import jax
    import jax.numpy as jnp

    if path.endswith(".pth") or os.path.isfile(path):
        # reference torch checkpoint → convert
        from virtex_tpu.utils.checkpoint_convert import (
            convert_virtex_checkpoint,
            load_torch_checkpoint,
        )
        m = re.search(r"L(\d+)_", _C.MODEL.TEXTUAL.NAME)
        num_layers = int(m.group(1)) if m else 1
        prenorm = "prenorm" in _C.MODEL.TEXTUAL.NAME
        converted = convert_virtex_checkpoint(
            load_torch_checkpoint(path), num_layers=num_layers,
            prenorm=prenorm)
        merged = _merge_into(variables, converted)
        return jax.tree.map(jnp.asarray, merged)
    from virtex_tpu.engine.checkpointing import load_model_variables
    return load_model_variables(path, variables)


def _merge_into(template, loaded):
    """Recursively overlay loaded arrays onto the template (partial load,
    missing keys keep their init values — reference checkpointing.py:150+)."""
    if not isinstance(template, dict):
        return loaded if loaded is not None else template
    out = {}
    for k, v in template.items():
        out[k] = _merge_into(v, loaded.get(k)) if isinstance(
            loaded, dict) and k in loaded else v
    return out
