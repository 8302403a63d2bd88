"""Sharded decode path (VERDICT r2 #5): ``eval_captioning`` run on an
8-virtual-device CPU mesh must produce byte-identical predictions to the
single-device run — decode is per-image independent (eval-mode BN,
row-local beam search), so data-parallel sharding may not change outputs.

Subprocesses because the virtual device count must be in ``XLA_FLAGS``
before jax initialises."""
import json
import os
import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # multi-minute subprocess smoke (-m "not slow" skips)

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    sys.path.insert(0, HERE)
    from utils_fixtures import make_fake_coco, make_tokenizer
    d = tmp_path_factory.mktemp("eval_mesh")
    make_fake_coco(str(d / "coco"), n_images=8)
    make_tokenizer(pathlib.Path(str(d)))
    return d


def run_eval(workdir, out_json, n_devices, serialization_dir,
             extra_overrides=()):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    images_dir = str(workdir / "coco" / "val2017")
    cmd = [
        sys.executable, os.path.join(REPO, "scripts/eval_captioning.py"),
        "--config",
        os.path.join(REPO, "configs/_base_bicaptioning_R_50_L1_H1024.yaml"),
        "--serialization-dir", serialization_dir,
        "--images", images_dir,
        "--batch-size", "8",
        "--output", out_json,
        "--cpu-workers", "0",
        "--config-override",
        "DATA.TOKENIZER_MODEL", str(workdir / "tok.model"),
        "MODEL.VISUAL.NAME", "torchvision::resnet18",
        "MODEL.VISUAL.FEATURE_SIZE", "512",
        "MODEL.TEXTUAL.NAME", "transdec_postnorm::L1_H128_A4_F256",
        "DATA.IMAGE_CROP_SIZE", "64",
        "MODEL.DECODER.BEAM_SIZE", "3",
        "MODEL.DECODER.MAX_DECODING_STEPS", "10",
        *extra_overrides,
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(out_json) as f:
        return json.load(f)


def test_eval_captioning_mesh_matches_single_device(workdir, tmp_path):
    preds_8 = run_eval(workdir, str(tmp_path / "p8.json"), 8,
                       str(tmp_path / "run8"))
    preds_1 = run_eval(workdir, str(tmp_path / "p1.json"), 1,
                       str(tmp_path / "run1"))
    assert len(preds_8) == 8
    assert preds_8 == preds_1


def test_eval_captioning_mesh_matches_single_device_nucleus(workdir,
                                                            tmp_path):
    """Same contract for the stochastic decoder: the CLI's per-batch
    fold_in seed is replicated over the mesh and JAX's counter-based PRNG
    draws per logical index, so sharding the batch axis must not change
    the sampled captions either."""
    overrides = ("MODEL.DECODER.NAME", "nucleus_sampling")
    preds_8 = run_eval(workdir, str(tmp_path / "n8.json"), 8,
                       str(tmp_path / "nrun8"), overrides)
    preds_1 = run_eval(workdir, str(tmp_path / "n1.json"), 1,
                       str(tmp_path / "nrun1"), overrides)
    assert len(preds_8) == 8
    assert preds_8 == preds_1
