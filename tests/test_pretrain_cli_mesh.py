"""Single-process multi-chip pretrain-CLI smokes on an 8-virtual-device CPU
mesh — the exact config-driven path a real pod takes (VERDICT r2 #4):

- dp4×tp2 (``PARALLEL.MODEL=2``): train + val sweep + checkpoint, then a
  second CLI invocation with ``--resume-from latest`` continuing to the
  final iteration;
- dp8 pure data-parallel, with OPTIM.GRAD_ACCUM_STEPS=2 (the accumulation
  path through the CLI: micro-layout batches, scanned train step) and both
  MODEL.*.REMAT knobs on (rematerialization under a mesh).

Each run is a subprocess because the virtual device count must be in
``XLA_FLAGS`` before jax initialises (the suite's own process pins a
different platform config)."""
import json
import os
import pathlib
import shutil
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
    d = tmp_path_factory.mktemp("cli_mesh")
    make_fake_coco(str(d / "coco"), n_images=16)
    make_tokenizer(pathlib.Path(str(d)))
    return d


def run_cli(workdir, run_dir, parallel, num_iterations, resume=False,
            extra_overrides=()):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    data, model_par = parallel
    cmd = [
        sys.executable, os.path.join(REPO, "scripts/pretrain_virtex.py"),
        "--config",
        os.path.join(REPO, "configs/_base_bicaptioning_R_50_L1_H1024.yaml"),
        "--serialization-dir", str(run_dir),
        "--cpu-workers", "2", "--log-every", "2", "--checkpoint-every", "2",
        "--config-override",
        "OPTIM.NUM_ITERATIONS", str(num_iterations),
        "OPTIM.BATCH_SIZE", "8",
        "DATA.ROOT", str(workdir / "coco"),
        "DATA.TOKENIZER_MODEL", str(workdir / "tok.model"),
        "MODEL.VISUAL.NAME", "torchvision::resnet18",
        "MODEL.VISUAL.FEATURE_SIZE", "512",
        "MODEL.TEXTUAL.NAME", "transdec_postnorm::L1_H128_A4_F256",
        "DATA.IMAGE_CROP_SIZE", "64",
        "PARALLEL.DATA", str(data), "PARALLEL.MODEL", str(model_par),
        *extra_overrides,
    ]
    if resume:
        cmd += ["--resume-from", "latest"]
    return subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=900)


def test_pretrain_cli_dp4_tp2_with_resume(workdir, tmp_path):
    run_dir = tmp_path / "run_tp2"
    proc = run_cli(workdir, run_dir, (4, 2), num_iterations=4)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (run_dir / "checkpoint_2").is_dir()
    assert (run_dir / "checkpoint_4").is_dir()

    # second invocation resumes from checkpoint_4 and continues to 6
    proc2 = run_cli(workdir, run_dir, (4, 2), num_iterations=6, resume=True)
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    assert (run_dir / "checkpoint_6").is_dir()
    logs = proc2.stderr + proc2.stdout
    log_files = list(run_dir.glob("log*.txt")) + list(
        run_dir.glob("*.log"))
    for f in log_files:
        logs += f.read_text()
    assert "Resumed from" in logs


def test_pretrain_cli_dp8_grad_accum_remat(workdir, tmp_path):
    # dp8 with OPTIM.BATCH_SIZE 16 / GRAD_ACCUM_STEPS 2: two micro-batches
    # of 8 (1 image/device) scanned inside each of the 2 iterations. Both
    # REMAT knobs are on so rematerialization is exercised under a mesh
    # (jax.checkpoint wrapping the shard_map'd kernels' layers — the
    # interaction CLAUDE.md's multi-device-kernels note warns about).
    run_dir = tmp_path / "run_dp8"
    proc = run_cli(workdir, run_dir, (8, 1), num_iterations=2,
                   extra_overrides=("OPTIM.BATCH_SIZE", "16",
                                    "OPTIM.GRAD_ACCUM_STEPS", "2",
                                    "MODEL.VISUAL.REMAT", "True",
                                    "MODEL.TEXTUAL.REMAT", "True"))
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (run_dir / "checkpoint_2").is_dir()
