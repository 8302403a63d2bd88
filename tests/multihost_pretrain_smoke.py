r"""
Two-process END-TO-END pretrain-CLI smoke: each process plays one "host"
(2 virtual CPU devices each → one global 4-device data mesh), running the
real ``scripts/pretrain_virtex.py`` against synthetic COCO — per-host data
sharding, XLA-collective gradients, the validation sweep, and COLLECTIVE
orbax checkpointing all exercised through the production entry point.

Run directly (not collected by pytest — spawns processes):

    python tests/multihost_pretrain_smoke.py
"""
from __future__ import annotations

import json
import os
import pathlib
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
NUM_PROC = 2
PORT = 29801
WORKDIR = "/tmp/vtx_mh_pretrain"


def prepare_fixtures() -> None:
    sys.path.insert(0, REPO)
    sys.path.insert(0, HERE)
    from utils_fixtures import make_fake_coco, make_tokenizer
    shutil.rmtree(WORKDIR, ignore_errors=True)
    os.makedirs(WORKDIR)
    make_fake_coco(os.path.join(WORKDIR, "coco"), n_images=16)
    make_tokenizer(pathlib.Path(WORKDIR))


def launch() -> int:
    prepare_fixtures()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    procs = []
    for pid in range(NUM_PROC):
        cmd = [
            sys.executable, os.path.join(REPO, "scripts/pretrain_virtex.py"),
            "--config",
            os.path.join(REPO, "configs/_base_bicaptioning_R_50_L1_H1024.yaml"),
            "--serialization-dir", os.path.join(WORKDIR, "run"),
            "--cpu-workers", "2", "--log-every", "2",
            "--checkpoint-every", "4",
            "--coordinator-address", f"localhost:{PORT}",
            "--num-processes", str(NUM_PROC), "--process-id", str(pid),
            "--config-override",
            "OPTIM.NUM_ITERATIONS", "4", "OPTIM.BATCH_SIZE", "8",
            "DATA.ROOT", os.path.join(WORKDIR, "coco"),
            "DATA.TOKENIZER_MODEL", os.path.join(WORKDIR, "tok.model"),
            "MODEL.VISUAL.NAME", "torchvision::resnet18",
            "MODEL.VISUAL.FEATURE_SIZE", "512",
            "MODEL.TEXTUAL.NAME", "transdec_postnorm::L1_H128_A4_F256",
            "DATA.IMAGE_CROP_SIZE", "64",
            "PARALLEL.DATA", "4", "PARALLEL.MODEL", "1",
        ]
        procs.append(subprocess.Popen(cmd, env=env))
    rc = 0
    for p in procs:
        rc |= p.wait()
    ckpt = os.path.join(WORKDIR, "run", "checkpoint_4")
    ok = rc == 0 and os.path.isdir(ckpt)
    print(json.dumps({"multihost_pretrain_smoke": "PASS" if ok else "FAIL",
                      "rc": rc, "checkpoint": os.path.isdir(ckpt)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(launch())
