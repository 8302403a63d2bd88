"""Every CLI script's argparse must BUILD — duplicate flags against
common_parser raise argparse.ArgumentError at startup, before main() ever
runs (a real regression class: eval_detectron2 once redefined
--checkpoint-every and crashed on --help)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = [
    "pretrain_virtex.py",
    "eval_captioning.py",
    "clf_linear.py",
    "clf_voc07.py",
    "eval_detectron2.py",
    "build_vocabulary.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_cli_help_builds(script):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), "--help"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "--serialization-dir" in proc.stdout or "usage" in proc.stdout
