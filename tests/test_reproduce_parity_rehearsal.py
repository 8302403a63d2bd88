"""The closure rehearsal itself is IN the suite (round-5 verdict #2): a
regression in any command of scripts/reproduce_parity.sh — the artifact the
real-data closure depends on — must fail CI, not real-data day.

Runs the synthetic-mode rehearsal end to end in a subprocess: fixtures →
tokenizer selfcheck → 4-iteration pretrain → export/import .pth round-trip
→ feature bit-check (torch reference model vs converted flax) →
eval_captioning --calc-metrics → clf_voc07 → clf_linear.
"""
import os
import subprocess

import pytest

pytestmark = pytest.mark.slow  # multi-minute subprocess smoke

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_synthetic_rehearsal_runs_green(tmp_path):
    env = dict(os.environ)
    # Force the virtual-CPU platform for every CLI the script spawns (the
    # CLIs route through apply_platform_override) and share the warm test
    # compile cache instead of the script's TPU default.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    env["WORKDIR"] = str(tmp_path / "parity")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "reproduce_parity.sh")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800)
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-40:])
    assert proc.returncode == 0, f"rehearsal failed:\n{tail}"
    assert "rehearsal complete" in proc.stdout
    # the new hard gate actually ran and passed
    assert "feature_bitcheck: PASS" in proc.stdout
    assert "tokenizer_selfcheck: PASS" in proc.stdout
