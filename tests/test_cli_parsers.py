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
    "feature_bitcheck.py",
    "tokenizer_selfcheck.py",
    "import_torch_checkpoint.py",
    "export_torch_checkpoint.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_cli_help_builds(script):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), "--help"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "--serialization-dir" in proc.stdout or "usage" in proc.stdout


def test_build_vocabulary_writes_both_formats(tmp_path):
    """The vocab CLI writes the native JSON AND the SP-proto export, both
    loadable, and prints the no-SentencePiece-training-parity note."""
    import json
    captions = {"annotations": [
        {"caption": "a man riding a wave on a surfboard"},
        {"caption": "two dogs playing with a frisbee"},
        {"caption": "a plate of food with broccoli and rice"},
    ] * 20}
    cap_path = tmp_path / "captions.json"
    cap_path.write_text(json.dumps(captions))
    prefix = str(tmp_path / "vocab" / "tiny")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "build_vocabulary.py"),
         "-c", str(cap_path), "-s", "120", "-o", prefix],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "NOT match a SentencePiece-trained" in proc.stdout
    from virtex_tpu.data.tokenizers import SentencePieceBPETokenizer
    native = SentencePieceBPETokenizer(prefix + ".model")
    sp = SentencePieceBPETokenizer(prefix + ".sp.model")
    text = "a man riding a wave"
    assert native.encode(text) == sp.encode(text)
