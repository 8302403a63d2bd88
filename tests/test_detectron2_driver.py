"""Execute the D2-dependent half of scripts/eval_detectron2.py against the
tests/detectron2_stub API stub (d2>=0.4 semantics: `_trainer` exists, and
evaluators take positional `tasks` with the CfgNode deprecation shim the
reference relies on): ROI-head registration, D2-config construction,
weight-dict load through DetectionCheckpointer matching heuristics, the
resume path's save_dir contract, evaluator selection for all three dataset
kinds, and the TB metric flattening — none of which can run against real
detectron2 here (its CUDA ops are GPU-only; reference
scripts/eval_detectron2.py:81-226).
"""
import argparse
import os
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import eval_detectron2  # noqa: E402

from virtex_tpu.config import Config  # noqa: E402

pytestmark = pytest.mark.slow  # jax resnet18 init per test (compile-cached)

D2_YAML = """\
VERSION: 2
MODEL:
  ROI_HEADS:
    NAME: Res5ROIHeadsExtraNorm
  RESNETS:
    NORM: BN
DATASETS:
  TEST: [voc_2007_test, coco_2017_val, lvis_v0.5_val]
SOLVER:
  MAX_ITER: 2
"""


@pytest.fixture
def d2_stub(monkeypatch):
    """Put the stub on sys.path and hand back its recording modules; purge
    any cached detectron2 imports on both sides of the test.

    These tests call eval_detectron2.main() IN-PROCESS, so common_setup's
    setup_fast_rng would flip the process-global PRNG impl to rbg and break
    later jitted-vs-eager parity tests (dropout streams differ between
    lowering paths under rbg) — pin threefry and restore the config."""
    monkeypatch.setenv("VIRTEX_TPU_THREEFRY", "1")
    import jax
    prev_impl = jax.config.jax_default_prng_impl
    for mod in [m for m in sys.modules if m.split(".")[0] == "detectron2"]:
        del sys.modules[mod]
    monkeypatch.syspath_prepend(os.path.join(HERE, "detectron2_stub"))
    import detectron2.checkpoint as ckpt
    import detectron2.evaluation as ev
    ckpt.LOAD_RECORDS.clear()
    ckpt.RESUME_RECORDS.clear()
    ev.INSTANTIATED.clear()
    yield ckpt, ev
    for mod in [m for m in sys.modules if m.split(".")[0] == "detectron2"]:
        del sys.modules[mod]
    jax.config.update("jax_default_prng_impl", prev_impl)


def make_args(tmp_path, **kw):
    args = dict(
        config=None,
        config_override=["MODEL.VISUAL.NAME", "torchvision::resnet18",
                         "MODEL.VISUAL.FEATURE_SIZE", 512],
        serialization_dir=str(tmp_path / "run"),
        cpu_workers=2,
        checkpoint_every=100,
        d2_config=str(tmp_path / "d2.yaml"),
        d2_config_override=["SOLVER.BASE_LR", "0.01"],
        weight_init="random",
        checkpoint_path=None,
        output=None,
        resume=False,
        eval_only=False,
    )
    args.update(kw)
    (tmp_path / "d2.yaml").write_text(D2_YAML)
    return argparse.Namespace(**args)


def test_train_path_loads_backbone_and_trains(tmp_path, d2_stub):
    ckpt, _ = d2_stub
    _A = make_args(tmp_path)
    eval_detectron2.main(_A)
    # Export pickle written with the matching-heuristics contract.
    import pickle
    with open(os.path.join(_A.serialization_dir,
                           "virtex_backbone_d2.pkl"), "rb") as f:
        exported = pickle.load(f)
    assert exported["matching_heuristics"] is True
    assert "stem.conv1.weight" in exported["model"]
    # The checkpointer really mapped exported tensors into the D2 model:
    # stem conv+norm (5 tensors incl. running stats) and res2.0 conv+norm.
    [load] = ckpt.LOAD_RECORDS
    assert load["n_loaded"] >= 10, load
    assert any(mk.endswith("stem.conv1.weight") for mk, _ in load["pairs"])
    assert any(mk.endswith("res2.0.conv1.norm.running_var")
               for mk, _ in load["pairs"])


def test_eval_only_selects_all_three_evaluator_kinds(tmp_path, d2_stub):
    _, ev = d2_stub
    _A = make_args(tmp_path, eval_only=True)
    eval_detectron2.main(_A)
    kinds = {(cls, name) for cls, name, _ in ev.INSTANTIATED}
    assert kinds == {
        ("PascalVOCDetectionEvaluator", "voc_2007_test"),
        ("COCOEvaluator", "coco_2017_val"),
        ("LVISEvaluator", "lvis_v0.5_val"),
    }
    # test() flattened results into TB scalars in OUTPUT_DIR.
    assert any(f.startswith("events.out.tfevents")
               for f in os.listdir(_A.serialization_dir))


def test_resume_path_points_checkpointer_at_output_dir(tmp_path, d2_stub):
    ckpt, _ = d2_stub
    _A = make_args(tmp_path, resume=True, eval_only=True)
    eval_detectron2.main(_A)
    [rec] = ckpt.RESUME_RECORDS
    # save_dir must be OUTPUT_DIR (fvcore otherwise looks for
    # last_checkpoint in the CWD and silently restarts), resume=True,
    # optimizer+scheduler attached, and "" = no-explicit-path convention.
    assert rec["save_dir"] == _A.serialization_dir
    assert rec["resume"] is True and rec["path"] == ""
    assert rec["has_optimizer"] and rec["has_scheduler"]
    assert not ckpt.LOAD_RECORDS  # resume path must NOT weight-dict load


def test_depth_reaches_d2_config(tmp_path, d2_stub):
    _A = make_args(tmp_path)
    _C = Config(_A.config, _A.config_override)
    d2c = eval_detectron2.build_detectron2_config(_C, _A)
    assert d2c.MODEL.RESNETS.DEPTH == 18
    assert d2c.DATALOADER.NUM_WORKERS == 2
    assert d2c.SOLVER.CHECKPOINT_PERIOD == 100
    assert d2c.SOLVER.BASE_LR == 0.01  # --d2-config-override applied
    assert d2c.OUTPUT_DIR == _A.serialization_dir
