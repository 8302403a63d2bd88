r"""
Detectron2 transfer: export the pretrained backbone in Detectron2 format and
(when detectron2 is installed, typically on a GPU host) run detection /
instance-segmentation fine-tuning.

Parity target: reference ``scripts/eval_detectron2.py`` — weight-init ∈
{random, imagenet, torchvision, virtex}, ``Res5ROIHeadsExtraNorm`` head,
VOC/COCO/LVIS evaluator selection. The *export contract*
(``virtex/modules/visual_backbones.py:76-120``) is the portable part: this
script always produces a ``.pkl``/``.pth`` Detectron2 can consume unchanged.
Detectron2 itself (CUDA ops) is out of scope on TPU (SURVEY §2b) — when it
is importable we hand off to its engine, otherwise we write the export and
the D2 config snippets and exit.
"""
from __future__ import annotations

import logging
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from virtex_tpu.config import Config
from virtex_tpu.engine import load_model_variables
from virtex_tpu.factories import VisualBackboneFactory
from virtex_tpu.modules.visual_backbones import detectron2_backbone_state_dict
from virtex_tpu.utils.common import common_parser, common_setup

logger = logging.getLogger("virtex_tpu")


def export_backbone(_C: Config, checkpoint_path, output_path) -> dict:
    visual = VisualBackboneFactory.create(_C.MODEL.VISUAL.NAME, frozen=False)
    sample = jax.numpy.zeros((1, 224, 224, 3))
    variables = visual.init(jax.random.PRNGKey(0), sample, train=False)
    if checkpoint_path:
        # full-model checkpoint: pull the visual subtree
        from virtex_tpu.models.downstream import LinearClassifierModel
        probe = LinearClassifierModel(visual=visual, num_classes=2)
        probe_vars = probe.init(
            jax.random.PRNGKey(0),
            {"image": sample, "label": jax.numpy.zeros((1,), jax.numpy.int32)},
            train=False)
        template = {"params": probe_vars["params"],
                    "batch_stats": probe_vars["batch_stats"]}
        loaded = load_model_variables(checkpoint_path, template)
        variables = {"params": loaded["params"]["visual"],
                     "batch_stats": loaded["batch_stats"]["visual"]}

    d2_dict = detectron2_backbone_state_dict(
        variables["params"]["cnn"], variables["batch_stats"]["cnn"])
    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with open(output_path, "wb") as f:
        pickle.dump(d2_dict, f)
    logger.info(f"Exported {len(d2_dict['model'])} backbone tensors → "
                f"{output_path}")
    return d2_dict


def main(_A) -> None:
    _C = Config(_A.config, _A.config_override)
    common_setup(_C, _A, job_type="eval_detectron2")

    output = _A.output or os.path.join(_A.serialization_dir,
                                       "virtex_backbone_d2.pkl")
    d2_dict = export_backbone(
        _C, _A.checkpoint_path if _A.weight_init == "virtex" else None,
        output)

    try:
        import detectron2  # noqa: F401
    except ImportError:
        logger.info(
            "detectron2 not available on this host (its CUDA ops are GPU-"
            "only). Export complete; run detectron2 fine-tuning on a GPU "
            f"host with:\n  python -m detectron2 … MODEL.WEIGHTS {output}")
        return

    # --- detectron2 available: mirror the reference driver ----------------
    from detectron2.config import get_cfg
    from detectron2.engine import DefaultTrainer, default_setup

    cfg = get_cfg()
    cfg.merge_from_file(_A.d2_config)
    cfg.MODEL.WEIGHTS = output
    cfg.OUTPUT_DIR = _A.serialization_dir
    default_setup(cfg, _A)
    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=_A.resume)
    if _A.eval_only:
        DefaultTrainer.test(cfg, trainer.model)
    else:
        trainer.train()


if __name__ == "__main__":
    parser = common_parser(description="Detectron2 transfer / export.")
    parser.add_argument("--d2-config", default=None,
                        help="Detectron2 task config (configs/detectron2/…).")
    parser.add_argument("--weight-init",
                        choices=["random", "imagenet", "torchvision",
                                 "virtex"],
                        default="virtex")
    parser.add_argument("--checkpoint-path", default=None)
    parser.add_argument("--output", default=None,
                        help="Path for the exported backbone pickle.")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    main(parser.parse_args())
