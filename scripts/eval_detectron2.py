r"""
Detectron2 transfer: fine-tune a detector from the pretrained visual
backbone (LVIS / COCO instance segmentation, VOC 07+12 detection).

Parity target: reference ``scripts/eval_detectron2.py`` — all four
weight-init modes {random, imagenet, torchvision, virtex}
(``eval_detectron2.py:177-226``), the ``Res5ROIHeadsExtraNorm`` ROI head
(``:81-92``), D2-config construction with depth inferred from the visual
name (``:95-116``), ``--d2-config-override``, and a ``DownstreamTrainer``
with VOC/COCO/LVIS evaluator selection and TB metric logging (``:119-174``).

TPU-native split: everything except the Detectron2 engine itself runs on
any host — the backbone weights are assembled HERE (orbax/virtex, torch
``.pth``/torchvision, torchvision model zoo, or random init) and renamed to
the Detectron2 convention (``virtex/modules/visual_backbones.py:76-120``
contract). When detectron2 (GPU CUDA ops) is importable, the script drives
it exactly like the reference; otherwise it writes the export ``.pkl`` and
exits, so the fine-tune can run on a GPU host unchanged.
"""
from __future__ import annotations

import logging
import os
import pickle
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from virtex_tpu.config import Config
from virtex_tpu.factories import VisualBackboneFactory
from virtex_tpu.modules.visual_backbones import detectron2_backbone_state_dict
from virtex_tpu.utils.common import common_parser, common_setup

logger = logging.getLogger("virtex_tpu")


# --------------------------------------------------------------------------
# Pure helpers (unit-tested without detectron2)
# --------------------------------------------------------------------------
def infer_resnet_depth(visual_name: str) -> int:
    """ResNet depth for D2's ``MODEL.RESNETS.DEPTH`` from the visual-name
    grammar (reference ``eval_detectron2.py:108-116``): ``torchvision::
    resnet50`` → 50, ``detectron2::…_R_101_…`` → 101, anything else → 0."""
    m = re.search(r"resnet(\d+)", visual_name)
    if m:  # torchvision grammar, with or without the "torchvision::" prefix
        return int(m.group(1))
    m = re.search(r"_R_(\d+)", visual_name)
    if m:  # detectron2 grammar
        return int(m.group(1))
    return 0


def gather_backbone_weights(_C: Config, weight_init: str,
                            checkpoint_path=None) -> dict:
    """Assemble the backbone in Detectron2 format for one of the four
    reference init modes (``eval_detectron2.py:177-226``). Always returns
    the ``{"model", "__author__", "matching_heuristics"}`` dict.

    All four modes flow through the clf scripts' shared
    :func:`apply_backbone_weight_init` (one conversion code path) via a
    throwaway probe model whose ``visual`` subtree is the export source.
    """
    if weight_init not in ("random", "virtex", "torchvision", "imagenet"):
        raise ValueError(f"unknown --weight-init {weight_init!r}")
    if weight_init in ("virtex", "torchvision") and not checkpoint_path:
        # Same guard as apply_backbone_weight_init: without a checkpoint
        # these modes fall back to the random init (still exports a valid
        # D2 pickle, e.g. for a random-init baseline).
        logger.warning(f"--weight-init {weight_init} without "
                       "--checkpoint-path: exporting random init")
        weight_init = "random"

    from virtex_tpu.engine import apply_backbone_weight_init
    from virtex_tpu.models.downstream import LinearClassifierModel

    visual = VisualBackboneFactory.create(_C.MODEL.VISUAL.NAME, frozen=False)
    probe = LinearClassifierModel(visual=visual, num_classes=2)
    probe_vars = probe.init(
        jax.random.PRNGKey(_C.RANDOM_SEED),
        {"image": jax.numpy.zeros((1, 224, 224, 3)),
         "label": jax.numpy.zeros((1,), jax.numpy.int32)},
        train=False)
    variables = {"params": probe_vars["params"],
                 "batch_stats": probe_vars["batch_stats"]}
    apply_backbone_weight_init(variables, weight_init, checkpoint_path,
                               arch=_C.MODEL.VISUAL.NAME.split("::")[-1])
    return detectron2_backbone_state_dict(
        variables["params"]["visual"]["cnn"],
        variables["batch_stats"]["visual"]["cnn"])


# --------------------------------------------------------------------------
# Detectron2-dependent pieces (import-guarded)
# --------------------------------------------------------------------------
def register_extra_norm_roi_heads():
    """Register ``Res5ROIHeadsExtraNorm`` — res5 stage followed by a norm
    layer, used by the C4/DC5 VOC configs (reference
    ``eval_detectron2.py:81-92``). Idempotent."""
    import detectron2 as d2
    from detectron2.modeling.roi_heads import ROI_HEADS_REGISTRY, Res5ROIHeads

    if "Res5ROIHeadsExtraNorm" in getattr(ROI_HEADS_REGISTRY, "_obj_map", {}):
        return

    @ROI_HEADS_REGISTRY.register()
    class Res5ROIHeadsExtraNorm(Res5ROIHeads):  # noqa: F811
        def _build_res5_block(self, cfg):
            seq, out_channels = super()._build_res5_block(cfg)
            seq.add_module(
                "norm",
                d2.layers.get_norm(cfg.MODEL.RESNETS.NORM, out_channels))
            return seq, out_channels


def build_detectron2_config(_C: Config, _A):
    """Reference ``eval_detectron2.py:95-116``: D2 defaults ← task config
    file ← CLI override list, plus run-level knobs and the inferred ResNet
    depth."""
    import detectron2 as d2

    _D2C = d2.config.get_cfg()
    _D2C.merge_from_file(_A.d2_config)
    _D2C.merge_from_list(_A.d2_config_override)
    _D2C.DATALOADER.NUM_WORKERS = _A.cpu_workers
    _D2C.SOLVER.CHECKPOINT_PERIOD = _A.checkpoint_every
    _D2C.OUTPUT_DIR = _A.serialization_dir
    _D2C.MODEL.RESNETS.DEPTH = infer_resnet_depth(_C.MODEL.VISUAL.NAME)
    return _D2C


def run_detectron2(_C: Config, _A, weights: dict) -> None:
    """Hand the assembled weights to a reference-scope DownstreamTrainer."""
    import detectron2 as d2
    import torch
    from detectron2.checkpoint import DetectionCheckpointer
    from detectron2.engine import DefaultTrainer, default_setup
    from detectron2.evaluation import (
        COCOEvaluator,
        LVISEvaluator,
        PascalVOCDetectionEvaluator,
    )

    register_extra_norm_roi_heads()
    _D2C = build_detectron2_config(_C, _A)
    default_setup(_D2C, _A)

    class DownstreamTrainer(DefaultTrainer):
        """Reference ``eval_detectron2.py:119-174``: loads a weight dict
        (or resumes a D2 checkpoint path) and selects the evaluator by
        dataset type."""

        def __init__(self, cfg, weights):
            super().__init__(cfg)
            if isinstance(weights, str):
                # Resume from a Detectron2 checkpoint path; save_dir makes
                # resume_or_load("" , resume=True) find OUTPUT_DIR's
                # last_checkpoint (without it fvcore looks in the CWD and
                # silently restarts from scratch).
                self.start_iter = (DetectionCheckpointer(
                    self._trainer.model,
                    save_dir=cfg.OUTPUT_DIR,
                    optimizer=self._trainer.optimizer,
                    scheduler=self.scheduler,
                ).resume_or_load(weights, resume=True).get("iteration", -1)
                    + 1)
            else:
                DetectionCheckpointer(self._trainer.model)._load_model(
                    weights)

        @classmethod
        def build_evaluator(cls, cfg, dataset_name, output_folder=None):
            output_folder = output_folder or os.path.join(
                cfg.OUTPUT_DIR, "inference")
            kind = d2.data.MetadataCatalog.get(dataset_name).evaluator_type
            if kind == "pascal_voc":
                return PascalVOCDetectionEvaluator(dataset_name)
            # POSITIONAL, exactly like the reference
            # (eval_detectron2.py:161-163): on old d2 the second parameter
            # is `cfg`; on d2>=0.4 (the era whose `_trainer` attribute the
            # load/resume paths above use) it is `tasks`, whose
            # deprecation shim accepts a CfgNode. Keyword `cfg=` would be
            # a TypeError there.
            if kind == "coco":
                return COCOEvaluator(dataset_name, cfg, True, output_folder)
            if kind == "lvis":
                return LVISEvaluator(dataset_name, cfg, True, output_folder)
            raise NotImplementedError(kind)

        def test(self, cfg=None, model=None, evaluators=None):
            from torch.utils.tensorboard import SummaryWriter
            cfg = cfg or self.cfg
            model = model or self.model
            writer = SummaryWriter(log_dir=cfg.OUTPUT_DIR)
            results = super().test(cfg, model)
            flat = d2.evaluation.testing.flatten_results_dict(results)
            for k, v in flat.items():
                writer.add_scalar(k, v, getattr(self, "start_iter", 0))
            return results

    if _A.resume:
        # Let D2 resume from its own checkpoint. resume_or_load(resume=True)
        # prefers OUTPUT_DIR's last_checkpoint; "" means "no explicit path"
        # (the DefaultTrainer convention), so --checkpoint-path is optional.
        weights = _A.checkpoint_path or ""
    trainer = DownstreamTrainer(_D2C, weights)
    if _A.eval_only:
        trainer.test()
    else:
        trainer.train()
    del torch  # quiet linters; torch import asserts the GPU host contract


def main(_A) -> None:
    if _A.weight_init == "imagenet":
        _A.config_override.extend(["MODEL.VISUAL.PRETRAINED", True])
    _C = Config(_A.config, _A.config_override)
    common_setup(_C, _A, job_type="eval_detectron2")

    weights = gather_backbone_weights(
        _C, _A.weight_init,
        checkpoint_path=_A.checkpoint_path)
    output = _A.output or os.path.join(_A.serialization_dir,
                                       "virtex_backbone_d2.pkl")
    os.makedirs(os.path.dirname(os.path.abspath(output)), exist_ok=True)
    with open(output, "wb") as f:
        pickle.dump(weights, f)
    logger.info(f"Exported {len(weights['model'])} backbone tensors → "
                f"{output}")

    try:
        import detectron2  # noqa: F401
    except ImportError:
        logger.info(
            "detectron2 not available on this host (its CUDA ops are GPU-"
            "only). Export complete; run the fine-tune on a GPU host:\n"
            f"  python scripts/eval_detectron2.py … (same args)\n"
            f"or point any D2 tool at MODEL.WEIGHTS {output}")
        return

    run_detectron2(_C, _A, weights)


if __name__ == "__main__":
    parser = common_parser(description="Detectron2 transfer / export.")
    parser.add_argument("--d2-config", default=None,
                        help="Detectron2 task config (configs/detectron2/…).")
    parser.add_argument(
        "--d2-config-override", nargs="*", default=[],
        help="Key-value pairs overriding the D2 config file (reference "
             "eval_detectron2.py:44-49; NUM_WORKERS / CHECKPOINT_PERIOD / "
             "OUTPUT_DIR are set from run-level args).")
    parser.add_argument(
        "--weight-init",
        choices=["random", "imagenet", "torchvision", "virtex"],
        default="virtex",
        help="random = fresh init; imagenet = torchvision model zoo; "
             "torchvision = torch .pth from --checkpoint-path; "
             "virtex = our pretrained checkpoint from --checkpoint-path.")
    parser.add_argument("--checkpoint-path", default=None)
    # (--checkpoint-every comes from common_parser; D2's CHECKPOINT_PERIOD
    # is set from it in build_detectron2_config.)
    parser.add_argument("--output", default=None,
                        help="Path for the exported backbone pickle.")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    main(parser.parse_args())
