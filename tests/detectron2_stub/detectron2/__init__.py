"""Detectron2 API stub — test-only.

Mirrors the slice of the detectron2 API surface the reference's
``eval_detectron2.py`` era (d2 ~v0.2: ``COCOEvaluator(dataset_name, cfg,
distributed, output_dir)`` positional signature) that our
``scripts/eval_detectron2.py`` touches, so the D2-dependent half of the
driver (ROI-head registration, config build, weight-dict load, resume,
evaluator selection, TB logging) can be EXECUTED on this host where real
detectron2 (GPU CUDA ops) cannot be installed. Every class records what it
was called with, and the fake checkpointer really loads matching tensors,
so tests assert behavior rather than just imports.
"""
from . import (  # noqa: F401
    checkpoint,
    config,
    data,
    engine,
    evaluation,
    layers,
    modeling,
)
