"""Detectron2 API stub — test-only.

Mirrors the slice of the detectron2 API surface our
``scripts/eval_detectron2.py`` touches, pinned to d2>=0.4 semantics — the
era that HAS ``DefaultTrainer._trainer`` (which the driver's load/resume
paths use) and whose evaluators take ``(dataset_name, tasks, distributed,
output_dir)`` with the deprecation shim that accepts an old-style CfgNode
passed positionally (exactly how the reference calls them,
``eval_detectron2.py:161-163``). This lets the D2-dependent half of the
driver (ROI-head registration, config build, weight-dict load, resume,
evaluator selection, TB logging) be EXECUTED on this host where real
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
