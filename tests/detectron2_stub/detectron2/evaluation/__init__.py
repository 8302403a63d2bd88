from . import testing  # noqa: F401

# Test-visible record of every evaluator the driver instantiated.
INSTANTIATED = []


class _EvaluatorBase:
    def evaluate(self):
        return {"bbox": {"AP": 42.0, "AP50": 60.0}}


class PascalVOCDetectionEvaluator(_EvaluatorBase):
    def __init__(self, dataset_name):
        self.dataset_name = dataset_name
        INSTANTIATED.append((type(self).__name__, dataset_name, None))


class COCOEvaluator(_EvaluatorBase):
    # Modern (d2>=0.4 — the era that HAS the DefaultTrainer._trainer the
    # driver's load/resume paths use) signature: the second positional is
    # `tasks`, whose deprecation shim accepts an old-style CfgNode. The
    # reference (and our driver) pass cfg POSITIONALLY through that shim
    # (reference eval_detectron2.py:161); keyword cfg= would TypeError.
    def __init__(self, dataset_name, tasks=None, distributed=True,
                 output_dir=None):
        assert tasks is None or isinstance(tasks, dict), \
            "tasks shim accepts None or an old-style CfgNode"
        assert isinstance(distributed, bool)
        self.dataset_name = dataset_name
        INSTANTIATED.append((type(self).__name__, dataset_name, output_dir))


class LVISEvaluator(_EvaluatorBase):
    def __init__(self, dataset_name, tasks=None, distributed=True,
                 output_dir=None):
        assert tasks is None or isinstance(tasks, dict), \
            "tasks shim accepts None or an old-style CfgNode"
        assert isinstance(distributed, bool)
        self.dataset_name = dataset_name
        INSTANTIATED.append((type(self).__name__, dataset_name, output_dir))
