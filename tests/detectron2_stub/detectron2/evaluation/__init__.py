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
    # Reference-era (d2 v0.2) signature — the reference calls it
    # positionally as COCOEvaluator(dataset_name, cfg, True, output_folder)
    # (reference eval_detectron2.py:161); our driver passes the same
    # parameters by keyword.
    def __init__(self, dataset_name, cfg, distributed, output_dir=None):
        assert isinstance(distributed, bool)
        self.dataset_name = dataset_name
        INSTANTIATED.append((type(self).__name__, dataset_name, output_dir))


class LVISEvaluator(_EvaluatorBase):
    def __init__(self, dataset_name, cfg, distributed, output_dir=None):
        assert isinstance(distributed, bool)
        self.dataset_name = dataset_name
        INSTANTIATED.append((type(self).__name__, dataset_name, output_dir))
