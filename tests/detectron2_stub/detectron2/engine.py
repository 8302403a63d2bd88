import os
from types import SimpleNamespace

import torch

from .modeling.roi_heads import ROI_HEADS_REGISTRY


def default_setup(cfg, args):
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)


class _Conv2dWithNorm(torch.nn.Conv2d):
    """d2's Conv2d carries its norm as a child module — this is what gives
    the 'stem.conv1.norm.weight' state-dict naming the export targets."""

    def __init__(self, *args, norm=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.norm = norm


class _StubBackbone(torch.nn.Module):
    """State-dict keys shaped like d2's ResNet so the virtex export's
    matching-heuristics load has real targets: stem.conv1(+norm) and
    res2.0.conv1(+norm) cover stem + first-stage mapping (shapes chosen to
    match an exported resnet18/resnet50 stem)."""

    def __init__(self):
        super().__init__()
        self.stem = torch.nn.Module()
        self.stem.conv1 = _Conv2dWithNorm(
            3, 64, 7, stride=2, padding=3, bias=False,
            norm=torch.nn.BatchNorm2d(64))
        res2_block = torch.nn.Module()
        res2_block.conv1 = _Conv2dWithNorm(
            64, 64, 3, padding=1, bias=False,
            norm=torch.nn.BatchNorm2d(64))
        self.res2 = torch.nn.ModuleList([res2_block])


class _StubDetector(torch.nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.backbone = _StubBackbone()
        head_cls = ROI_HEADS_REGISTRY.get(cfg.MODEL.ROI_HEADS.NAME)
        self.roi_heads = head_cls(cfg)


class DefaultTrainer:
    def __init__(self, cfg):
        self.cfg = cfg
        self.model = _StubDetector(cfg)
        optimizer = torch.optim.SGD(self.model.parameters(),
                                    lr=cfg.SOLVER.BASE_LR)
        self._trainer = SimpleNamespace(model=self.model,
                                        optimizer=optimizer)
        self.scheduler = SimpleNamespace(state_dict=lambda: {},
                                         load_state_dict=lambda s: None)
        self.start_iter = 0
        self.iter = 0

    def train(self):
        opt = self._trainer.optimizer
        for self.iter in range(self.start_iter, self.cfg.SOLVER.MAX_ITER):
            opt.zero_grad()
            loss = sum((p ** 2).mean() for p in self.model.parameters())
            loss.backward()
            opt.step()

    def test(self, cfg=None, model=None, evaluators=None):
        cfg = cfg or self.cfg
        results = {}
        for name in cfg.DATASETS.TEST:
            evaluator = type(self).build_evaluator(cfg, name)
            results[name] = evaluator.evaluate()
        return results

    @classmethod
    def build_evaluator(cls, cfg, dataset_name, output_folder=None):
        raise NotImplementedError
