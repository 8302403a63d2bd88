from collections import OrderedDict

import torch


class Registry:
    def __init__(self, name):
        self._name = name
        self._obj_map = {}

    def register(self, obj=None):
        def deco(cls):
            self._obj_map[cls.__name__] = cls
            return cls
        return deco(obj) if obj is not None else deco

    def get(self, name):
        return self._obj_map[name]


ROI_HEADS_REGISTRY = Registry("ROI_HEADS")


@ROI_HEADS_REGISTRY.register()
class Res5ROIHeads(torch.nn.Module):
    """res5 block built via the overridable hook the driver's
    Res5ROIHeadsExtraNorm extends (reference eval_detectron2.py:81-92)."""

    def __init__(self, cfg, input_shape=None):
        super().__init__()
        self.res5, self.res5_out_channels = self._build_res5_block(cfg)

    def _build_res5_block(self, cfg):
        seq = torch.nn.Sequential(OrderedDict([
            ("conv", torch.nn.Conv2d(256, 512, 3, padding=1, bias=False)),
        ]))
        return seq, 512
