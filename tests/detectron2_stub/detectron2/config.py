"""Minimal yacs-like CfgNode with the D2 default keys our driver touches."""
import copy

import yaml


class CfgNode(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    def merge_from_file(self, path):
        with open(path) as f:
            self._merge(yaml.safe_load(f) or {})

    def merge_from_list(self, pairs):
        assert len(pairs) % 2 == 0, pairs
        for key, value in zip(pairs[::2], pairs[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            if parts[-1] not in node:
                raise KeyError(f"unknown config key {key}")
            old = node[parts[-1]]
            node[parts[-1]] = type(old)(yaml.safe_load(str(value))) \
                if old is not None else yaml.safe_load(str(value))

    def _merge(self, other, prefix=""):
        for k, v in other.items():
            if k == "VERSION":
                continue
            if k not in self:
                raise KeyError(f"unknown config key {prefix}{k}")
            if isinstance(v, dict):
                self[k]._merge(v, prefix=f"{prefix}{k}.")
            else:
                self[k] = type(self[k])(v) if self[k] is not None else v


def _node(d):
    out = CfgNode()
    for k, v in d.items():
        out[k] = _node(v) if isinstance(v, dict) else v
    return out


_DEFAULTS = {
    "MODEL": {
        "ROI_HEADS": {"NAME": "Res5ROIHeads"},
        "RESNETS": {"DEPTH": 50, "NORM": "FrozenBN"},
        "WEIGHTS": "",
    },
    "DATALOADER": {"NUM_WORKERS": 4},
    "SOLVER": {"CHECKPOINT_PERIOD": 5000, "MAX_ITER": 3, "BASE_LR": 0.02},
    "TEST": {"EVAL_PERIOD": 0},
    "DATASETS": {"TEST": ()},
    "OUTPUT_DIR": "./output",
}


def get_cfg() -> CfgNode:
    return _node(copy.deepcopy(_DEFAULTS))
