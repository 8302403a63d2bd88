import numpy as np
import torch

# Test-visible records of every load/resume the driver performs.
LOAD_RECORDS = []
RESUME_RECORDS = []


class DetectionCheckpointer:
    def __init__(self, model, save_dir="", optimizer=None, scheduler=None):
        self.model = model
        self.save_dir = save_dir
        self.optimizer = optimizer
        self.scheduler = scheduler

    def _load_model(self, weights):
        """Simplified matching_heuristics: a checkpoint key matches a model
        key when it is a dot-boundary suffix of it and shapes agree (real
        d2 does longest-suffix matching for exactly these exports)."""
        assert isinstance(weights, dict) and "model" in weights, weights
        assert weights.get("matching_heuristics"), \
            "virtex exports must set matching_heuristics"
        ckpt = weights["model"]
        msd = self.model.state_dict()
        pairs = []
        for mk, mv in msd.items():
            for ck, cv in ckpt.items():
                cv = np.asarray(cv)
                if ((mk == ck or mk.endswith("." + ck))
                        and tuple(mv.shape) == tuple(cv.shape)):
                    msd[mk] = torch.as_tensor(cv.copy())
                    pairs.append((mk, ck))
                    break
        self.model.load_state_dict(msd)
        LOAD_RECORDS.append({"n_loaded": len(pairs), "pairs": pairs})
        return {"incompatible_keys": None}

    def resume_or_load(self, path, resume=False):
        RESUME_RECORDS.append({"path": path, "resume": resume,
                               "save_dir": self.save_dir,
                               "has_optimizer": self.optimizer is not None,
                               "has_scheduler": self.scheduler is not None})
        return {"iteration": 41} if resume else {}
