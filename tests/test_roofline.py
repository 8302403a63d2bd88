"""bench/roofline.py sanity: the analytic account must track reality.

- R-50 forward conv FLOPs reproduce torchvision's published figure
  (4.09 GMACs at 224^2, v1.5 stride-on-3x3 layout).
- The parameter count matches the ACTUAL flagship model tree
  (jax.eval_shape - traced, never executed, so this is cheap).
"""
import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "roofline", os.path.join(REPO, "bench", "roofline.py"))
roofline = importlib.util.module_from_spec(spec)
spec.loader.exec_module(roofline)


def test_r50_forward_flops_match_torchvision_published():
    macs = roofline.resnet50_flops_fwd(1, 224) / 2.0
    assert abs(macs - 4.09e9) / 4.09e9 < 0.02, f"{macs/1e9:.3f} GMACs"


def test_param_count_matches_flagship_model():
    import jax

    sys.path.insert(0, REPO)
    from __graft_entry__ import _flagship_config, _synthetic_batch
    from virtex_tpu.factories import PretrainingModelFactory

    _C = _flagship_config()
    model = PretrainingModelFactory.from_config(_C)
    batch = _synthetic_batch(1, _C.DATA.IMAGE_CROP_SIZE,
                             _C.DATA.MAX_CAPTION_LENGTH)
    shapes = jax.eval_shape(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False), batch)
    real = sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(shapes["params"]))
    analytic = roofline.resnet50_params() + roofline.textual_params()
    assert abs(real - analytic) / real < 0.02, (real, analytic)
