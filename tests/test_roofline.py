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


def test_decode_weight_sets_consistent_with_train_account():
    """The decode account's streamed-weight set must stay in sync with the
    train account's textual params: per-step weights = one direction's
    sublayer params MINUS the cross K/V projections (cached at init) PLUS
    the tied-embedding logits matrix (+ LN epsilon-scale params)."""
    H, F, V = roofline.HIDDEN, roofline.FFN, roofline.VOCAB
    per_dir = 8 * H * H + 2 * H * F   # textual_params' per-direction set
    want = per_dir - 2 * H * H + H * V + 6 * H
    assert roofline.decode_step_weight_params() == want
    assert roofline.decode_init_weight_params() == \
        roofline.VISUAL_FEAT * H + 2 * H * H


def test_decode_floor_anchors_measured_device_times():
    """The analytic per-call floor must sit BELOW the measured device times
    (it is a bound) and within ~3x of them (decode is latency-bound
    sequential kernels — floor utilization near the train step's 36.7% MFU,
    not near zero, or the account is broken). Measured: 20.9 ms beam-5 /
    11.33 ms nucleus @ bs32 full-30-steps (bench/decode_profile.py)."""
    beam = roofline.decode_account(32, 5, roofline.CAP_LEN, 20.9, "beam-5")
    nuc = roofline.decode_account(32, 1, roofline.CAP_LEN, 11.33, "nucleus")
    assert beam["floor_ms"] < 20.9
    assert nuc["floor_ms"] < 11.33
    assert 0.2 < beam["floor_utilization"] < 1.0
    assert 0.2 < nuc["floor_utilization"] < 1.0
    # nucleus (no beam reorder) per-step floor IS the weight stream — the
    # round-3 "rest at weight-streaming floor" claim, now quantified.
    assert nuc["weight_stream_ms"] / (nuc["step_floor_us"] * 30 / 1e3) > 0.75
    # beam adds cache-reorder + 5x vocab traffic: strictly above nucleus
    assert beam["floor_ms"] > nuc["floor_ms"]


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
