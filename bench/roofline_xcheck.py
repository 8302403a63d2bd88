r"""
Cross-check bench/roofline.py's analytic FLOPs against XLA's own cost
analysis: lower + compile the REAL training step (flagship model, small
batch — FLOPs are batch-linear) on the CPU backend and read
``compiled.cost_analysis()['flops']``.

Two counting conventions differ by design:
- roofline.py counts matmul/conv FLOPs only (2*MACs), backward = 2x fwd;
- XLA counts every HLO op (elementwise, reductions, BN math, ...) of the
  optimized module, so it should come out HIGHER, but within ~2x.

A ratio far outside [0.9, 2.0] would mean the analytic account mis-models
the network. Run: python bench/roofline_xcheck.py [--batch 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from virtex_tpu.utils.common import setup_compilation_cache
    setup_compilation_cache()

    import numpy as np

    from __graft_entry__ import _flagship_config, _synthetic_batch
    from virtex_tpu.engine import TrainState, initialize_model, make_train_step
    from virtex_tpu.factories import OptimizerFactory, PretrainingModelFactory
    from virtex_tpu.parallel import create_mesh, shard_batch

    _C = _flagship_config()
    model = PretrainingModelFactory.from_config(_C)
    mesh = create_mesh(data=1, model=1)
    batch = _synthetic_batch(args.batch, _C.DATA.IMAGE_CROP_SIZE,
                             _C.DATA.MAX_CAPTION_LENGTH)
    with mesh:
        sharded = shard_batch(batch, mesh)
        variables = initialize_model(model, sharded, jax.random.PRNGKey(0),
                                     mesh)
        tx = OptimizerFactory.from_config(_C, variables["params"])
        state = TrainState.create(variables["params"],
                                  variables["batch_stats"], tx)
        # jit=False returns the raw step fn (the production wrapper hides
        # .lower); jit it here to reach AOT cost analysis.
        step = make_train_step(model, tx, mesh, donate=False, jit=False)
        lowered = jax.jit(step).lower(state, sharded, jax.random.PRNGKey(1))
        cost = lowered.compile().cost_analysis()

    xla_flops = float(cost.get("flops", float("nan")))

    sys.path.insert(0, os.path.join(REPO, "bench"))
    from roofline import CROP, resnet50_flops_fwd, textual_flops_fwd
    analytic = 3.0 * (resnet50_flops_fwd(args.batch, CROP)
                      + textual_flops_fwd(args.batch))

    ratio = xla_flops / analytic
    print(json.dumps({
        "batch": args.batch,
        "xla_flops": xla_flops,
        "analytic_flops": analytic,
        "xla_over_analytic": round(ratio, 3),
        "ok": bool(0.9 <= ratio <= 2.0),
    }))


if __name__ == "__main__":
    main()
