r"""
Throughput across ablation configs (width/depth/backbone), synthetic data.

Usage: python bench/ablation_bench.py [config_rel ...]
Defaults to the widest (H2048) and deepest (L4) ablations.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from virtex_tpu.utils.common import setup_compilation_cache, setup_fast_rng


def main(configs):
    setup_compilation_cache()
    setup_fast_rng()
    import jax

    from __graft_entry__ import _synthetic_batch
    from virtex_tpu.config import Config
    from virtex_tpu.engine import TrainState, initialize_model, make_train_step
    from virtex_tpu.factories import OptimizerFactory, PretrainingModelFactory
    from virtex_tpu.parallel import create_mesh, shard_batch

    repo = os.path.join(os.path.dirname(__file__), "..")
    for rel in configs:
        _C = Config(os.path.join(repo, "configs", rel))
        model = PretrainingModelFactory.from_config(_C)
        bs = 128
        batch = _synthetic_batch(bs, 224, 30, vocab=_C.DATA.VOCAB_SIZE)
        # Task-specific batch keys (models/masked_lm.py, classification.py).
        if "masked_lm" in _C.MODEL.NAME:
            batch["masked_labels"] = batch.pop("noitpac_tokens")
        elif "classification" in _C.MODEL.NAME:
            labels = batch.pop("caption_tokens")
            if "token" not in _C.MODEL.NAME:  # multilabel: 80 categories
                labels = labels % 80 + 1
            batch = {"image": batch["image"], "labels": labels}
        mesh = create_mesh(1, 1)
        with mesh:
            sb = shard_batch(batch, mesh)
            variables = initialize_model(model, sb, jax.random.PRNGKey(0),
                                         mesh)
            tx = OptimizerFactory.from_config(_C, variables["params"])
            state = TrainState.create(variables["params"],
                                      variables["batch_stats"], tx)
            step = make_train_step(model, tx, mesh)
            rng = jax.random.PRNGKey(1)
            for _ in range(3):
                state, m = step(state, sb, rng)
            float(m["loss"])  # value fetch = the real fence on the tunnel
            t0 = time.perf_counter()
            for _ in range(10):
                state, m = step(state, sb, rng)
            float(m["loss"])  # value fetch = the real fence on the tunnel
            dt = time.perf_counter() - t0
        print(json.dumps({"config": rel,
                          "img_per_sec": round(bs * 10 / dt, 1)}))


if __name__ == "__main__":
    args = sys.argv[1:] or [
        "width_ablations/bicaptioning_R_50_L1_H2048.yaml",
        "depth_ablations/bicaptioning_R_50_L4_H1024.yaml",
    ]
    main(args)
