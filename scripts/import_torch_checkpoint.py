r"""
Convert a reference torch checkpoint (``.pth``) into a native orbax
checkpoint directory loadable by every CLI's ``--checkpoint-path`` /
``--resume-from`` and by ``engine.load_model_variables``.

The inverse of ``scripts/export_torch_checkpoint.py``; together they make
checkpoint interchange bidirectional (reference download → TPU eval, and
TPU pretrain → reference/detectron2 tooling).

Usage:
    python scripts/import_torch_checkpoint.py \
        --config configs/task_ablations/bicaptioning_R_50_L1_H2048.yaml \
        --checkpoint-path bicaptioning_R_50_L1_H2048.pth \
        --output /ckpt/bicaptioning_R_50_L1_H2048
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(_A) -> None:
    import jax  # noqa: F401  (backend must initialize after the override)

    from virtex_tpu.utils.common import apply_platform_override

    apply_platform_override()

    import numpy as np
    import orbax.checkpoint as ocp

    from virtex_tpu.model_zoo import model_zoo

    model, variables, _ = model_zoo.get(
        os.path.abspath(_A.config), pretrained=True,
        checkpoint_path=_A.checkpoint_path, overrides=_A.config_override)

    tree = {
        "state": {
            "params": jax.tree.map(np.asarray, variables["params"]),
            "batch_stats": jax.tree.map(np.asarray,
                                        variables["batch_stats"]),
        },
        "iteration": np.asarray(_A.iteration, np.int32),
    }
    out = os.path.abspath(_A.output)
    ocp.PyTreeCheckpointer().save(out, tree)
    print(f"Wrote {out} (params/batch_stats from {_A.checkpoint_path})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Convert a reference .pth checkpoint to orbax.")
    parser.add_argument("--config", required=True)
    parser.add_argument("--config-override", nargs="*", default=[])
    parser.add_argument("--checkpoint-path", required=True,
                        help="reference torch .pth checkpoint")
    parser.add_argument("--output", required=True,
                        help="orbax checkpoint directory to create")
    parser.add_argument("--iteration", type=int, default=500000)
    main(parser.parse_args())
