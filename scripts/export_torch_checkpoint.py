r"""
Export a virtex_tpu checkpoint to the reference's torch ``.pth`` format.

The reverse of the import converter (``utils/checkpoint_convert.py``):
models pretrained HERE flow back into the reference's tooling — its
``CheckpointManager.load`` (``virtex/utils/checkpointing.py:127-174``)
consumes the emitted ``{"model": state_dict, "iteration": N}`` file, and
the state-dict naming matches the reference model exactly (incl. the
bicaptioning shared-module duplicate keys).

Usage:
    python scripts/export_torch_checkpoint.py --config <pretrain yaml> \
        --checkpoint-path serialization_dir/checkpoint_500000 \
        --output virtex_R_50_L1_H1024.pth
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main(_A) -> None:
    import torch

    from virtex_tpu.config import Config
    from virtex_tpu.engine import initialize_model, load_model_variables
    from virtex_tpu.factories import PretrainingModelFactory
    from virtex_tpu.utils.checkpoint_convert import export_virtex_checkpoint
    from virtex_tpu.utils.common import (
        apply_platform_override,
        setup_compilation_cache,
    )

    # Honor a virtual-CPU-mesh run (site hooks may hijack $JAX_PLATFORMS):
    # an orbax checkpoint written on an n-device mesh restores only onto a
    # matching device set, so exporting from a CPU-mesh training run must
    # itself run on the CPU mesh (caught by reproduce_parity.sh round 4).
    apply_platform_override()
    setup_compilation_cache()

    _C = Config(_A.config, _A.config_override)
    model = PretrainingModelFactory.from_config(_C)

    size = _C.DATA.IMAGE_CROP_SIZE
    tokens = np.ones((1, _C.DATA.MAX_CAPTION_LENGTH), np.int32)
    sample = {"image": np.zeros((1, size, size, 3), np.float32),
              "caption_tokens": tokens, "noitpac_tokens": tokens,
              "caption_lengths": np.full((1,), tokens.shape[1], np.int32),
              "masked_labels": tokens, "labels": tokens}
    variables = initialize_model(model, sample, jax.random.PRNGKey(0))
    template = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
    loaded = load_model_variables(_A.checkpoint_path, template)

    sd = export_virtex_checkpoint(loaded)
    payload = {
        "model": {k: torch.tensor(np.ascontiguousarray(v))
                  for k, v in sd.items()},
        "iteration": _A.iteration,
    }
    torch.save(payload, _A.output)
    print(f"wrote {_A.output} ({len(sd)} tensors)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Export a checkpoint to the reference torch format.")
    parser.add_argument("--config", required=True)
    parser.add_argument("--config-override", nargs="*", default=[])
    parser.add_argument("--checkpoint-path", required=True,
                        help="orbax checkpoint directory (checkpoint_<N>)")
    parser.add_argument("--output", required=True, help=".pth path to write")
    parser.add_argument("--iteration", type=int, default=0)
    main(parser.parse_args())
