r"""
Generate captions (beam search / nucleus sampling) for COCO val or an image
directory; optionally compute CIDEr/SPICE.

Parity target: reference ``scripts/eval_captioning.py:44-118``. The decode
path is a single compiled KV-cached search (SURVEY §7.5) instead of the
reference's per-step full-prefix re-forward.
"""
from __future__ import annotations

import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from virtex_tpu.config import Config
from virtex_tpu.data import ImageDirectoryDataset
from virtex_tpu.data.loader import DataLoader
from virtex_tpu.engine import initialize_model
from virtex_tpu.engine.captioner import decode_predictions, make_caption_fn
from virtex_tpu.factories import (
    CaptionDecoderFactory,
    PretrainingDatasetFactory,
    PretrainingModelFactory,
    TokenizerFactory,
)
from virtex_tpu.parallel import create_mesh
from virtex_tpu.utils.common import common_parser, common_setup
from virtex_tpu.utils.metrics import CocoCaptionsEvaluator

logger = logging.getLogger("virtex_tpu")


def main(_A) -> None:
    _C = Config(_A.config, _A.config_override)
    common_setup(_C, _A, job_type="eval_captioning")

    # Decode is per-image independent → pure data parallelism over every
    # available chip, transparently (the reference is single-GPU here,
    # eval_captioning.py:114-115). One device → the plain jit path.
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        if _A.batch_size % n_dev:
            raise SystemExit(
                f"--batch-size {_A.batch_size} must be divisible by the "
                f"{n_dev} devices (each batch is split evenly across them)")
        mesh = create_mesh(data=n_dev, model=1)
        logger.info(f"Decoding data-parallel over {n_dev} devices")

    tokenizer = TokenizerFactory.from_config(_C)
    if _A.data_root:
        dataset = ImageDirectoryDataset(_A.data_root)
    else:
        dataset = PretrainingDatasetFactory.from_config(_C, split="val")

    # pad_final: keep every batch the static size so the compiled decode is
    # built ONCE (a short tail batch would recompile it); the padded rows
    # are trimmed below (sequential order: the first len(dataset)
    # predictions are exactly the real items).
    loader = DataLoader(dataset, _A.batch_size, shuffle=False,
                        num_workers=_A.cpu_workers, infinite=False,
                        drop_last=False, pad_final=True,
                        collate_fn=getattr(dataset, "collate_fn", None))

    model = PretrainingModelFactory.from_config(_C)
    decoder = CaptionDecoderFactory.from_config(_C)

    # Synthetic init batch shaped by the config (the directory dataset has
    # no caption keys, and string image_ids are not jax-able).
    T = _C.DATA.MAX_CAPTION_LENGTH
    toks = np.full((1, T), _C.DATA.EOS_INDEX, np.int32)
    toks[:, 0] = _C.DATA.SOS_INDEX
    init_batch = {
        "image": jax.numpy.zeros((1, _C.DATA.IMAGE_CROP_SIZE,
                                  _C.DATA.IMAGE_CROP_SIZE, 3),
                                 jax.numpy.float32),
        "caption_tokens": jax.numpy.asarray(toks),
        "noitpac_tokens": jax.numpy.asarray(toks[:, ::-1].copy()),
        "caption_lengths": jax.numpy.full((1,), T, jax.numpy.int32),
    }
    variables = initialize_model(model, init_batch, jax.random.PRNGKey(0))
    if _A.checkpoint_path:
        from virtex_tpu.engine import load_model_variables
        template = {"params": variables["params"],
                    "batch_stats": variables["batch_stats"]}
        variables = load_model_variables(_A.checkpoint_path, template)

    caption_fn = make_caption_fn(model, decoder, sos_index=_C.DATA.SOS_INDEX,
                                 prefix_mode=_C.MODEL.DECODER.PREFIX_MODE,
                                 mesh=mesh)

    predictions = []
    for batch_idx, batch in enumerate(loader):
        images = jax.numpy.asarray(batch["image"])
        # fold the batch index in: reusing one key would draw identical
        # sampling noise for every batch (nucleus decoder)
        preds = caption_fn(variables, images,
                           jax.random.fold_in(
                               jax.random.PRNGKey(_C.RANDOM_SEED),
                               batch_idx))
        captions = decode_predictions(preds, tokenizer,
                                      eos_index=_C.DATA.EOS_INDEX)
        ids = np.asarray(batch["image_id"])
        for img_id, caption in zip(ids.tolist(), captions):
            predictions.append({"image_id": img_id, "caption": caption})
    # Drop the pad_final rows: only the last batch is padded (with repeats
    # of its own tail items), so the first len(dataset) rows are exactly
    # the real items — no id-based dedupe, which would silently drop
    # distinct images whose ids collide (a.jpg vs a.png stems).
    predictions = predictions[: len(dataset)]

    logger.info("Sample predictions:")
    for p in predictions[:10]:
        logger.info(f"  {p['image_id']}: {p['caption']}")

    if _A.output:
        os.makedirs(os.path.dirname(os.path.abspath(_A.output)),
                    exist_ok=True)
        with open(_A.output, "w") as f:
            json.dump(predictions, f)

    if _A.calc_metrics:
        gt_path = os.path.join(_C.DATA.ROOT, "annotations",
                               "captions_val2017.json")
        metrics = CocoCaptionsEvaluator(gt_path).evaluate(predictions)
        logger.info(f"Metrics: {metrics}")
        print(json.dumps(metrics))


if __name__ == "__main__":
    parser = common_parser(description="Caption images with a VirTex model.")
    # "--images" is the reference's primary spelling, "--data-root" its
    # alias (eval_captioning.py:23-27); both land on _A.data_root.
    parser.add_argument("--images", "--data-root", dest="data_root",
                        default=None,
                        help="Image directory; defaults to COCO val2017.")
    parser.add_argument("--checkpoint-path", default=None)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--output", default=None,
                        help="Path to save predictions JSON.")
    parser.add_argument("--calc-metrics", action="store_true")
    main(parser.parse_args())
