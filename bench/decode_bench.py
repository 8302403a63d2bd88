r"""
Caption-decode latency benchmark: beam-search (beam 5) p50 latency for a
single image through bicaptioning_R_50_L1_H1024, KV-cached compiled decode.

BASELINE.json config #1 ("greedy caption decode, single COCO image"). The
reference re-runs the full transformer per step per beam on GPU; this path
encodes once and steps a KV cache inside one lax.while_loop.

Usage: python bench/decode_bench.py [batch_size] [--decoder beam|nucleus]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from virtex_tpu.utils.common import setup_compilation_cache


def main(batch_size=1, decoder_name="beam"):
    setup_compilation_cache()
    import jax

    from __graft_entry__ import _flagship_config
    from virtex_tpu.engine.captioner import make_caption_fn
    from virtex_tpu.factories import (
        CaptionDecoderFactory,
        PretrainingModelFactory,
    )

    _C = _flagship_config()
    if decoder_name == "nucleus":
        _C.defrost()
        _C.MODEL.DECODER.NAME = "nucleus_sampling"
        _C.freeze()
    model = PretrainingModelFactory.from_config(_C)
    decoder = CaptionDecoderFactory.from_config(_C)

    images = jax.numpy.asarray(
        np.random.RandomState(0).rand(batch_size, 224, 224, 3), jax.numpy.float32)
    tokens = np.full((batch_size, _C.DATA.MAX_CAPTION_LENGTH), 2, np.int32)
    tokens[:, 0] = 1
    batch = {"image": images,
             "caption_tokens": jax.numpy.asarray(tokens),
             "noitpac_tokens": jax.numpy.asarray(tokens[:, ::-1].copy()),
             "caption_lengths": jax.numpy.full((batch_size,), 30,
                                               jax.numpy.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    rng = jax.random.PRNGKey(1)

    # DISTINCT image batches, pre-placed on device: the axon tunnel relay
    # memoizes repeated executions with identical arguments (discovered
    # round 3 — constant-arg timing loops measure RPC latency, not
    # compute), so every timed call must see fresh input content.
    pool = [jax.block_until_ready(jax.numpy.asarray(
        np.random.RandomState(100 + i).rand(batch_size, 224, 224, 3),
        jax.numpy.float32)) for i in range(8)]
    # Pre-folded rng pool: fold_in is its own remote execution on the dev
    # tunnel (~an extra RPC inside the timed region) and rng prep is input
    # prep, not decode work.
    rng_pool = [jax.block_until_ready(jax.random.fold_in(rng, i))
                for i in range(30)]

    def measure(dec, label):
        caption_fn = make_caption_fn(model, dec, sos_index=_C.DATA.SOS_INDEX)
        preds = caption_fn(variables, images, rng)  # compile
        np.asarray(preds)  # value fetch — the only real fence (see pool)
        times = []
        for i in range(30):
            img = pool[i % len(pool)]
            r = rng_pool[i]
            t0 = time.perf_counter()
            preds = caption_fn(variables, img, r)
            np.asarray(preds)  # (B, 30) int32 — negligible transfer
            times.append(time.perf_counter() - t0)
        p50 = sorted(times)[len(times) // 2] * 1000
        print(json.dumps({
            "metric": f"bicaptioning_R50_L1_H1024 {'nucleus-0.9' if decoder_name == 'nucleus' else 'beam-5'} decode p50 ({label})",
            "batch_size": batch_size,
            "value": round(p50, 2),
            "unit": "ms",
        }))

    # as-deployed: EOS early exit active (untrained weights may exit early)
    measure(decoder, "early-exit")
    # worst case: force all 30 steps (EOS index outside vocab never latches)
    import copy
    full = copy.copy(decoder)
    full.eos_index = 10**6
    measure(full, "full-30-steps")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("batch_size", nargs="?", type=int, default=1)
    ap.add_argument("--decoder", choices=("beam", "nucleus"), default="beam")
    a = ap.parse_args()
    main(a.batch_size, a.decoder)
