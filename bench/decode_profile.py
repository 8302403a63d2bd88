r"""
Decode profiler: trace compiled decode calls (beam search by default,
``--decoder nucleus`` for top-p sampling) and report DEVICE time —
separates real compute from the dev tunnel's per-call RPC overhead
in the wall-clock p50 that bench/decode_bench.py reports.

Each traced call uses distinct input content (the tunnel memoizes
identical-argument executions) and the parse reads only the TPU plane's
"XLA Ops" line (same recipe as bench/step_profile.py).

Usage:
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu \
        python bench/decode_profile.py [batch_size] [--calls 8] [--top 20]
"""
from __future__ import annotations

import argparse
import collections
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from step_profile import classify, parse_trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch_size", nargs="?", type=int, default=32)
    def _at_least_two(v):
        n = int(v)
        if n < 2:  # call 0 warms the compile; calls 1.. are traced
            raise argparse.ArgumentTypeError("--calls must be >= 2")
        return n

    ap.add_argument("--calls", type=_at_least_two, default=8)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--decoder", choices=("beam", "nucleus"), default="beam")
    def _at_least_one(v):
        n = int(v)
        if n < 1:  # mirror the decoder constructors' validation — the
            # attribute is assigned post-construction below
            raise argparse.ArgumentTypeError("--unroll must be >= 1")
        return n

    ap.add_argument("--unroll", type=_at_least_one, default=None,
                    help="decode-loop sub-steps per while iteration "
                         "(default: the decoder class default); outputs "
                         "are bitwise identical at any value")
    ap.add_argument("--params", choices=("bf16", "fp32"), default="bf16",
                    help="bf16 (default) pre-casts the textual matmul "
                         "params once per call (cast_decode_params, "
                         "bit-identical); fp32 leaves the casts inside "
                         "the 30-step loop for A/B")
    args = ap.parse_args()

    from virtex_tpu.utils.common import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import numpy as np

    from __graft_entry__ import _flagship_config
    from virtex_tpu.engine.captioner import make_caption_fn
    from virtex_tpu.factories import (
        CaptionDecoderFactory,
        PretrainingModelFactory,
    )

    _C = _flagship_config()
    if args.decoder == "nucleus":
        _C.defrost()
        _C.MODEL.DECODER.NAME = "nucleus_sampling"
        _C.freeze()
    model = PretrainingModelFactory.from_config(_C)
    decoder = CaptionDecoderFactory.from_config(_C)
    # worst case: every search runs all 30 steps
    import copy
    decoder = copy.copy(decoder)
    decoder.eos_index = 10 ** 6
    if args.unroll is not None:
        decoder.unroll = args.unroll

    B = args.batch_size
    T = _C.DATA.MAX_CAPTION_LENGTH
    tokens = np.full((B, T), 2, np.int32)
    tokens[:, 0] = 1
    init = {"image": jax.numpy.zeros((B, 224, 224, 3), jax.numpy.float32),
            "caption_tokens": jax.numpy.asarray(tokens),
            "noitpac_tokens": jax.numpy.asarray(tokens[:, ::-1].copy()),
            "caption_lengths": jax.numpy.full((B,), T, jax.numpy.int32)}
    variables = model.init(jax.random.PRNGKey(0), init, train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    caption_fn = make_caption_fn(model, decoder,
                                 sos_index=_C.DATA.SOS_INDEX,
                                 cast_params=(args.params == "bf16"))
    pool = [jax.numpy.asarray(
        np.random.RandomState(i).rand(B, 224, 224, 3), jax.numpy.float32)
        for i in range(args.calls)]
    rngs = ([None] * args.calls if args.decoder == "beam"
            else [jax.random.PRNGKey(i) for i in range(args.calls)])

    def call(i):
        if args.decoder == "beam":
            return caption_fn(variables, pool[i])
        return caption_fn(variables, pool[i], rngs[i])

    np.asarray(call(0))  # compile + warm

    trace_dir = tempfile.mkdtemp(prefix="decode_profile_")
    jax.profiler.start_trace(trace_dir)
    for i in range(1, args.calls):
        preds = call(i)
    np.asarray(preds)  # value fetch = the real fence on the tunnel
    jax.profiler.stop_trace()

    totals = parse_trace(trace_dir)
    calls = args.calls - 1
    device_ms = sum(totals.values())
    per_call = device_ms / calls
    print(f"\ndevice time: {device_ms:.2f} ms over {calls} decode calls "
          f"=> {per_call:.2f} ms/call = {per_call / B:.3f} ms/image "
          f"(batch {B}, full-30-steps)")

    groups = collections.defaultdict(float)
    for name, ms in totals.items():
        groups[classify(name)] += ms
    print("\nby op kind (ms/call):")
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v / calls:8.3f}  {100 * v / device_ms:5.1f}%")
    print(f"\ntop {args.top} ops (ms/call):")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {ms / calls:8.3f}  {name[:110]}")


if __name__ == "__main__":
    main()
