r"""
Step profiler: trace the flagship train step and rank XLA ops by device time.

Parses the trace with ``jax.profiler.ProfileData`` and reads ONLY the
``/device:TPU…`` plane's line named exactly "XLA Ops" — the "Async XLA Ops"
line double-counts DMAs that overlap compute (that mistake produced the
retracted round-1 "BN = 36.5%" figure; see docs/design.md).

Usage:
    JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu python bench/step_profile.py \
        [--top 40] [--batch 128] [--steps 10] [--group]

Prints per-op totals (ms over the window, ms/step, % of device time) plus a
coarse grouping by op kind. No JSON contract — this is an analysis tool,
not the driver benchmark (that is /root/repo/bench.py).
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_step(batch_size: int):
    import jax

    from __graft_entry__ import _flagship_config, _synthetic_batch
    from virtex_tpu.engine import TrainState, initialize_model, make_train_step
    from virtex_tpu.factories import OptimizerFactory, PretrainingModelFactory
    from virtex_tpu.parallel import create_mesh, shard_batch

    n_chips = len(jax.devices())
    mesh = create_mesh(data=n_chips, model=1)
    _C = _flagship_config()
    model = PretrainingModelFactory.from_config(_C)
    batch = _synthetic_batch(batch_size * n_chips, _C.DATA.IMAGE_CROP_SIZE,
                             _C.DATA.MAX_CAPTION_LENGTH)
    with mesh:
        sharded = shard_batch(batch, mesh)
        variables = initialize_model(model, sharded, jax.random.PRNGKey(0),
                                     mesh)
        tx = OptimizerFactory.from_config(_C, variables["params"])
        state = TrainState.create(variables["params"],
                                  variables["batch_stats"], tx)
        train_step = make_train_step(model, tx, mesh, donate=False)
    return mesh, train_step, state, sharded


def parse_trace(trace_dir: str):
    """-> (events: {op_name: total_ms}, device_total_ms)."""
    from jax.profiler import ProfileData

    pattern = os.path.join(trace_dir, "**", "*.xplane.pb")
    paths = sorted(glob.glob(pattern, recursive=True))
    assert paths, f"no xplane.pb under {trace_dir}"
    data = ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
    totals: dict = collections.defaultdict(float)
    for plane in data.planes:
        if "/device:TPU" not in plane.name and "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                totals[ev.name] += ev.duration_ns / 1e6
    return dict(totals)


def classify(name: str) -> str:
    # Classify by the op's OWN name (the lhs before " = "), never the full
    # HLO text — operand lists mention copy-done/custom-call everywhere.
    n = name.split(" = ")[0].lstrip("%").lower()
    if "convolution" in n:
        return "convolution"
    if "custom-call" in n:
        return "custom-call"
    if "convert" in n and "reduce" in n:
        return "convert/reduce fusion"
    if "reduce" in n:
        return "reduce fusion"
    if "copy" in n or "transpose" in n:
        return "copy/transpose"
    if "select-and-scatter" in n:
        return "maxpool-bwd"
    if "fusion" in n:
        return "fusion"
    if "dot" in n:
        return "dot"
    if "rng" in n or "bitcast" in n:
        return "rng/bitcast"
    if "dynamic" in n or "slice" in n or "scatter" in n or "gather" in n:
        return "slice/scatter/gather"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--batch", type=int, default=128,
                    help="per-chip batch size")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args()

    from virtex_tpu.utils.common import setup_compilation_cache, \
        setup_fast_rng
    setup_compilation_cache()
    setup_fast_rng()
    import jax

    mesh, train_step, state, sharded = build_step(args.batch)
    rng = jax.random.PRNGKey(1)

    with mesh:
        for _ in range(3):  # warmup/compile
            state, metrics = train_step(state, sharded, rng)
        float(metrics["loss"])  # value fetch = the real fence on the tunnel

        trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="step_profile_")
        jax.profiler.start_trace(trace_dir)
        for _ in range(args.steps):
            state, metrics = train_step(state, sharded, rng)
        float(metrics["loss"])  # value fetch = the real fence on the tunnel
        jax.profiler.stop_trace()

    totals = parse_trace(trace_dir)
    device_ms = sum(totals.values())
    per_step = device_ms / args.steps
    print(f"\ndevice time: {device_ms:.2f} ms over {args.steps} steps "
          f"=> {per_step:.2f} ms/step "
          f"({args.batch * len(jax.devices()) / per_step * 1e3:.0f} img/s)")

    groups: dict = collections.defaultdict(float)
    for name, ms in totals.items():
        groups[classify(name)] += ms
    print("\n-- groups --")
    for g, ms in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"{ms / args.steps:9.3f} ms/step  {ms / device_ms * 100:5.1f}%  {g}")

    print(f"\n-- top {args.top} ops --")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{ms / args.steps:9.3f} ms/step  {ms / device_ms * 100:5.1f}%  {name}")
    print(f"\ntrace: {trace_dir}")


if __name__ == "__main__":
    main()
