r"""
Multi-chip scaling sweep: flagship pretrain throughput vs mesh size/layout.

CLAUDE.md lead #3: this dev box exposes ONE real chip, so committed numbers
cover n=1 only — the harness is ready for any multi-chip runtime (v5e-8,
v4 pod slice): it sweeps power-of-two chip counts with pure-DP meshes and,
where the count allows, a dp×tp(2) layout, and reports per-chip throughput
plus scaling efficiency vs the single-chip row.

    python bench/scaling_bench.py             # all available chips
    python bench/scaling_bench.py --max 4     # cap the sweep
    python bench/scaling_bench.py --cpu 8     # 8 virtual CPU devices
                                              # (pipeline validation only —
                                              # CPU timings are meaningless)

Appends one JSON line per configuration to bench/scaling_bench.results.jsonl
and prints a summary table.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RESULTS = os.path.join(os.path.dirname(__file__),
                       "scaling_bench.results.jsonl")


def measure(n_chips: int, model_par: int, batch_per_chip: int,
            iters: int, tiny: bool = False) -> float:
    import jax

    from __graft_entry__ import _flagship_config, _synthetic_batch
    from virtex_tpu.engine import (
        TrainState,
        initialize_model,
        make_train_step,
    )
    from virtex_tpu.engine.trainer import donation_supported
    from virtex_tpu.factories import (
        OptimizerFactory,
        PretrainingModelFactory,
    )
    from virtex_tpu.parallel import create_mesh, shard_batch

    data_par = n_chips // model_par
    mesh = create_mesh(data=data_par, model=model_par,
                       devices=jax.devices()[:n_chips])
    _C = _flagship_config(tiny=tiny)
    model = PretrainingModelFactory.from_config(_C)
    batch = _synthetic_batch(batch_per_chip * data_par,
                             64 if tiny else _C.DATA.IMAGE_CROP_SIZE,
                             _C.DATA.MAX_CAPTION_LENGTH)
    with mesh:
        sharded = shard_batch(batch, mesh)
        variables = initialize_model(model, sharded, jax.random.PRNGKey(0),
                                     mesh)
        tx = OptimizerFactory.from_config(_C, variables["params"])
        state = TrainState.create(variables["params"],
                                  variables["batch_stats"], tx)
        step = make_train_step(model, tx, mesh,
                               donate=donation_supported())
        rng = jax.random.PRNGKey(1)
        for _ in range(3):
            state, metrics = step(state, sharded, rng)
        float(metrics["loss"])  # value fetch = the real fence on the tunnel
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, sharded, rng)
        float(metrics["loss"])  # value fetch = the real fence on the tunnel
        dt = time.perf_counter() - t0
    return len(batch["image"]) * iters / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max", type=int, default=None,
                    help="Cap the largest chip count swept.")
    ap.add_argument("--batch-per-chip", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", type=int, default=None,
                    help="Run on N virtual CPU devices (validation only).")
    ap.add_argument("--tiny", action="store_true",
                    help="resnet18 + H128 head at 64px — sweep-logic "
                         "validation on hosts that can't run the flagship.")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={args.cpu}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    from virtex_tpu.utils.common import (
        setup_compilation_cache,
        setup_fast_rng,
    )
    setup_compilation_cache()
    setup_fast_rng()  # rbg PRNG — same config as bench.py

    n_avail = len(jax.devices())
    counts, n = [], 1
    while n <= (args.max or n_avail) and n <= n_avail:
        counts.append(n)
        n *= 2

    rows = []
    for n_chips in counts:
        layouts = [(n_chips, 1)]
        if n_chips >= 2:
            layouts.append((n_chips, 2))  # dp×tp(2)
        for total, mp in layouts:
            label = f"dp{total // mp}" + (f"×tp{mp}" if mp > 1 else "")
            try:
                ips = measure(total, mp, args.batch_per_chip, args.iters,
                              tiny=args.tiny)
            except Exception as e:  # record and continue the sweep
                rows.append({"chips": total, "layout": label,
                             "error": repr(e)[:500]})
                print(f"{label}: ERROR {e!r}", flush=True)
                continue
            row = {"chips": total, "layout": label,
                   "img_per_sec": round(ips, 2),
                   "img_per_sec_per_chip": round(ips / total, 2),
                   "batch_per_chip": args.batch_per_chip,
                   "model": "tiny_r18_h128" if args.tiny
                            else "bicaptioning_R_50_L1_H1024",
                   "platform": jax.devices()[0].platform}
            base = next((r for r in rows
                         if r.get("chips") == 1 and "img_per_sec" in r), None)
            if base:
                row["scaling_efficiency"] = round(
                    row["img_per_sec_per_chip"] /
                    base["img_per_sec_per_chip"], 3)
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open(RESULTS, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"\n{len(rows)} rows appended to {RESULTS}")


if __name__ == "__main__":
    main()
