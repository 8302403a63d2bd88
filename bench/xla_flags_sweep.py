r"""
XLA:TPU flag sweep on the flagship train step.

CLAUDE.md round-2 lead #1: the conv stack (56% of the step) runs well below
the MXU roofline; docs/design.md shows the big fusions sit near the HBM
floor, so the remaining headroom is scheduling/fusion policy — exactly what
XLA's TPU flags control. This harness times `bench.py`'s step under each
candidate flag set in a fresh subprocess (flags are process-global) and
reports img/s deltas vs the no-flag control.

Each variant compiles from scratch through the tunnel (minutes); results are
appended to bench/xla_flags_sweep.results.jsonl so a sweep can be resumed.

Usage:  python bench/xla_flags_sweep.py [--only NAME] [--repeat 1]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

RESULTS = os.path.join(os.path.dirname(__file__), "xla_flags_sweep.results.jsonl")

# Candidate variants. Each entry: (name, xla_flags, config_overrides).
VARIANTS = [
    ("control", "", ""),
    # Bigger scoped VMEM lets the fusion planner build deeper fusions
    # (default 16 MiB; v5e has 128 MiB VMEM).
    ("vmem_48m", "--xla_tpu_scoped_vmem_limit_kib=49152", ""),
    ("vmem_96m", "--xla_tpu_scoped_vmem_limit_kib=98304", ""),
    # Latency-hiding scheduler: overlaps copies/collectives with compute.
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true", ""),
    # Loop-invariant code motion threshold: allow more size inflation.
    ("licm_8", "--xla_tpu_licm_size_inflation_ratio=8", ""),
    # Disable reduce+broadcast fusion (BN patterns sometimes schedule better
    # unfused).
    ("no_rwb", "--xla_tpu_rwb_fusion=false", ""),
    ("conv_vmem", "--xla_tpu_scoped_vmem_limit_kib=65536 "
                  "--xla_tpu_licm_size_inflation_ratio=8", ""),
    # Weight-equivalent space-to-depth stem (modules/resnet.py).
    ("stem_s2d", "", "MODEL.VISUAL.STEM_S2D True"),
    ("stem_s2d_vmem", "--xla_tpu_scoped_vmem_limit_kib=65536",
     "MODEL.VISUAL.STEM_S2D True"),
]


def run_variant(name: str, flags: str, overrides: str, repeat: int) -> dict:
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    if overrides:
        env["VIRTEX_BENCH_OVERRIDES"] = overrides
    # Separate compile cache per variant: flags change the compiled program
    # but the cache key may not include every flag.
    env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/jax_cache_sweep_{name}"
    best = None
    for i in range(repeat):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                              "bench.py")],
                env=env, capture_output=True, text=True, timeout=3600)
        except subprocess.TimeoutExpired:
            # Record the hang instead of aborting the whole sweep — but
            # keep any repeat that already succeeded (a valid measurement
            # beats an error row, and a non-error row is skipped on
            # resume instead of re-wedging for another hour).
            if best is not None:
                break
            return {"name": name, "flags": flags, "overrides": overrides,
                    "error": "timeout after 3600s"}
        line = None
        for ln in proc.stdout.splitlines():
            if ln.startswith("{"):
                line = json.loads(ln)
        if line is None:
            # Mirror the timeout handling: a valid earlier repeat beats an
            # error row (and keeps the variant skipped on resume).
            if best is not None:
                break
            err = (proc.stderr or proc.stdout)[-2000:]
            if "Unknown flag" in err and "XLA_FLAGS" in err:
                # Expected on the axon dev tunnel: compilation happens
                # server-side and the local process rejects --xla_tpu_*
                # flags. Record compactly; a real TPU runtime re-measures
                # these rows (error rows don't count as done on resume).
                return {"name": name, "flags": flags,
                        "overrides": overrides,
                        "error": "tunnel rejects server-side --xla_tpu_* "
                                 "flags (Unknown flag in XLA_FLAGS)"}
            return {"name": name, "flags": flags, "overrides": overrides,
                    "error": err}
        if best is None or line["value"] > best["value"]:
            best = line
    return {"name": name, "flags": flags, "overrides": overrides,
            "img_per_sec": best["value"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    done = set()
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            for ln in f:
                row = json.loads(ln)
                # Error rows don't count as done: the committed results
                # carry tunnel-rejected --xla_tpu_* variants that a real
                # runtime should re-measure, not skip.
                if "error" not in row:
                    done.add(row["name"])

    for name, flags, overrides in VARIANTS:
        if args.only and name != args.only:
            continue
        if name in done and not args.only:
            print(f"skip {name} (already in {RESULTS})")
            continue
        print(f"=== {name}: {flags or '(none)'} {overrides}", flush=True)
        res = run_variant(name, flags, overrides, args.repeat)
        print(json.dumps(res), flush=True)
        with open(RESULTS, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
