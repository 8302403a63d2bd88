r"""
Common script plumbing: argument parser, run setup (seeds, logging, config
dump), infinite batch cycling.

Parity target: reference ``virtex/utils/common.py`` — ``cycle`` (infinite
loader with epoch re-seeding, ``common.py:14-36``), ``common_setup`` (seeds,
per-rank log files, config dump, ``common.py:39-99``), ``common_parser``
(shared CLI flags, ``common.py:102-154``). TPU differences: no
``--num-gpus-per-machine`` spawn flags (hosts run SPMD); the device count
comes from the runtime; RNG is an explicit ``jax.random.PRNGKey``.
"""
from __future__ import annotations

import argparse
import logging
import os
import random
import sys
from typing import Any, Iterator, Optional

import numpy as np

from virtex_tpu.config import Config
from virtex_tpu.utils import distributed as dist

logger = logging.getLogger("virtex_tpu")


def common_parser(description: str = "") -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config", metavar="FILE",
                        help="Path to a config file.")
    parser.add_argument("--config-override", nargs="*", default=[],
                        help="Dotted-key value pairs overriding config.")
    parser.add_argument("--serialization-dir", default="/tmp/virtex_tpu_run",
                        help="Directory for checkpoints, logs, config dump.")
    parser.add_argument("--cpu-workers", type=int, default=4,
                        help="Host data-pipeline worker threads.")
    parser.add_argument("--checkpoint-every", type=int, default=2000)
    parser.add_argument("--log-every", type=int, default=20)
    parser.add_argument("--resume-from", default=None,
                        help="Checkpoint path to resume training from.")
    # Multi-host rendezvous (TPU pods usually auto-detect all of these).
    parser.add_argument("--coordinator-address", default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    # Observability / debugging (SURVEY §5.1-5.2).
    parser.add_argument("--profile-dir", default=None,
                        help="Capture a jax.profiler trace of iterations "
                             "10-20 into this directory.")
    parser.add_argument("--debug-nans", action="store_true",
                        help="Trap NaNs in compiled code "
                             "(jax_debug_nans; slows execution).")
    return parser


def _cpu_machine_key() -> str:
    """Fingerprint of this host's CPU (model + feature flags). XLA:CPU AOT
    executables are machine-feature-specific: loading a cache entry written
    on a different host emits a wall of SIGILL-risk warnings (and may
    crash). Keying the CPU cache dir by machine keeps caches private to
    compatible hosts."""
    import hashlib
    import platform
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for line in f:
                tag = line.split(":", 1)[0].strip()
                if tag in ("model name", "flags") and tag not in seen:
                    seen.add(tag)
                    parts.append(line.strip())
                if len(seen) == 2:
                    break
    except OSError:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]


def setup_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache (compiles on the TPU
    tunnel take minutes; cached reruns are instant). CPU-platform runs get
    a machine-keyed subdirectory — see :func:`_cpu_machine_key`."""
    import jax
    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/virtex_tpu_xla"))
    platforms = getattr(jax.config, "jax_platforms", None) or ""
    platform = platforms.split(",")[0]
    if not platform:
        # Nothing pinned jax_platforms (no site hook, no override): the
        # backend autodetects — a TPU-less host lands on CPU and still
        # needs the machine-keyed dir. Resolving the default backend
        # initializes it, which is safe here: cache-dir config is
        # consulted at compile time, and every caller runs
        # apply_platform_override() first.
        try:
            platform = jax.default_backend()
        except Exception:
            platform = ""
    if platform == "cpu":
        cache_dir = os.path.join(cache_dir, f"cpu-{_cpu_machine_key()}")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def setup_fast_rng() -> None:
    """Use the hardware RBG PRNG for on-device randomness (dropout):
    measured +6.5% pretrain throughput on v5e vs the default threefry
    (whose counter math burns VPU cycles). Same distributions, different
    bits; set VIRTEX_TPU_THREEFRY=1 to keep the default."""
    if os.environ.get("VIRTEX_TPU_THREEFRY"):
        return
    import jax
    try:
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass


def apply_platform_override() -> None:
    """Honor a virtual-device CPU run (``XLA_FLAGS=--xla_force_host_
    platform_device_count=N``) even on hosts whose site hooks override
    ``$JAX_PLATFORMS`` (the axon tunnel injects ``axon,cpu``): when the
    virtual-device flag is present, force the CPU platform through
    ``jax.config`` before the backend initializes. Used by all CLI scripts
    so multi-device sharding can be exercised without real chips."""
    if "xla_force_host_platform_device_count" in os.environ.get(
            "XLA_FLAGS", ""):
        try:
            import jax
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def common_setup(_C: Config, _A: argparse.Namespace,
                 job_type: str = "pretrain") -> None:
    """Seed python/numpy, configure logging (one file per host, stdout on
    master only), dump the config to the serialization dir."""
    apply_platform_override()
    os.makedirs(_A.serialization_dir, exist_ok=True)
    setup_compilation_cache()
    setup_fast_rng()

    rank = dist.get_rank()
    handlers = [logging.FileHandler(
        os.path.join(_A.serialization_dir, f"log-rank{rank}.txt"))]
    if dist.is_master_process():
        handlers.append(logging.StreamHandler(sys.stdout))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=handlers, force=True)

    random.seed(_C.RANDOM_SEED)
    np.random.seed(_C.RANDOM_SEED)

    if dist.is_master_process():
        logger.info(f"{job_type}: world size {dist.get_world_size()}")
        logger.info(str(_C))
        _C.dump(os.path.join(_A.serialization_dir, f"{job_type}_config.yaml"))


def cycle(loader_factory, start_epoch: int = 0) -> Iterator[Any]:
    """Infinite stream of batches; ``loader_factory(epoch)`` builds one
    epoch's iterator (epoch index re-seeds the shuffle, mirroring
    ``DistributedSampler.set_epoch`` — reference ``common.py:25-30``)."""
    epoch = start_epoch
    while True:
        for batch in loader_factory(epoch):
            yield batch
        epoch += 1
