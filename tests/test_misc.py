"""Odds and ends: lookahead slow-weight extraction, library import surface,
Timer, distributed helpers (single-host no-ops), config dump/load."""
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import optax

from virtex_tpu.optim import build_optimizer, lookahead_slow_params, make_schedule
from virtex_tpu.utils import distributed as dist
from virtex_tpu.utils.timer import Timer


def test_lookahead_slow_params_extraction():
    params = {"w": jnp.asarray(1.0)}
    tx = build_optimizer(params, "sgd", make_schedule("none", 10, 0),
                         lr=0.1, cnn_lr=0.1, weight_decay=0.0,
                         use_lookahead=True, lookahead_k=3)
    state = tx.init(params)
    slow0 = lookahead_slow_params(state, params)
    np.testing.assert_allclose(float(slow0["w"]), 1.0)
    # two fast steps: slow unchanged; third step syncs
    for i in range(2):
        updates, state = tx.update({"w": jnp.asarray(1.0)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(float(lookahead_slow_params(state)["w"]), 1.0)
    updates, state = tx.update({"w": jnp.asarray(1.0)}, state, params)
    params = optax.apply_updates(params, updates)
    slow = lookahead_slow_params(state)
    np.testing.assert_allclose(float(slow["w"]), float(params["w"]))
    assert float(slow["w"]) != 1.0


def test_lookahead_slow_params_fallback_without_lookahead():
    params = {"w": jnp.asarray(2.0)}
    tx = build_optimizer(params, "sgd", make_schedule("none", 10, 0),
                         use_lookahead=False)
    state = tx.init(params)
    out = lookahead_slow_params(state, params)
    assert out is params


def test_library_imports_from_scratch_dir(tmp_path):
    """Verify-skill surface: `import virtex_tpu` works from any cwd."""
    code = ("import sys; sys.path.insert(0, '/root/repo'); "
            "import virtex_tpu; from virtex_tpu.config import Config; "
            "c = Config(); print(c.DATA.VOCAB_SIZE)")
    out = subprocess.check_output([sys.executable, "-c", code],
                                  cwd=str(tmp_path))
    assert out.strip() == b"10000"


def test_timer():
    t = Timer(total_iterations=100)
    for _ in range(3):
        t.tic()
        t.toc()
    assert t.avg >= 0
    assert t.throughput(32) > 0
    assert ":" in t.eta_hhmm
    assert "Iter 3" in t.stats


def test_distributed_single_host_noops():
    assert dist.get_world_size() == 1
    assert dist.get_rank() == 0
    assert dist.is_master_process()
    dist.synchronize()  # no-op
    out = dist.average_across_processes({"a": 1.0})
    assert out == {"a": 1.0}


def test_config_dump_roundtrip(tmp_path):
    from virtex_tpu.config import Config
    c = Config(override_list=["OPTIM.BATCH_SIZE", 64])
    p = tmp_path / "dump.yaml"
    c.dump(str(p))
    c2 = Config(str(p))
    assert c2.OPTIM.BATCH_SIZE == 64
    assert c2.MODEL.NAME == c.MODEL.NAME
