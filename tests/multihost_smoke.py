r"""
True multi-process (multi-"host") smoke test: N processes × 2 virtual CPU
devices form one global mesh; each process feeds its local batch shard and
runs one jitted train step (gradient all-reduce across processes via gloo).

Run directly (not collected by pytest by default — spawns processes):

    python tests/multihost_smoke.py            # launches both workers
    python tests/multihost_smoke.py <pid>      # worker entry
"""
from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NUM_PROC = 2
PORT = 29789


def worker(pid: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{PORT}", num_processes=NUM_PROC,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np

    from virtex_tpu.engine import TrainState, initialize_model, make_train_step
    from virtex_tpu.models import ForwardCaptioningModel
    from virtex_tpu.modules import ResNetVisualBackbone, TransformerTextualHead
    from virtex_tpu.optim import build_optimizer, make_schedule
    from virtex_tpu.parallel import create_mesh, shard_batch
    from virtex_tpu.utils import distributed as dist

    assert dist.get_world_size() == NUM_PROC
    # dp × tp: the model axis shards textual-head params ACROSS the two
    # local devices — a master-only device_get checkpoint would hang here.
    mesh = create_mesh(data=NUM_PROC, model=2)

    model = ForwardCaptioningModel(
        visual=ResNetVisualBackbone("resnet18", dtype=jnp.float32),
        textual=TransformerTextualHead(
            visual_feature_size=512, vocab_size=50, hidden_size=32,
            num_layers=1, attention_heads=4, feedforward_size=64,
            dropout=0.0, max_caption_length=8, dtype=jnp.float32))

    # per-process LOCAL shard of the global batch (global = 8 = 2 proc × 4)
    rng = np.random.RandomState(pid)
    tokens = rng.randint(4, 50, (4, 8)).astype(np.int32)
    tokens[:, 0] = 1
    local = {"image": rng.rand(4, 32, 32, 3).astype(np.float32),
             "caption_tokens": tokens,
             "noitpac_tokens": tokens[:, ::-1].copy(),
             "caption_lengths": np.full((4,), 8, np.int32)}
    with mesh:
        batch = shard_batch(local, mesh)
        assert batch["image"].shape[0] == 8  # global batch assembled
        variables = initialize_model(model, batch, jax.random.PRNGKey(0),
                                     mesh)
        tx = build_optimizer(variables["params"], "sgd",
                             make_schedule("none", 10, 0), lr=0.01,
                             cnn_lr=0.01, use_lookahead=False)
        state = TrainState.create(variables["params"],
                                  variables["batch_stats"], tx)
        step = make_train_step(model, tx, mesh, donate=False)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        loss = float(metrics["loss"])
    dist.synchronize()
    assert np.isfinite(loss)

    # Multi-host checkpoint round-trip: ALL processes enter save and load
    # (orbax collective over TP-sharded arrays), then training continues.
    import shutil

    from virtex_tpu.engine import CheckpointManager
    ckdir = "/tmp/vtx_multihost_ck"
    if pid == 0:
        shutil.rmtree(ckdir, ignore_errors=True)
    dist.synchronize()
    mgr = CheckpointManager(ckdir, keep_recent=2, async_save=False)
    with mesh:
        mgr.step(state, 1, metric=-loss,
                 loader_state={"items_consumed": 8})

        class FakeLoader:
            def load_state_dict(self, sd):
                self.restored = sd

        fake = FakeLoader()
        restored, it = mgr.load(mgr.latest(), state, loader=fake)
        assert it == 1
        assert fake.restored == {"items_consumed": 8}

        def assert_same(a, b):
            for sa, sb in zip(a.addressable_shards, b.addressable_shards):
                np.testing.assert_array_equal(np.asarray(sa.data),
                                              np.asarray(sb.data))

        jax.tree.map(assert_same, state.params, restored.params)
        # restored state steps forward identically on every process
        state2, m2 = step(restored, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(m2["loss"]))
    dist.synchronize()
    print(f"proc {pid}: loss={loss:.4f} world={dist.get_world_size()} "
          f"tp-ckpt OK", flush=True)


def launcher() -> int:
    procs = [subprocess.Popen([sys.executable, __file__, str(pid)])
             for pid in range(NUM_PROC)]
    rc = 0
    for p in procs:
        rc |= p.wait()
    print("multihost smoke:", "PASS" if rc == 0 else "FAIL")
    return rc


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        sys.exit(launcher())
