r"""
Pretrain a VirTex-style model on COCO Captions — TPU-native training loop.

Parity target: reference ``scripts/pretrain_virtex.py:44-237``. Differences
by design (SURVEY §7): no process spawning (SPMD over a jax Mesh), no
AMP/GradScaler (bf16), optimizer/scheduler/clipping fused into one optax
chain inside the jitted train step, BN stats synced across chips by XLA.

Usage:
    python scripts/pretrain_virtex.py --config configs/_base_bicaptioning_R_50_L1_H1024.yaml \
        --serialization-dir /tmp/virtex_run
"""
from __future__ import annotations

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from virtex_tpu.config import Config
from virtex_tpu.data.loader import DataLoader
from virtex_tpu.engine import (
    CheckpointManager,
    TrainState,
    initialize_model,
    make_eval_step,
    make_train_step,
    place_state,
)
from virtex_tpu.factories import (
    LRSchedulerFactory,
    OptimizerFactory,
    PretrainingDatasetFactory,
    PretrainingModelFactory,
    TokenizerFactory,
)
from virtex_tpu.parallel import create_mesh, shard_batch
from virtex_tpu.utils import distributed as dist
from virtex_tpu.utils.common import common_parser, common_setup
from virtex_tpu.utils.timer import Timer

logger = logging.getLogger("virtex_tpu")


_TOKENIZER_CACHE = {}


def _local_rows(x, k: int):
    """First k rows this PROCESS can address (multi-host arrays are only
    partially addressable; a cross-host gather just for logging is waste)."""
    import numpy as np
    if hasattr(x, "addressable_shards") and not x.is_fully_addressable:
        return np.asarray(x.addressable_shards[0].data)[:k]
    return np.asarray(jax.device_get(x))[:k]


def log_val_predictions(model, state, batch, _C, k: int = 3) -> None:
    """Log a few argmax val predictions vs ground truth (the reference's
    log_predictions helper, ``captioning.py:215-231``).

    MUST be entered by ALL processes (the model.apply below is a collective
    over the sharded batch — a master-only call deadlocks multi-host runs);
    only the master decodes and logs, using its locally-addressable rows.
    """
    try:
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats},
                          batch, train=False)
        if not dist.is_master_process():
            return
        if "caption_tokens" not in batch:
            return
        preds = _local_rows(out.get("predictions"), k)
        gts = _local_rows(batch["caption_tokens"], k)
        tok = _TOKENIZER_CACHE.setdefault(
            _C.DATA.TOKENIZER_MODEL, TokenizerFactory.from_config(_C))
        specials = {_C.DATA.UNK_INDEX, _C.DATA.SOS_INDEX, _C.DATA.EOS_INDEX}
        for p_row, g_row in zip(preds, gts):
            p = tok.decode([int(t) for t in p_row if t not in specials])
            g = tok.decode([int(t) for t in g_row if t not in specials])
            logger.info(f'  pred: "{p}"  |  gt: "{g}"')
    except Exception as e:  # logging must never kill training
        logger.warning(f"log_val_predictions failed: {e}")


def build_summary_writer(serialization_dir):
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(log_dir=serialization_dir)
    except Exception:
        return None


def main(_A) -> None:
    dist.initialize(_A.coordinator_address, _A.num_processes, _A.process_id)
    _C = Config(_A.config, _A.config_override)
    common_setup(_C, _A, job_type="pretrain")
    if _A.debug_nans:
        jax.config.update("jax_debug_nans", True)

    mesh = create_mesh(data=_C.PARALLEL.DATA, model=_C.PARALLEL.MODEL)
    num_hosts = dist.get_world_size()
    per_host_batch = _C.OPTIM.BATCH_SIZE // num_hosts
    # Gradient accumulation (OPTIM.GRAD_ACCUM_STEPS): BATCH_SIZE stays the
    # true global batch; each iteration scans `accum` micro-batches inside
    # one jitted step (engine/trainer.py). Loader batches keep the per-host
    # size — only the device layout changes, so resume accounting below is
    # untouched.
    accum = _C.OPTIM.GRAD_ACCUM_STEPS
    if per_host_batch % accum != 0:
        raise ValueError(
            f"per-host batch {per_host_batch} not divisible by "
            f"OPTIM.GRAD_ACCUM_STEPS={accum}")

    def to_micro(host_batch):
        """(B, ...) host leaves -> (accum, B/accum, ...) micro-step layout."""
        if accum == 1:
            return host_batch
        return {k: v.reshape((accum, v.shape[0] // accum) + v.shape[1:])
                for k, v in host_batch.items()}

    # ----------------------------------------------------------------- data
    train_dataset = PretrainingDatasetFactory.from_config(_C, split="train")
    val_dataset = PretrainingDatasetFactory.from_config(_C, split="val")
    train_loader = DataLoader(
        train_dataset, per_host_batch, shuffle=True,
        num_workers=_A.cpu_workers, seed=_C.RANDOM_SEED,
        prefetch=_C.DATA.PREFETCH, infinite=True,
        num_shards=num_hosts, shard_index=dist.get_rank())
    val_loader_factory = lambda: DataLoader(
        val_dataset, per_host_batch, shuffle=False,
        num_workers=_A.cpu_workers, infinite=False,
        num_shards=num_hosts, shard_index=dist.get_rank())

    # ---------------------------------------------------------------- model
    model = PretrainingModelFactory.from_config(_C)
    train_iter = iter(train_loader)
    first_host_batch = next(train_iter)
    # Init traces on ONE micro-batch's shapes (the shapes the scanned train
    # step sees); with accum == 1 this is the whole batch, as before.
    init_batch = {k: v[: per_host_batch // accum]
                  for k, v in first_host_batch.items()}
    sample = shard_batch(init_batch, mesh)
    rng = jax.random.PRNGKey(_C.RANDOM_SEED)
    with mesh:
        variables = initialize_model(model, sample, rng, mesh)
    # Only the shapes were needed; drop the device copy so a full
    # micro-batch of images doesn't pin HBM for the whole run
    # (first_host_batch itself is reused below as the first train batch).
    del sample, init_batch
    tx = OptimizerFactory.from_config(_C, variables["params"])
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    # Commit every leaf (incl. scalar step / opt-state counters) to the mesh
    # so a checkpoint restore into this template keeps one device set.
    state = place_state(state, mesh)

    train_step = make_train_step(model, tx, mesh, accum_steps=accum)
    eval_step = make_eval_step(model, mesh)

    ckpt_mgr = CheckpointManager(_A.serialization_dir, keep_recent=100)
    start_iteration = 0
    resume_path = _A.resume_from
    if resume_path == "latest":
        # preemptible-VM convenience: restart with the same command and pick
        # up from the newest checkpoint in the serialization dir (if any)
        resume_path = ckpt_mgr.latest()
        if resume_path is None:
            logger.info("--resume-from latest: no checkpoint yet, "
                        "starting fresh")
    if resume_path:
        state, start_iteration = ckpt_mgr.load(resume_path, state,
                                               loader=train_loader)
        train_iter = iter(train_loader)  # re-enter at the restored position
        logger.info(f"Resumed from {resume_path} at {start_iteration}")
    # Schedule multipliers are pure functions of the step; recompute them
    # host-side for the reference's per-param-group LR curves
    # (pretrain_virtex.py:172-183).
    lr_schedule = LRSchedulerFactory.from_config(_C)

    writer = (build_summary_writer(_A.serialization_dir)
              if dist.is_master_process() else None)
    timer = Timer(start_from=start_iteration + 1,
                  total_iterations=_C.OPTIM.NUM_ITERATIONS)

    # ------------------------------------------------------------- hot loop
    # Fresh runs train on the already-fetched init batch (stream batch #1);
    # resumed runs refetch from the restored stream position.
    if start_iteration == 0:
        batch = shard_batch(to_micro(first_host_batch), mesh,
                            micro=accum > 1)
    else:
        batch = shard_batch(to_micro(next(train_iter)), mesh,
                            micro=accum > 1)
    # The host copy is on device now; don't pin a full host batch of images
    # in RAM for the rest of the run.
    del first_host_batch
    tracing = False
    with mesh:
        for iteration in range(start_iteration + 1,
                               _C.OPTIM.NUM_ITERATIONS + 1):
            if _A.profile_dir and iteration == start_iteration + 10:
                jax.profiler.start_trace(_A.profile_dir)
                tracing = True
            if tracing and iteration == start_iteration + 20:
                jax.profiler.stop_trace()
                tracing = False
            timer.tic()
            state, metrics = train_step(state, batch, rng)
            # Overlap: fetch the next host batch while the device step runs.
            batch = shard_batch(to_micro(next(train_iter)), mesh,
                                micro=accum > 1)
            if iteration % _A.log_every == 0:
                metrics = jax.device_get(metrics)  # sync point
            timer.toc()

            if iteration % _A.log_every == 0:
                ips = timer.throughput(_C.OPTIM.BATCH_SIZE)
                logger.info(
                    f"{timer.stats} | loss {metrics['loss']:.4f} | "
                    f"{ips:.1f} img/s | mem "
                    f"{dist.device_mem_usage_mb():.0f}MB")
                if writer:
                    for k, v in metrics.items():
                        writer.add_scalar(f"train/{k}", float(v), iteration)
                    # per-param-group LR curves (reference
                    # pretrain_virtex.py:172-183); dual-LR groups: cnn/rest
                    mult = float(lr_schedule(iteration))
                    writer.add_scalar("lr/cnn", _C.OPTIM.CNN_LR * mult,
                                      iteration)
                    writer.add_scalar("lr/textual", _C.OPTIM.LR * mult,
                                      iteration)

            if iteration % _A.checkpoint_every == 0:
                # Validation sweep (loss over val split) first, so the
                # checkpoint records its metric for rolling-best tracking.
                val_metrics = []
                logged_preds = False
                for val_batch in val_loader_factory():
                    sharded_val = shard_batch(val_batch, mesh)
                    m = eval_step(state, sharded_val)
                    val_metrics.append(jax.device_get(m))
                    if not logged_preds:
                        # reference log_predictions (captioning.py:215-231);
                        # collective — every process enters, master logs
                        log_val_predictions(model, state, sharded_val, _C)
                        logged_preds = True
                metric = None
                if val_metrics:
                    mean = {k: float(np.mean([m[k] for m in val_metrics]))
                            for k in val_metrics[0]}
                    logger.info(f"Val @ {iteration}: {mean}")
                    if writer:
                        for k, v in mean.items():
                            writer.add_scalar(f"val/{k}", v, iteration)
                    # rolling best = lowest val loss (manager is max-based)
                    metric = -mean["loss"]
                # ALL processes enter the save (sharded arrays are written
                # collectively; a master-only gate would hang under TP).
                # Stream position is analytic: batches trained = iteration.
                ckpt_mgr.step(
                    state, iteration, metric=metric,
                    loader_state={"items_consumed":
                                  iteration * per_host_batch})

    if tracing:  # run ended before the 20-step profile window closed
        jax.profiler.stop_trace()
    if _C.OPTIM.NUM_ITERATIONS % _A.checkpoint_every != 0:
        ckpt_mgr.step(state, _C.OPTIM.NUM_ITERATIONS,
                      loader_state={"items_consumed":
                                    _C.OPTIM.NUM_ITERATIONS * per_host_batch})
    ckpt_mgr.wait_until_finished()


if __name__ == "__main__":
    parser = common_parser(
        description="Pretrain a VirTex model on COCO Captions (TPU).")
    main(parser.parse_args())
