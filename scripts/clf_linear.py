r"""
Linear probe / fine-tune a pretrained visual backbone on ImageNet or
iNaturalist.

Parity target: reference ``scripts/clf_linear.py:70-302`` — two configs
(downstream + pretrain), weight init ∈ {random, imagenet, torchvision,
virtex}, frozen backbone for the linear probe, top-1 accuracy on val,
periodic checkpoints, tensorboard metric channel.
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
    apply_backbone_weight_init,
    initialize_model,
    make_train_step,
)
from virtex_tpu.factories import (
    DownstreamDatasetFactory,
    VisualBackboneFactory,
)
from virtex_tpu.models.downstream import LinearClassifierModel
from virtex_tpu.parallel import create_mesh, shard_batch
from virtex_tpu.utils import distributed as dist
from virtex_tpu.utils.common import common_parser, common_setup
from virtex_tpu.utils.metrics import TopkAccuracy
from virtex_tpu.utils.timer import Timer

logger = logging.getLogger("virtex_tpu")

NUM_CLASSES = {"imagenet": 1000, "inaturalist": 8142}


def main(_A) -> None:
    dist.initialize(_A.coordinator_address, _A.num_processes, _A.process_id)
    # Reference keeps two override channels: --config-override patches
    # the pretrain config, --down-config-override the downstream one
    # (clf_linear.py:26-37).
    _DOWNC = Config(_A.down_config, _A.down_config_override)
    _C = Config(_A.config, _A.config_override) if _A.config else None
    common_setup(_DOWNC, _A, job_type="clf_linear")

    dataset_name = ("imagenet" if "imagenet" in _DOWNC.DATA.ROOT
                    else "inaturalist")
    num_classes = NUM_CLASSES[dataset_name]

    mesh = create_mesh()
    train_ds = DownstreamDatasetFactory.from_config(_DOWNC, split="train")
    val_ds = DownstreamDatasetFactory.from_config(_DOWNC, split="val")
    per_host = _DOWNC.OPTIM.BATCH_SIZE // dist.get_world_size()
    train_loader = DataLoader(train_ds, per_host, shuffle=True,
                              num_workers=_A.cpu_workers, infinite=True,
                              num_shards=dist.get_world_size(),
                              shard_index=dist.get_rank())

    # Visual backbone from the *pretrain* config (or downstream's default),
    # frozen per the downstream config (linear probe) or not (fine-tune).
    backbone_cfg = _C if _C is not None else _DOWNC
    visual = VisualBackboneFactory.create(
        backbone_cfg.MODEL.VISUAL.NAME, frozen=_DOWNC.MODEL.VISUAL.FROZEN)
    model = LinearClassifierModel(visual=visual, num_classes=num_classes)

    train_iter = iter(train_loader)
    with mesh:
        sample = shard_batch(next(train_iter), mesh)
        variables = initialize_model(model, sample, jax.random.PRNGKey(
            _DOWNC.RANDOM_SEED), mesh)

    # ---- weight init (reference clf_linear.py:130-142) -------------------
    apply_backbone_weight_init(
        variables, _A.weight_init, _A.checkpoint_path,
        arch=backbone_cfg.MODEL.VISUAL.NAME.split("::")[-1])

    # Downstream uses ONE learning rate: the reference strips the "visual."
    # prefix by training `model.visual.cnn` directly, so its "cnn"-name dual
    # LR never triggers (factories.py:526-529 comment). Mirror that by
    # pinning cnn_lr = LR here.
    from virtex_tpu.factories import LRSchedulerFactory
    from virtex_tpu.optim import build_optimizer
    tx = build_optimizer(
        variables["params"],
        optimizer_name=_DOWNC.OPTIM.OPTIMIZER_NAME,
        schedule=LRSchedulerFactory.from_config(_DOWNC),
        lr=_DOWNC.OPTIM.LR, cnn_lr=_DOWNC.OPTIM.LR,
        weight_decay=_DOWNC.OPTIM.WEIGHT_DECAY,
        no_decay_pattern=_DOWNC.OPTIM.NO_DECAY,
        momentum=_DOWNC.OPTIM.SGD_MOMENTUM,
        clip_norm=_DOWNC.OPTIM.CLIP_GRAD_NORM,
        use_lookahead=_DOWNC.OPTIM.LOOKAHEAD.USE,
        lookahead_k=_DOWNC.OPTIM.LOOKAHEAD.STEPS,
        lookahead_alpha=_DOWNC.OPTIM.LOOKAHEAD.ALPHA,
        frozen_pattern=("visual" if _DOWNC.MODEL.VISUAL.FROZEN else None))
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    train_step = make_train_step(model, tx, mesh)
    logits_fn = make_logits_fn(model)

    ckpt = CheckpointManager(_A.serialization_dir, keep_recent=5)
    timer = Timer(total_iterations=_DOWNC.OPTIM.NUM_ITERATIONS)
    rng = jax.random.PRNGKey(_DOWNC.RANDOM_SEED)
    # tensorboard channel (reference clf_linear.py:270-277)
    writer = None
    if dist.is_master_process():
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(log_dir=_A.serialization_dir)
        except Exception:
            pass

    with mesh:
        batch = sample
        for iteration in range(1, _DOWNC.OPTIM.NUM_ITERATIONS + 1):
            timer.tic()
            state, metrics = train_step(state, batch, rng)
            batch = shard_batch(next(train_iter), mesh)
            timer.toc()
            if iteration % _A.log_every == 0:
                loss = float(metrics["loss"])
                logger.info(f"{timer.stats} | loss {loss:.4f}")
                if writer:
                    writer.add_scalar("train/loss", loss, iteration)
            if iteration % _A.checkpoint_every == 0:
                acc = evaluate(model, state, val_ds, per_host, mesh,
                               _A.cpu_workers, logits_fn=logits_fn)
                logger.info(f"Val top-1 @ {iteration}: {acc:.2f}")
                if writer:
                    writer.add_scalar(
                        f"metrics/{dataset_name}_top1", acc, iteration)
                # collective save: every process participates
                ckpt.step(state, iteration, metric=acc)

    acc = evaluate(model, state, val_ds, per_host, mesh, _A.cpu_workers,
                   logits_fn=logits_fn)
    logger.info(f"Final {dataset_name} top-1: {acc:.2f}")
    if writer:
        writer.add_scalar(f"metrics/{dataset_name}_top1", acc,
                          _DOWNC.OPTIM.NUM_ITERATIONS)
    print(f'{{"metric": "{dataset_name}_top1", "value": {acc:.3f}}}')


def make_logits_fn(model):
    """Built ONCE in main: a fresh ``@jax.jit`` closure per evaluate() call
    would recompile the full forward every validation sweep."""
    @jax.jit
    def logits_fn(state, batch):
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats},
                          batch, train=False)
        return out["logits"]
    return logits_fn


def _host_rows(x) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in index order.
    Multi-host arrays are only partially addressable — a plain device_get
    would raise; the addressable shards of a ``shard_batch`` output are
    exactly this host's loader rows (make_array_from_process_local_data)."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(jax.device_get(x))
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])


def evaluate(model, state, val_ds, batch_size, mesh, workers,
             logits_fn=None) -> float:
    # Full val split like the reference: the tail batch is PADDED to the
    # static size (keeps shapes mesh-divisible, no recompile) and the
    # duplicate rows are trimmed host-side before scoring.
    loader = DataLoader(val_ds, batch_size, shuffle=False,
                        num_workers=workers, infinite=False,
                        drop_last=False, pad_final=True,
                        num_shards=dist.get_world_size(),
                        shard_index=dist.get_rank())
    top1 = TopkAccuracy(top_k=1)
    logits_fn = logits_fn or make_logits_fn(model)

    remaining = len(val_ds) // dist.get_world_size()
    for batch in loader:
        sharded = shard_batch(batch, mesh)
        logits = _host_rows(logits_fn(state, sharded))
        take = min(len(logits), remaining)
        top1(logits[:take], batch["label"][:take])
        remaining -= take
    return float(dist.average_across_processes(
        np.asarray(top1.get_metric(reset=True))))


if __name__ == "__main__":
    parser = common_parser(description="Linear probe / finetune on "
                                       "ImageNet or iNaturalist.")
    parser.add_argument("--down-config", metavar="FILE", required=True,
                        help="Downstream config yaml.")
    parser.add_argument("--down-config-override", nargs="*", default=[],
                        help="Key-value pairs patching the downstream "
                             "config (reference clf_linear.py:34-37).")
    parser.add_argument(
        "--weight-init",
        choices=["random", "imagenet", "torchvision", "virtex"],
        default="virtex",
        help="random = fresh; imagenet = torchvision model zoo; torchvision "
             "= torch .pth from --checkpoint-path; virtex = our pretrained "
             "checkpoint (reference clf_linear.py:130-142).")
    parser.add_argument("--checkpoint-path", default=None)
    main(parser.parse_args())
