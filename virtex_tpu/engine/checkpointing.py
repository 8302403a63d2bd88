r"""
Checkpoint management on orbax — multi-host correct.

Parity target: reference ``virtex/utils/checkpointing.py:12-174`` —
``step(iteration, metric)`` serialises ``checkpoint_<iter>`` plus a rolling
``checkpoint_best`` (higher-is-better), prunes to ``keep_recent``, and
``load`` does partial restore returning the saved iteration.

TPU-native: checkpoints are orbax pytree directories (async-friendly —
SURVEY §5.3 recommends async for preemptible TPU VMs), not torch pickles.
The saved tree is ``{"state": TrainState-as-dict, "iteration": i,
"loader": {...}}``; restore works into any matching pytree template, so the
same files serve resume, model-zoo download targets, and downstream init
(the reference's interchange contract, SURVEY §5.4).

Multi-host contract (unlike the reference's master-only torch.save):
**every process calls ``step``/``load``** — sharded ``jax.Array`` leaves are
passed to orbax as-is (each host writes the shards it owns; a master-only
``device_get`` of TP-sharded params would hang), while directory mutations
(pre-clean, best-copy, prune) happen on process 0 between cross-host
barriers.
"""
from __future__ import annotations

import json
import logging
import os
import re
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from virtex_tpu.utils import distributed as dist

_MISSING = object()  # sentinel: template key absent from a checkpoint


def _saved_optional_keys(reader: "ocp.StandardCheckpointer",
                         path: str) -> set:
    """Which optional top-level entries a checkpoint carries. Round-1
    checkpoints predate ``loader``/``best_metric``; sniffing the committed
    metadata lets every generation restore."""
    try:
        md = reader.metadata(path)
        items = md.item_metadata if hasattr(md, "item_metadata") else md
        return {k for k in ("loader", "best_metric", "best_iteration")
                if k in items}
    except Exception:
        return set()


def _is_primary() -> bool:
    return jax.process_index() == 0


class CheckpointManager:
    r"""
    Args:
        serialization_dir: directory for ``checkpoint_<iteration>`` subdirs.
        keep_recent: how many recent checkpoints to retain.
        async_save: background the write (training resumes immediately).
    """

    def __init__(self, serialization_dir: str, keep_recent: int = 100,
                 async_save: bool = True):
        self.serialization_dir = os.path.abspath(serialization_dir)
        if _is_primary():
            os.makedirs(self.serialization_dir, exist_ok=True)
        dist.synchronize()
        self.keep_recent = keep_recent
        self.best_metric: Optional[float] = None
        self.best_iteration: Optional[int] = None
        self.async_save = async_save
        self._ckpt = (ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                      if async_save else ocp.StandardCheckpointer())
        self._reader = ocp.StandardCheckpointer()  # sync restores
        self._pending: Optional[Tuple[int, Optional[float]]] = None

    # -- save ---------------------------------------------------------------
    def _path(self, name) -> str:
        return os.path.join(self.serialization_dir, f"checkpoint_{name}")

    def step(self, state: Any, iteration: int,
             metric: Optional[float] = None,
             loader_state: Optional[Dict[str, int]] = None) -> None:
        """Serialise ``state`` at ``iteration``; track rolling best by
        ``metric`` (higher is better); prune old checkpoints. ALL processes
        must call this (collective).

        ``loader_state`` (``DataLoader.state_dict()``) rides along so resume
        replays the exact input stream.

        With ``async_save`` (default) the write happens in a background
        thread — training resumes immediately (SURVEY §5.3: async
        checkpointing for preemptible TPU VMs); best/prune bookkeeping for a
        save is deferred until the next ``step``/``wait`` so in-flight
        directories are never touched.
        """
        self.wait_until_finished()
        # Persist the rolling-best metric as it will stand AFTER this
        # save's deferred flush — otherwise a resumed run starts with
        # best_metric=None and the first (possibly worse) metric
        # overwrites checkpoint_best.
        new_best, new_best_iter = self.best_metric, self.best_iteration
        if metric is not None and (new_best is None or metric > new_best):
            new_best, new_best_iter = float(metric), iteration
        tree = {"state": state,
                "iteration": np.asarray(iteration, np.int32),
                "best_metric": np.asarray(
                    np.nan if new_best is None else new_best, np.float64),
                "best_iteration": np.asarray(
                    -1 if new_best_iter is None else new_best_iter,
                    np.int32),
                "loader": {"items_consumed": np.asarray(
                    (loader_state or {}).get("items_consumed", 0),
                    np.int64)}}
        path = self._path(iteration)
        if _is_primary() and os.path.exists(path):
            shutil.rmtree(path)
        dist.synchronize()
        self._ckpt.save(path, tree)
        self._pending = (iteration, metric)
        if not self.async_save:
            self.wait_until_finished()

    def wait_until_finished(self) -> None:
        """Block until the in-flight save commits, then run deferred
        best-tracking and pruning (process 0 mutates, everyone barriers)."""
        self._ckpt.wait_until_finished()
        if self._flush_pending():
            dist.synchronize()

    def _flush_pending(self) -> bool:
        """Deferred best-copy + prune for the last committed save. No
        collective — callable from ``__del__`` where a barrier could hang
        interpreter teardown."""
        if self._pending is None:
            return False
        iteration, metric = self._pending
        self._pending = None
        if metric is not None and (self.best_metric is None
                                   or metric > self.best_metric):
            self.best_metric = float(metric)
            self.best_iteration = iteration
            if _is_primary():
                self._copy_best(iteration)
        if _is_primary():
            self._prune()
        return True

    def _copy_best(self, iteration: int) -> None:
        """checkpoint_<iteration> → checkpoint_best, plus a sidecar
        recording WHICH iteration the copy holds (load() uses it to heal a
        checkpoint_best left stale by a crash between the async save and
        the deferred flush)."""
        best = self._path("best")
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(self._path(iteration), best)
        tmp = os.path.join(self.serialization_dir, ".best.json.tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps({"iteration": iteration,
                                "metric": self.best_metric}))
        os.replace(tmp, os.path.join(self.serialization_dir, "best.json"))

    def _numbered(self) -> List[int]:
        out = []
        for d in os.listdir(self.serialization_dir):
            m = re.fullmatch(r"checkpoint_(\d+)", d)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _prune(self) -> None:
        numbered = self._numbered()
        for it in numbered[: max(0, len(numbered) - self.keep_recent)]:
            shutil.rmtree(self._path(it), ignore_errors=True)

    def latest(self) -> Optional[str]:
        self.wait_until_finished()  # in-flight saves commit under tmp names
        numbered = self._numbered()
        return self._path(numbered[-1]) if numbered else None

    def __del__(self):
        # Flush the in-flight save AND the deferred best-copy/prune so a
        # caller that never calls wait_until_finished (e.g. a script that
        # simply returns after its last step) still gets the rolling-best
        # contract — but skip the barrier: collectives are unsafe during
        # interpreter teardown.
        try:
            self._ckpt.wait_until_finished()
            self._flush_pending()
        except Exception:
            pass

    # -- load ---------------------------------------------------------------
    def _saved_keys(self, path: str) -> set:
        return _saved_optional_keys(self._reader, path)

    def load(self, path: str, state_template: Any,
             loader: Optional[Any] = None) -> Tuple[Any, int]:
        """Restore into the template's structure/shardings; returns
        ``(state, iteration)``. Mirrors reference partial-load semantics
        (``checkpointing.py:127-174``): the template defines what is
        restored. Pass the training ``loader`` to also restore its stream
        position."""
        path = os.path.abspath(path)
        self.wait_until_finished()
        target = {"state": state_template,
                  "iteration": np.asarray(0, np.int32)}
        saved = self._saved_keys(path)
        if "loader" in saved:
            target["loader"] = {"items_consumed": np.asarray(0, np.int64)}
        if "best_metric" in saved:
            target["best_metric"] = np.asarray(np.nan, np.float64)
        if "best_iteration" in saved:
            target["best_iteration"] = np.asarray(-1, np.int32)
        tree = self._reader.restore(path, target=target)
        if loader is not None and "loader" in saved:
            loader.load_state_dict(
                {"items_consumed": int(tree["loader"]["items_consumed"])})
        if "best_metric" in saved:
            bm = float(tree["best_metric"])
            self.best_metric = None if np.isnan(bm) else bm
        if "best_iteration" in saved:
            bi = int(tree["best_iteration"])
            self.best_iteration = None if bi < 0 else bi
            self._heal_best()
        return tree["state"], int(tree["iteration"])

    def _heal_best(self) -> None:
        """A preemption between an async save and its deferred flush
        leaves checkpoint_best one generation stale while the restored
        best_metric says otherwise — re-copy from the recorded best
        iteration if that checkpoint still exists."""
        # Only the primary inspects storage and heals; every process then
        # meets the same unconditional barrier. (Per-process conditionals
        # on filesystem state could send processes down different paths on
        # multi-host setups with divergent storage views, hanging resume.)
        if self.best_iteration is not None and _is_primary():
            sidecar = os.path.join(self.serialization_dir, "best.json")
            try:
                with open(sidecar) as f:
                    held = json.load(f).get("iteration")
            except Exception:
                held = None
            if (held != self.best_iteration
                    and os.path.isdir(self._path(self.best_iteration))):
                self._copy_best(self.best_iteration)
        dist.synchronize()


def load_model_variables(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Partial restore: only ``params`` / ``batch_stats`` out of a full
    TrainState checkpoint — the eval/downstream-init path (reference
    partial-load, ``checkpointing.py:127-174``).

    Args:
        path: checkpoint directory (``checkpoint_<iter>``).
        template: ``{"params": …, "batch_stats": …}`` pytree giving the
            expected structure.
    """
    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    state = raw["state"]
    missing: List[str] = []

    def merge(tmpl, ckpt, prefix):
        # Walk the TEMPLATE (not a strict zip): checkpoints from a
        # different model carry extra subtrees (a pretraining checkpoint
        # has params.textual where a downstream template has params.fc) —
        # restore what matches, keep the template's init elsewhere, like
        # the reference's partial load.
        if isinstance(tmpl, dict):
            if not isinstance(ckpt, dict):
                missing.append(prefix or "<root>")
                return tmpl
            return {k: merge(v, ckpt.get(k, _MISSING),
                             f"{prefix}.{k}" if prefix else k)
                    for k, v in tmpl.items()}
        if ckpt is _MISSING:
            missing.append(prefix)
            return tmpl
        if not hasattr(tmpl, "dtype"):
            return ckpt
        arr = jnp.asarray(ckpt)
        if (hasattr(tmpl, "shape") and hasattr(arr, "shape")
                and tuple(tmpl.shape) != tuple(arr.shape)):
            # A silently accepted shape mismatch only surfaces later as a
            # confusing model.apply error — treat like a missing leaf and
            # keep the template's init.
            missing.append(f"{prefix} (shape {tuple(arr.shape)} != "
                           f"template {tuple(tmpl.shape)})")
            return tmpl
        return arr.astype(tmpl.dtype)

    out = {key: merge(dict(template[key]), state.get(key, _MISSING), key)
           for key in template}
    if missing:
        logging.getLogger("virtex_tpu").info(
            f"Partial restore from {path}: kept init for "
            f"{len(missing)} template keys not in checkpoint "
            f"(e.g. {missing[:3]})")
    return out


def apply_backbone_weight_init(variables: Dict[str, Any], weight_init: str,
                               checkpoint_path: Optional[str],
                               arch: str) -> Dict[str, Any]:
    """Initialise the ``visual`` backbone subtree of downstream-model
    variables per the reference's four ``--weight-init`` modes
    (``clf_linear.py:130-142``, ``clf_voc07.py`` shares the flag):

    - ``virtex``: partial-restore ``params/batch_stats.visual`` from one of
      our pretraining checkpoints at ``checkpoint_path``;
    - ``torchvision``: convert a torch training-script ``.pth`` from
      ``checkpoint_path`` into the flax tree;
    - ``imagenet``: torchvision model-zoo weights for ``arch``;
    - ``random``: leave the fresh init in place.

    Mutates and returns ``variables``.
    """
    import logging
    logger = logging.getLogger("virtex_tpu")
    if weight_init == "virtex" and checkpoint_path:
        template = {"params": variables["params"],
                    "batch_stats": variables["batch_stats"]}
        full = load_model_variables(checkpoint_path, template)
        variables["params"]["visual"] = full["params"]["visual"]
        variables["batch_stats"]["visual"] = full["batch_stats"]["visual"]
        logger.info(f"Loaded visual backbone from {checkpoint_path}")
    elif weight_init == "torchvision" and checkpoint_path:
        from virtex_tpu.utils.checkpoint_convert import (
            convert_resnet,
            load_torch_checkpoint,
        )
        params, stats = convert_resnet(load_torch_checkpoint(checkpoint_path))
        variables["params"]["visual"]["cnn"] = params
        variables["batch_stats"]["visual"]["cnn"] = stats
        logger.info(f"Converted torch backbone from {checkpoint_path}")
    elif weight_init == "imagenet":
        import torchvision

        from virtex_tpu.utils.checkpoint_convert import convert_resnet
        tv_model = getattr(torchvision.models, arch)(pretrained=True)
        params, stats = convert_resnet(
            {k: v.numpy() for k, v in tv_model.state_dict().items()})
        variables["params"]["visual"]["cnn"] = params
        variables["batch_stats"]["visual"]["cnn"] = stats
        logger.info(f"Loaded imagenet {arch} weights from torchvision")
    elif weight_init != "random":
        logger.warning(f"weight-init {weight_init}: no checkpoint given, "
                       "keeping random init")
    return variables


def load_checkpoint(path: str, state_template: Any) -> Tuple[Any, int]:
    """Convenience one-shot restore (model zoo / downstream init path)."""
    path = os.path.abspath(path)
    reader = ocp.StandardCheckpointer()
    target = {"state": state_template, "iteration": np.asarray(0, np.int32)}
    saved = _saved_optional_keys(reader, path)
    if "loader" in saved:
        target["loader"] = {"items_consumed": np.asarray(0, np.int64)}
    if "best_metric" in saved:
        target["best_metric"] = np.asarray(np.nan, np.float64)
    if "best_iteration" in saved:
        target["best_iteration"] = np.asarray(-1, np.int32)
    tree = reader.restore(path, target=target)
    return tree["state"], int(tree["iteration"])
