r"""
Device mesh construction and sharding rules.

The reference's only parallelism is DDP — one process per GPU with NCCL
all-reduce (``virtex/utils/distributed.py:15-112``, SURVEY §2c). The
TPU-native equivalent is a named :class:`jax.sharding.Mesh` with two axes:

- ``data``: batch-dimension sharding (the DDP replacement). Gradients are
  reduced by XLA-inserted all-reduces over ICI — no NCCL, no process groups.
- ``model``: optional tensor parallelism for the textual head (H up to 2048,
  FFN up to 8192): attention-head and FFN shards, collectives inserted by
  XLA from the param shardings below. The reference has no model parallelism
  (SURVEY §2c); this axis defaults to 1.

Multi-host: ``jax.distributed.initialize()`` is the caller's job (see
``virtex_tpu.utils.distributed``); here we only lay devices out.
"""
from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: int = -1, model: int = 1,
                devices: Optional[list] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``data=-1`` means "all remaining devices". Uses
    ``jax.experimental.mesh_utils`` device ordering so the model axis maps to
    ICI-adjacent chips (cheap all-reduce for TP collectives).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    try:
        from jax.experimental import mesh_utils
        dev_array = mesh_utils.create_device_mesh((data, model),
                                                  devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, micro: bool = False) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest.

    ``micro=True`` is the gradient-accumulation layout: leaves are
    ``(accum_steps, batch, ...)`` with the micro-step axis replicated and the
    batch axis (dim 1) sharded — every device sees all micro-steps of its own
    batch shard, so the train step's ``lax.scan`` needs no resharding.
    """
    return NamedSharding(mesh, P(None, DATA_AXIS) if micro else P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel sharding rules for the textual head: regex on the dotted
# param path → PartitionSpec. First match wins; default replicated.
# Layout follows the Megatron pattern: QKV/FFN-in column-split (output dim on
# 'model'), attn-out/FFN-out row-split (input dim on 'model') so each block
# needs exactly one psum, inserted by XLA.
_TP_RULES = [
    (r".*(self_attn|cross_attn)\.(query|key|value)\.kernel$", P(None, MODEL_AXIS)),
    (r".*(self_attn|cross_attn)\.(query|key|value)\.bias$", P(MODEL_AXIS)),
    (r".*(self_attn|cross_attn)\.out\.kernel$", P(MODEL_AXIS, None)),
    (r".*ffn\.intermediate\.kernel$", P(None, MODEL_AXIS)),
    (r".*ffn\.intermediate\.bias$", P(MODEL_AXIS)),
    (r".*ffn\.output\.kernel$", P(MODEL_AXIS, None)),
]


def param_sharding(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings for the param tree.

    With ``model=1`` everything degenerates to fully-replicated (pure DP).
    """
    use_tp = mesh.shape[MODEL_AXIS] > 1

    def one(path, leaf):
        name = ".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)
        if use_tp:
            for pattern, spec in _TP_RULES:
                if re.match(pattern, name):
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


def shard_batch(batch: Any, mesh: Mesh, micro: bool = False) -> Any:
    """Lay a host batch out on the mesh with the batch dim sharded over
    'data' (``micro=True``: ``(accum_steps, batch, ...)`` leaves, dim 1
    sharded — see :func:`batch_sharding`).

    Single-host: plain ``device_put``. Multi-host: each host passes its
    LOCAL slice of the global batch and
    ``jax.make_array_from_process_local_data`` assembles the global sharded
    array (the DistributedSampler replacement — each host reads only its
    shard, SURVEY §5.8).
    """
    sharding = batch_sharding(mesh, micro=micro)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
