r"""
Mesh context for Pallas kernels.

``pl.pallas_call`` has no SPMD partitioning rules: under a multi-device
``jit`` the partitioner treats it as an opaque custom call — either the
operands get gathered/replicated (slow) or, in some lowering paths, the
kernel silently runs per-shard (WRONG for BN's cross-batch reductions;
measured on an 8-device CPU mesh: per-shard statistics gradients, 93% of
dx elements off). The TPU-native fix is explicit ``shard_map`` around each
kernel with the real activation layout (batch on 'data', heads on
'model') and a psum where the math reduces across shards.

The kernels can't see the mesh at trace time on their own, so the engine
publishes it here: :func:`kernel_mesh` wraps every compiled-step call
(train / eval / caption), and the ops consult :func:`active_mesh` when
tracing. Single-device meshes short-circuit to the plain kernel call.
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

_ACTIVE: contextvars.ContextVar = contextvars.ContextVar(
    "virtex_tpu_kernel_mesh", default=None)


@contextlib.contextmanager
def kernel_mesh(mesh):
    """Publish ``mesh`` for kernel tracing within the block (None = off)."""
    token = _ACTIVE.set(mesh)
    try:
        yield
    finally:
        _ACTIVE.reset(token)


def active_mesh() -> Optional[object]:
    """The mesh published by the enclosing engine call, if any."""
    return _ACTIVE.get()


def mesh_axes() -> tuple:
    """(data, model) sizes of the active mesh; (1, 1) when none."""
    mesh = active_mesh()
    if mesh is None:
        return 1, 1
    return mesh.shape.get("data", 1), mesh.shape.get("model", 1)


def wrap_step_fn(fn, mesh):
    """Make ``fn``'s (lazy jit) traces see ``mesh`` via the context."""
    if mesh is None:
        return fn

    def wrapped(*args, **kwargs):
        with kernel_mesh(mesh):
            return fn(*args, **kwargs)

    return wrapped
