r"""
Optimizer stack as composable optax transforms.

Parity target: the reference builds torch param groups — weight decay zeroed
for params matching ``OPTIM.NO_DECAY``, LR = ``CNN_LR`` for any param whose
name contains ``"cnn"`` else ``LR`` (``virtex/factories.py:529-533``) — then
sgd(momentum)/adamw, optionally wrapped in Lookahead
(``virtex/optim/lookahead.py:25-129``), stepped by a LambdaLR schedule, with
``clip_grad_norm(10.0)`` applied manually each iteration
(``scripts/pretrain_virtex.py:157-162``).

Here the whole stack is one :class:`optax.GradientTransformation` chain:

    clip_by_global_norm → (decay-masked) sgd/adamw → per-group LR ×
    schedule(step) → lookahead

so the jitted train step is ``updates, state = tx.update(grads, state,
params)`` — no Python-side scheduler or param-group objects. Lookahead is a
final-position transform that keeps the *slow* weights in its own state and
rewrites the emitted updates every ``k`` steps, so ``params`` stays a plain
pytree (no fast/slow wrapper as in ``optax.lookahead``).
"""
from __future__ import annotations

import re
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from virtex_tpu.optim.lr_schedules import Schedule


def param_path_names(params) -> Any:
    """Pytree of dotted path names, e.g. ``textual.transformer.layer_0.
    self_attn.query.bias`` (lowercase, mirroring torch naming for the
    NO_DECAY regex contract)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = [
        ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for path, _ in flat
    ]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, paths)


def decay_mask(params, no_decay_pattern: str):
    """True where weight decay applies (params NOT matching the pattern)."""
    names = param_path_names(params)
    return jax.tree.map(
        lambda n: re.match(no_decay_pattern, n) is None, names)


def cnn_mask(params):
    """True for visual-backbone params (name contains 'cnn',
    reference factories.py:531)."""
    names = param_path_names(params)
    return jax.tree.map(lambda n: "cnn" in n, names)


class ScaleByLrState(NamedTuple):
    step: jnp.ndarray


def scale_by_dual_lr(schedule: Schedule, lr: float, cnn_lr: float,
                     params_template) -> optax.GradientTransformation:
    """Scale updates by −base_lr(param-group) × schedule(step)."""
    is_cnn = cnn_mask(params_template)

    def init_fn(params):
        return ScaleByLrState(step=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        mult = schedule(state.step)
        updates = jax.tree.map(
            lambda u, c: u * (-(cnn_lr if c else lr) * mult),
            updates, is_cnn)
        return updates, ScaleByLrState(step=state.step + 1)

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    slow: Any
    step: jnp.ndarray


def lookahead(k: int = 5, alpha: float = 0.5) -> optax.GradientTransformation:
    """Final-position lookahead (reference ``lookahead.py:82-102``).

    Every ``k`` fast steps the emitted update lands the params on
    ``slow + alpha · (fast_next − slow)`` and the slow copy is refreshed.
    Keeping it last in the chain means `optax.apply_updates(params, updates)`
    yields exactly the reference's synchronised weights.
    """

    def init_fn(params):
        return LookaheadState(slow=jax.tree.map(jnp.asarray, params),
                              step=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("lookahead requires params")
        step = state.step + 1
        sync = (step % k) == 0

        def target(u, p, s):
            return s + alpha * ((p + u) - s)

        new_updates = jax.tree.map(
            lambda u, p, s: jnp.where(sync, target(u, p, s) - p, u),
            updates, params, state.slow)
        new_slow = jax.tree.map(
            lambda u, p, s: jnp.where(sync, target(u, p, s), s),
            updates, params, state.slow)
        return new_updates, LookaheadState(slow=new_slow, step=step)

    return optax.GradientTransformation(init_fn, update_fn)


def lookahead_slow_params(opt_state, fallback_params=None):
    """Extract the lookahead *slow* weights from an optimizer state
    (reference ``lookahead.py:104-129`` evaluates downstream transfers on
    slow weights). Returns ``fallback_params`` when the chain has no
    lookahead transform."""
    states = opt_state if isinstance(opt_state, (tuple, list)) else [opt_state]
    for s in states:
        if isinstance(s, LookaheadState):
            return s.slow
    return fallback_params


def build_optimizer(
    params_template,
    optimizer_name: str = "sgd",
    schedule: Optional[Schedule] = None,
    lr: float = 0.001,
    cnn_lr: float = 0.2,
    weight_decay: float = 1e-4,
    no_decay_pattern: str = r".*textual.(embedding|transformer).*(norm.*|bias)",
    momentum: float = 0.9,
    clip_norm: float = 10.0,
    use_lookahead: bool = True,
    lookahead_k: int = 5,
    lookahead_alpha: float = 0.5,
    frozen_pattern: Optional[str] = None,
) -> optax.GradientTransformation:
    """Assemble the full reference-equivalent optimizer chain.

    ``frozen_pattern``: params whose path matches get ZERO updates — the
    reference's ``requires_grad=False`` (torch SGD skips None-grad params
    entirely). stop_gradient alone is NOT enough: add_decayed_weights
    would still shrink the frozen weights every step.
    """
    schedule = schedule or (lambda step: jnp.ones([], jnp.float32))
    mask = decay_mask(params_template, no_decay_pattern)

    chain = [optax.clip_by_global_norm(clip_norm)]
    if optimizer_name == "sgd":
        # torch SGD couples weight decay into the gradient BEFORE momentum.
        chain.append(optax.masked(
            optax.add_decayed_weights(weight_decay), mask))
        chain.append(optax.trace(decay=momentum, nesterov=False))
    elif optimizer_name == "adamw":
        chain.append(optax.scale_by_adam())
        # AdamW decay is decoupled: applied after the adaptive scaling.
        chain.append(optax.masked(
            optax.add_decayed_weights(weight_decay), mask))
    else:
        raise ValueError(f"Unknown optimizer {optimizer_name!r}")
    chain.append(scale_by_dual_lr(schedule, lr, cnn_lr, params_template))
    if frozen_pattern:
        names = param_path_names(params_template)
        frozen = jax.tree.map(
            lambda n: re.search(frozen_pattern, n) is not None, names)
        chain.append(optax.masked(optax.set_to_zero(), frozen))
    if use_lookahead:
        chain.append(lookahead(lookahead_k, lookahead_alpha))
    return optax.chain(*chain)
