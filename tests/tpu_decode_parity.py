r"""
On-TPU decode-selection parity — run directly on a TPU host (the pytest
suite pins the CPU platform, so this is a standalone gate like
``tpu_bn_parity.py``):

    python tests/tpu_decode_parity.py

Both sort-free decode selection paths lean on bit-level float tricks
(``floatkeys.monotone_u32_keys``: bitcast + bitwise ops; the nucleus
bisection: 32 uint32 halvings), which the CPU unit tests exercise only on
the host backend. This gate re-checks them on real hardware against
host-side oracles:

- ``beam_search._topk_small`` (k argmax passes on the key view) vs a
  numpy total-order top-k (lax.top_k semantics: -0.0 < +0.0, stable
  index ties) at the production vocab size;
- ``nucleus_sampling._topp_drop`` (boundary bisection) vs the float64
  sorted-cum-softmax rule, modulo the documented one-boundary-token
  rounding tolerance.

Rows cover random/peaked/flat logits, exact ties, ±0.0, NEG_INF floods
and true -inf.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _np_keys(x: np.ndarray) -> np.ndarray:
    bits = x.astype(np.float32).view(np.uint32)
    return np.where(bits >= 0x80000000, ~bits, bits | np.uint32(0x80000000))


def _oracle_topk(x: np.ndarray, k: int):
    """lax.top_k semantics: descending total order, stable index ties."""
    keys = _np_keys(x)
    order = np.argsort(-keys.astype(np.int64), axis=-1, kind="stable")
    idx = order[..., :k]
    return np.take_along_axis(x, idx, axis=-1), idx


def _oracle_topp_drop(logits: np.ndarray, p: float) -> np.ndarray:
    l64 = logits.astype(np.float64)
    drop = np.zeros(logits.shape, bool)
    for b in range(logits.shape[0]):
        order = np.argsort(-l64[b], kind="stable")
        s = l64[b][order]
        probs = np.exp(s - s.max())
        probs /= probs.sum()
        cum = np.cumsum(probs)
        d = (cum - probs) > p
        d[0] = False
        drop[b][order] = d
    return drop


def _rows(V: int) -> np.ndarray:
    rng = np.random.RandomState(0)
    neg_inf = -1e18
    rows = [
        rng.randn(V).astype(np.float32) * 3,
        rng.randn(V).astype(np.float32) * 20,            # peaked
        np.zeros(V, np.float32),                          # flat
        np.full(V, -7.5, np.float32),
        np.resize(np.repeat(rng.randn(max(V // 6, 1)).astype(np.float32), 6),
                  V),
        np.resize(np.asarray([0.0, -0.0], np.float32), V),
        np.full(V, neg_inf, np.float32),
        np.concatenate([[5.0], np.full(V - 1, neg_inf)]).astype(np.float32),
        np.concatenate([[-np.inf, -np.inf, 5.0],
                        np.full(V - 3, -np.inf)]).astype(np.float32),
        rng.randn(V).astype(np.float32),
    ]
    return np.stack(rows)


def main() -> int:
    allow_cpu = "--allow-cpu" in sys.argv  # harness self-test only
    from virtex_tpu.utils.common import setup_compilation_cache
    setup_compilation_cache()
    import jax

    if allow_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from virtex_tpu.utils.beam_search import _topk_small
    from virtex_tpu.utils.nucleus_sampling import _topp_drop

    if jax.devices()[0].platform != "tpu" and not allow_cpu:
        print("SKIP: no TPU (this gate re-checks the bit-level key tricks "
              "on real hardware)")
        return 0

    failures = 0
    V = 10000
    x = _rows(V)
    xj = jnp.asarray(x)

    # --- top-k (beam fast path) ---
    for k in (1, 2, 5, 8):
        got_v, got_i = jax.jit(lambda a, k=k: _topk_small(a, k))(xj)
        want_v, want_i = _oracle_topk(x, k)
        ok = (np.array_equal(np.asarray(got_i), want_i)
              and np.array_equal(np.asarray(got_v), want_v))
        print(f"topk k={k}: {'OK' if ok else 'FAIL'}")
        failures += 0 if ok else 1

    # --- top-p drop mask (nucleus) ---
    # true -inf rows are exercised by top-k; the softmax oracle needs
    # finite rows (NEG_INF=-1e18 floods are finite and stay in)
    finite = x[~np.isinf(x).any(axis=1)]
    fj = jnp.asarray(finite)
    for p in (1e-4, 0.3, 0.9, 0.999):
        got = np.asarray(jax.jit(lambda a, p=p: _topp_drop(a, p))(fj))
        want = _oracle_topp_drop(finite, p)
        bad = []
        for b in np.where((got != want).any(axis=1))[0]:
            diff = np.where(got[b] != want[b])[0]
            # documented tolerance: one boundary token whose float64
            # mass-before lands within 1e-5 of p
            l = finite[b].astype(np.float64)
            order = np.argsort(-l, kind="stable")
            probs = np.exp(l[order] - l[order].max())
            probs /= probs.sum()
            cum_before = np.cumsum(probs) - probs
            ok_row = len(diff) == 1 and abs(
                cum_before[int(np.where(order == diff[0])[0][0])] - p) < 1e-5
            if not ok_row:
                bad.append(int(b))
        print(f"topp p={p}: {'OK' if not bad else f'FAIL rows {bad}'}")
        failures += 0 if not bad else 1

    print("PASS" if failures == 0 else f"FAIL ({failures})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
