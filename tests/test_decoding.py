"""Decoder tests: beam search vs brute-force enumeration on a toy Markov
step function (same scoring semantics), EOS latching, repetition penalty;
nucleus sampling top-p behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virtex_tpu.utils.beam_search import (
    REPETITION_PENALTY,
    AutoRegressiveBeamSearch,
)
from virtex_tpu.utils.nucleus_sampling import AutoRegressiveNucleusSampling

V, EOS = 4, 2


def markov_step_fn(table):
    """logprobs depend only on the previous token: lp = table[last]."""
    t_dev = jnp.asarray(table)

    def step(last_tokens, position, state):
        return t_dev[last_tokens], state
    return step


def brute_force_best(table, start, max_steps):
    """Enumerate all sequences applying the SAME semantics: repetition
    penalty on the previous token, EOS-absorbing states."""
    import itertools
    best_score, best_seq = -np.inf, None
    for seq in itertools.product(range(V), repeat=max_steps):
        score, last = 0.0, start
        for t, tok in enumerate(seq):
            finished = (last == EOS) and t > 0
            if finished:
                lp = 0.0 if tok == EOS else -1e18
            else:
                lp = table[last][tok]
                if tok == last:
                    lp += REPETITION_PENALTY
            score += lp
            last = tok
        if score > best_score:
            best_score, best_seq = score, seq
    return np.asarray(best_seq), best_score


@pytest.mark.parametrize("suppress_eos", [False, True])
def test_beam_search_finds_optimum(suppress_eos):
    rng = np.random.RandomState(0)
    logits = rng.randn(V, V).astype(np.float32)
    if suppress_eos:
        logits[:, EOS] -= 10.0  # force a genuine 3-token optimum
    table = np.log(np.exp(logits) /
                   np.exp(logits).sum(-1, keepdims=True))
    start = np.array([1, 3], np.int32)

    # K = V^(t-1) guarantees full prefix coverage → exact search.
    bs = AutoRegressiveBeamSearch(eos_index=EOS, max_steps=3, beam_size=16,
                                  per_node_beam_size=4)
    preds, scores = jax.jit(
        lambda s: bs.search(s, markov_step_fn(table), state={})
    )(jnp.asarray(start))
    for b in range(2):
        expect, expect_score = brute_force_best(table, start[b], 3)
        np.testing.assert_array_equal(np.asarray(preds[b]), expect)
        np.testing.assert_allclose(float(scores[b]), expect_score, rtol=1e-5)


def test_beam_search_eos_latching():
    # EOS is overwhelmingly likely from every state → all beams end fast and
    # stay EOS; search early-stops via the while condition.
    table = np.full((V, V), -10.0, np.float32)
    table[:, EOS] = 0.0
    bs = AutoRegressiveBeamSearch(eos_index=EOS, max_steps=6, beam_size=3)
    preds, _ = bs.search(jnp.asarray([0]), markov_step_fn(table), state={})
    assert (np.asarray(preds) == EOS).all()


def test_beam_search_repetition_penalty():
    # Token 1 always best; penalty forces alternation.
    table = np.zeros((V, V), np.float32)
    table[:, 1] = 5.0
    table[:, 3] = 4.0
    table[:, EOS] = -20.0
    bs = AutoRegressiveBeamSearch(eos_index=EOS, max_steps=4, beam_size=2)
    preds, _ = bs.search(jnp.asarray([0]), markov_step_fn(table), state={})
    seq = list(np.asarray(preds)[0])
    assert seq == [1, 3, 1, 3]


def test_beam_search_reorders_state():
    """Per-beam state (the KV-cache stand-in) must follow its beam through
    re-ranking. The step fn is a SECOND-order Markov model: logprobs come
    from ``table2[state.prev, last]`` where ``state.prev`` is the token the
    step fn itself recorded one call earlier — i.e. the beam's true
    grandparent token ONLY IF the search gathers state along with beams.
    The table forces a re-rank (the step-0 runner-up owns the winning
    continuation), and the final step's logprobs depend on the re-ranked
    beam's own history: a broken gather hands the winner another beam's
    ``prev`` (row T2[1,0] instead of T2[3,0]) and emits token 3 instead of
    1."""
    T2 = np.zeros((V, V, V), np.float32)
    T2[:, :, EOS] = -20.0
    T2[0, 0, 1] = 3.0   # step 0 (prev=start): beam0 picks 1 ...
    T2[0, 0, 3] = 2.9   #                      ... beam1 picks 3
    T2[0, 3, 0] = 5.0   # runner-up's continuation wins → re-rank to [3, 0]
    T2[3, 0, 1] = 4.0   # correct history (prev=3, last=0) → emit 1
    T2[1, 0, 3] = 4.0   # the OTHER beam's history would emit 3 instead

    def second_order_step(last_tokens, position, state):
        prev = state["prev"].astype(jnp.int32)
        logp = jnp.asarray(T2)[prev, last_tokens]
        return logp, {"prev": last_tokens.astype(jnp.float32)}

    bs = AutoRegressiveBeamSearch(eos_index=EOS, max_steps=3, beam_size=2)
    preds, scores = bs.search(jnp.asarray([0]), second_order_step,
                              state={"prev": jnp.zeros((2,), jnp.float32)})
    assert list(np.asarray(preds)[0]) == [3, 0, 1]
    np.testing.assert_allclose(float(scores[0]), 2.9 + 5.0 + 4.0, rtol=1e-6)


def test_nucleus_small_p_is_greedy():
    logits = np.full((1, V), -5.0, np.float32)
    logits[0, 3] = 5.0

    def step(last, position, state):
        # strongly peaked at 3, but 3 was just emitted → repetition guard
        # pushes to next best, which alternates.
        l = jnp.asarray(np.tile(logits, (last.shape[0], 1)))
        return l, state

    ns = AutoRegressiveNucleusSampling(eos_index=EOS, max_steps=4,
                                       nucleus_size=1e-4)
    preds, _ = ns.search(jnp.asarray([0]), step, {}, jax.random.PRNGKey(0))
    seq = list(np.asarray(preds)[0])
    assert seq[0] == 3
    assert seq[1] != 3  # repetition guard
    assert seq[2] == 3


def test_nucleus_eos_latch():
    logits = np.full((1, V), -10.0, np.float32)
    logits[0, EOS] = 10.0

    def step(last, position, state):
        return jnp.asarray(np.tile(logits, (last.shape[0], 1))), state

    ns = AutoRegressiveNucleusSampling(eos_index=EOS, max_steps=5)
    preds, _ = ns.search(jnp.asarray([1]), step, {}, jax.random.PRNGKey(1))
    assert (np.asarray(preds) == EOS).all()


def test_nucleus_respects_top_p_mass():
    # distribution: p = [0.5, 0.3, ~0, 0.2-eps]; p=0.5 nucleus → only token 0
    probs = np.array([0.5, 0.3, 1e-6, 0.2 - 1e-6], np.float64)
    logits = np.log(probs)[None].astype(np.float32)

    def step(last, position, state):
        return jnp.asarray(np.tile(logits, (last.shape[0], 1))), state

    ns = AutoRegressiveNucleusSampling(eos_index=EOS, max_steps=1,
                                       nucleus_size=0.4)
    draws = set()
    for i in range(20):
        preds, _ = ns.search(jnp.asarray([1]), step, {},
                             jax.random.PRNGKey(i))
        draws.add(int(np.asarray(preds)[0, 0]))
    assert draws == {0}


def test_topk_small_matches_lax_top_k():
    """_topk_small is the TPU fast path for the in-loop per-node top-P
    (XLA lowers lax.top_k to a full vocab sort); it must match lax.top_k
    bit-exactly, including stable tie ordering and NEG_INF-flooded rows."""
    from virtex_tpu.utils.beam_search import NEG_INF, _topk_small

    rng = np.random.RandomState(0)
    for k in (1, 2, 5, 8):
        for shape in ((7, 4, 100), (3, 1000), (64,)):
            x = rng.randn(*shape).astype(np.float32)
            # inject exact ties and NEG_INF floods
            flat = x.reshape(-1, shape[-1])
            flat[..., 10:20] = flat[..., 0:1]          # repeated max ties
            flat[0, :] = NEG_INF                        # all-flooded row
            if flat.shape[0] > 1:
                flat[1, 5:] = NEG_INF                   # partial flood
            ref_v, ref_i = jax.lax.top_k(jnp.asarray(x), k)
            got_v, got_i = _topk_small(jnp.asarray(x), k)
            np.testing.assert_array_equal(np.asarray(ref_i),
                                          np.asarray(got_i))
            np.testing.assert_array_equal(np.asarray(ref_v),
                                          np.asarray(got_v))


def test_topk_small_true_inf_rows():
    """True ±inf inputs (e.g. a vocab mask via log(0)): selection runs on
    the uint32 key view, so a -inf winner still retires its index and the
    returned indices stay distinct (float -inf masking would re-pick index
    0 forever)."""
    from virtex_tpu.utils.beam_search import _topk_small

    rows = np.stack([
        np.concatenate([[-np.inf, -np.inf, 5.0], np.full(61, -np.inf)]),
        np.full(64, -np.inf),
        np.concatenate([[np.inf, 3.0, np.inf], np.zeros(61)]),
        np.concatenate([[-0.0, 0.0, -1.0], np.full(61, -np.inf)]),
    ]).astype(np.float32)
    for k in (1, 2, 4, 6):
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(rows), k)
        got_v, got_i = _topk_small(jnp.asarray(rows), k)
        np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))
        np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
        for b in range(rows.shape[0]):  # and indices must be distinct
            assert len(set(np.asarray(got_i)[b].tolist())) == k


def test_beam_search_unaffected_by_topk_threshold(monkeypatch):
    """Beam results are identical whichever top-k path is taken (a vocab
    large enough that the iterative path actually engages)."""
    import virtex_tpu.utils.beam_search as bs

    big_v = 64
    rng = np.random.RandomState(7)
    logits = rng.randn(big_v, big_v).astype(np.float32)
    table = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))

    def run():
        beam = AutoRegressiveBeamSearch(eos_index=EOS, max_steps=6,
                                        beam_size=5, per_node_beam_size=2)
        start = jnp.zeros((3,), jnp.int32)
        return beam.search(start, markov_step_fn(table), state={},
                           only_return_best=False)

    fast_p, fast_s = run()
    monkeypatch.setattr(bs, "_ITERATIVE_TOPK_MAX_K", 0)  # force lax.top_k
    slow_p, slow_s = run()
    np.testing.assert_array_equal(np.asarray(fast_p), np.asarray(slow_p))
    np.testing.assert_array_equal(np.asarray(fast_s), np.asarray(slow_s))


@pytest.mark.parametrize("max_steps", [6, 7])
def test_beam_search_unroll_bitwise(max_steps):
    """`unroll` is a pure scheduling knob: sequences AND scores must be
    bitwise identical at every factor, including factors that don't divide
    the step count (tail guard), factors larger than the whole loop, and
    per-beam state reordering inside an unrolled iteration."""
    rng = np.random.RandomState(3)
    logits = rng.randn(V, V).astype(np.float32)
    logits[:, EOS] -= 6.0  # EOS reachable but not immediate
    table = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))

    def run(unroll):
        bs = AutoRegressiveBeamSearch(eos_index=EOS, max_steps=max_steps,
                                      beam_size=3, per_node_beam_size=2,
                                      unroll=unroll)
        start = jnp.asarray([1, 3, 0], jnp.int32)
        # state reorder must survive unrolling: carry a per-beam token so a
        # wrong gather inside a sub-step changes the emitted sequence.
        def step(last, position, state):
            lp = jnp.asarray(table)[last]
            bonus = 0.1 * (state["prev"] == last).astype(jnp.float32)
            return lp + bonus[:, None], {"prev": last}
        state = {"prev": jnp.zeros((9,), jnp.int32)}
        return bs.search(start, step, state, only_return_best=False)

    ref_p, ref_s = run(1)
    for unroll in (2, 3, max_steps, max_steps + 2):
        got_p, got_s = run(unroll)
        np.testing.assert_array_equal(np.asarray(ref_p), np.asarray(got_p))
        np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(got_s))


def test_beam_search_unroll_early_eos_bitwise():
    """All beams latch EOS mid-iteration: the masked sub-step must be an
    identity on (last, scores, preds) — unroll=1's early loop exit and
    unroll=4's extra sub-steps land on identical outputs."""
    table = np.full((V, V), -10.0, np.float32)
    table[:, EOS] = 0.0

    def run(unroll):
        bs = AutoRegressiveBeamSearch(eos_index=EOS, max_steps=6,
                                      beam_size=3, unroll=unroll)
        return bs.search(jnp.asarray([0, 1]), markov_step_fn(table),
                         state={}, only_return_best=False)

    ref_p, ref_s = run(1)
    for unroll in (2, 4):
        got_p, got_s = run(unroll)
        np.testing.assert_array_equal(np.asarray(ref_p), np.asarray(got_p))
        np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(got_s))


@pytest.mark.parametrize("max_steps", [5, 6])
def test_nucleus_unroll_bitwise(max_steps):
    """Nucleus sampling with `unroll` must reproduce unroll=1 bitwise for
    the same PRNGKey: the rng split schedule is per-sub-step, and masked
    tail sub-steps must not disturb emitted predictions."""
    rng = np.random.RandomState(5)
    logits = rng.randn(V, V).astype(np.float32)

    def step(last, position, state):
        return jnp.asarray(logits)[last], state

    def run(unroll):
        ns = AutoRegressiveNucleusSampling(eos_index=EOS,
                                           max_steps=max_steps,
                                           nucleus_size=0.9, unroll=unroll)
        preds, _ = ns.search(jnp.asarray([1, 3]), step, {},
                             jax.random.PRNGKey(11))
        return np.asarray(preds)

    ref = run(1)
    for unroll in (2, 3, max_steps + 1):
        np.testing.assert_array_equal(ref, run(unroll))


def test_nucleus_unroll_early_eos_bitwise():
    logits = np.full((1, V), -10.0, np.float32)
    logits[0, EOS] = 10.0

    def step(last, position, state):
        return jnp.asarray(np.tile(logits, (last.shape[0], 1))), state

    def run(unroll):
        ns = AutoRegressiveNucleusSampling(eos_index=EOS, max_steps=6,
                                           unroll=unroll)
        preds, _ = ns.search(jnp.asarray([1]), step, {},
                             jax.random.PRNGKey(2))
        return np.asarray(preds)

    ref = run(1)
    for unroll in (2, 4):
        np.testing.assert_array_equal(ref, run(unroll))


def test_beam_search_unroll_degenerate_k_gt_v_bitwise():
    """K > V pads beams at exact NEG_INF, where the all-EOS identity of
    masked sub-steps rests on a subtle tie-order chain (a pad's EOS
    extension ties bitwise against finished beams' junk candidates at
    NEG_INF; stable top_k resolves by flat index). The guard now mirrors
    the loop cond, making unroll-invariance structural — this pins the
    analyzed corner so a future tie-break or padding change that voids
    the chain is caught."""
    table = np.full((V, V), -8.0, np.float32)
    table[:, EOS] = 0.0  # every beam latches EOS immediately

    def run(unroll):
        bs = AutoRegressiveBeamSearch(eos_index=EOS, max_steps=6,
                                      beam_size=V + 2, per_node_beam_size=2,
                                      unroll=unroll)
        return bs.search(jnp.asarray([0, 1]), markov_step_fn(table),
                         state={}, only_return_best=False)

    ref_p, ref_s = run(1)
    assert np.all(np.asarray(ref_p)[:, 0, 1:] == EOS)  # the latch held
    for unroll in (2, 4):
        got_p, got_s = run(unroll)
        np.testing.assert_array_equal(np.asarray(ref_p), np.asarray(got_p))
        np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(got_s))


def test_unroll_validation():
    with pytest.raises(ValueError):
        AutoRegressiveBeamSearch(eos_index=EOS, unroll=0)
    with pytest.raises(ValueError):
        AutoRegressiveNucleusSampling(eos_index=EOS, unroll=0)


def _sorted_rule_drop(logits, p):
    """The reference top-p rule, straight transcription: sort desc (stable,
    index tie-break), cumulative softmax, drop where (cum - probs) > p,
    keep rank 0 — in float64 so the oracle has no rounding ambiguity."""
    logits = np.asarray(logits, np.float64)
    drop = np.zeros(logits.shape, bool)
    for b in range(logits.shape[0]):
        order = np.argsort(-logits[b], kind="stable")
        s = logits[b][order]
        probs = np.exp(s - s.max())
        probs /= probs.sum()
        cum = np.cumsum(probs)
        d = (cum - probs) > p
        d[0] = False
        drop[b][order] = d
    return drop


@pytest.mark.parametrize("p", [1e-4, 0.3, 0.9, 0.999])
def test_topp_drop_matches_sorted_rule(p):
    """`_topp_drop` (bisection on the uint32 key view, no vocab sort) must
    select the same nucleus as the sorted-cumsum rule: random logits,
    flat rows, peaked rows, exact ties (incl. at the boundary), ±0.0,
    NEG_INF floods."""
    from virtex_tpu.utils.nucleus_sampling import NEG_INF, _topp_drop

    rng = np.random.RandomState(0)
    rows = [
        rng.randn(41).astype(np.float32) * 3,           # generic
        np.zeros(41, np.float32),                       # fully flat
        np.full(41, -7.5, np.float32),                  # flat, nonzero
        rng.randn(41).astype(np.float32) * 20,          # peaked
        np.repeat(rng.randn(8).astype(np.float32), 6)[:41],  # many ties
        np.concatenate([[0.0, -0.0] * 10,
                        rng.randn(21).astype(np.float32)]).astype(np.float32),
        np.full(41, NEG_INF, np.float32),               # flood
        np.concatenate([[5.0], np.full(40, NEG_INF)]).astype(np.float32),
    ]
    logits = np.stack(rows)
    got = np.asarray(jax.jit(lambda l: _topp_drop(l, p))(jnp.asarray(logits)))
    want = _sorted_rule_drop(logits, p)
    np.testing.assert_array_equal(got, want)


def test_topp_drop_matches_sorted_rule_fuzz():
    """1000 random rows, several scales, float32 boundary roundings: the
    kept set may legally differ from the float64 oracle only where a
    token's mass-before lands within float32 noise of p — check exact
    equality modulo that one-token boundary tolerance."""
    from virtex_tpu.utils.nucleus_sampling import _topp_drop

    rng = np.random.RandomState(1)
    p = 0.9
    logits = (rng.randn(1000, 67) * rng.choice([0.3, 1.0, 5.0], (1000, 1))
              ).astype(np.float32)
    got = np.asarray(jax.jit(lambda l: _topp_drop(l, p))(jnp.asarray(logits)))
    want = _sorted_rule_drop(logits, p)
    mismatch_rows = np.where((got != want).any(axis=1))[0]
    for b in mismatch_rows:
        diff = np.where(got[b] != want[b])[0]
        # At most the single boundary token, and only when its float64
        # mass-before is within 1e-5 of p.
        assert len(diff) == 1, (b, diff)
        l = logits[b].astype(np.float64)
        order = np.argsort(-l, kind="stable")
        probs = np.exp(l[order] - l[order].max())
        probs /= probs.sum()
        cum_before = np.cumsum(probs) - probs
        rank = int(np.where(order == diff[0])[0][0])
        assert abs(cum_before[rank] - p) < 1e-5, (b, cum_before[rank])
