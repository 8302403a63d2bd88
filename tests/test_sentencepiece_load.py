"""Loading reference-style binary SentencePiece .model vocabularies without
the sentencepiece runtime: build a synthetic SP BPE ModelProto and require
correct greedy-merge tokenization + round-trip decode."""
import numpy as np
import pytest

try:
    from transformers.utils import sentencepiece_model_pb2_new as spb
except Exception:
    spb = None

from virtex_tpu.data.tokenizers import SentencePieceBPETokenizer

pytestmark = pytest.mark.skipif(spb is None,
                                reason="sentencepiece proto schema missing")


def build_sp_model(path):
    """Tiny SP-BPE model: specials, single chars, then merges in creation
    order (the SP piece table is ordered: merged pieces come after their
    parts)."""
    m = spb.ModelProto()
    m.trainer_spec.model_type = 2  # BPE
    pieces = (
        [("<unk>", 0.0, 2), ("[SOS]", 0.0, 3), ("[EOS]", 0.0, 3),
         ("[MASK]", 0.0, 3)]
        # singles (type 1 = NORMAL)
        + [(c, -float(i), 1) for i, c in enumerate(
            ["▁", "a", "c", "t", "s", "▁a"])]
        # merges: "at", "cat", "▁cat", "▁cats"
        + [("at", -10.0, 1), ("cat", -11.0, 1), ("▁cat", -12.0, 1),
           ("▁cats", -13.0, 1)]
    )
    for piece, score, ptype in pieces:
        sp = m.pieces.add()
        sp.piece = piece
        sp.score = score
        sp.type = ptype
    with open(path, "wb") as f:
        f.write(m.SerializeToString())
    return {p: i for i, (p, _, _) in enumerate(pieces)}


def test_sp_bpe_model_loads_and_merges(tmp_path):
    path = str(tmp_path / "toy_sp.model")
    vocab = build_sp_model(path)
    tok = SentencePieceBPETokenizer(path)
    assert tok.get_vocab_size() == len(vocab)
    assert tok.token_to_id("<unk>") == 0
    assert tok.token_to_id("[SOS]") == 1

    # "cats" → ▁cats via chained merges; "cat" → ▁cat
    ids = tok.encode("cats")
    assert ids == [vocab["▁cats"]]
    ids2 = tok.encode("cat")
    assert ids2 == [vocab["▁cat"]]
    # unknown char falls back to <unk>
    ids3 = tok.encode("z")
    assert 0 in ids3

    # round-trip decode strips the metaspace marker
    assert tok.decode([vocab["▁cats"]]) == "cats"


def _write_proto(path, pieces, model_type=2, byte_fallback=False):
    m = spb.ModelProto()
    m.trainer_spec.model_type = model_type
    m.trainer_spec.byte_fallback = byte_fallback
    for piece, score, ptype in pieces:
        sp = m.pieces.add()
        sp.piece = piece
        sp.score = score
        sp.type = ptype
    with open(path, "wb") as f:
        f.write(m.SerializeToString())
    return {p: i for i, (p, _, _) in enumerate(pieces)}


SPECIALS = [("<unk>", 0.0, 2), ("[SOS]", 0.0, 3), ("[EOS]", 0.0, 3),
            ("[MASK]", 0.0, 3)]


def test_sp_merge_order_from_scores_not_ids(tmp_path):
    """Adversarial: piece-id order ≠ merge order. SP stores merge rank in
    the scores — "bc" (later id, score -1) merged BEFORE "ab" (earlier id,
    score -2). Greedy BPE on "abc" must yield [▁, a, bc]; the old id-ranked
    reconstruction produced [▁, ab, c]."""
    path = str(tmp_path / "adversarial.model")
    pieces = (SPECIALS
              + [("▁", -0.5, 1), ("a", -0.1, 1), ("b", -0.2, 1),
                 ("c", -0.3, 1)]
              + [("ab", -2.0, 1),    # id 8 — merged SECOND
                 ("bc", -1.0, 1)])   # id 9 — merged FIRST
    vocab = _write_proto(path, pieces)
    tok = SentencePieceBPETokenizer(path)
    assert tok.encode("abc") == [vocab["▁"], vocab["a"], vocab["bc"]]


def test_sp_control_pieces_never_merge(tmp_path):
    """A CONTROL-typed composite piece whose halves exist must not create a
    merge: 'as' as type-3 control stays unreachable by BPE."""
    path = str(tmp_path / "control.model")
    pieces = (SPECIALS
              + [("▁", 0.0, 1), ("a", -0.1, 1), ("s", -0.2, 1)]
              + [("as", -1.0, 3)])   # control — not a merge product
    vocab = _write_proto(path, pieces)
    tok = SentencePieceBPETokenizer(path)
    assert tok.encode("as") == [vocab["▁"], vocab["a"], vocab["s"]]


def test_sp_byte_fallback(tmp_path):
    """byte_fallback protos map unknown characters to <0xNN> byte pieces
    instead of <unk>."""
    path = str(tmp_path / "bytefb.model")
    pieces = (SPECIALS
              + [("▁", 0.0, 1), ("a", -0.1, 1)]
              + [("<0x7A>", 0.0, 6)])  # 'z' — type 6 = BYTE
    vocab = _write_proto(path, pieces, byte_fallback=True)
    tok = SentencePieceBPETokenizer(path)
    ids = tok.encode("az")
    assert vocab["<0x7A>"] in ids
    assert 0 not in ids


def test_sp_unigram_scored(tmp_path):
    """Unigram protos segment by maximum total score: with score('▁ab') >
    score('▁a')+score('b'), 'ab' must encode to the single piece."""
    path = str(tmp_path / "unigram.model")
    pieces = (SPECIALS
              + [("▁", -10.0, 1), ("▁a", -3.0, 1), ("a", -4.0, 1),
                 ("b", -4.0, 1), ("▁ab", -5.0, 1)])
    vocab = _write_proto(path, pieces, model_type=1)
    tok = SentencePieceBPETokenizer(path)
    assert tok.encode("ab") == [vocab["▁ab"]]


def test_sp_unigram_byte_fallback(tmp_path):
    """byte_fallback must carry over for Unigram models too: OOV chars
    encode to <0xNN> byte pieces, never <unk> (id 0, which doubles as
    padding)."""
    path = str(tmp_path / "unigram_bytefb.model")
    pieces = (SPECIALS
              + [("▁", -1.0, 1), ("a", -2.0, 1)]
              + [("<0x7A>", -20.0, 6)])  # 'z' — type 6 = BYTE
    vocab = _write_proto(path, pieces, model_type=1, byte_fallback=True)
    tok = SentencePieceBPETokenizer(path)
    ids = tok.encode("az")
    assert vocab["<0x7A>"] in ids
    assert 0 not in ids


def test_sp_uniform_scores_fall_back_to_id_order(tmp_path):
    """Degenerate proto (all scores equal — no order information): the
    importer falls back to piece-id ranking and still produces a working
    tokenizer."""
    path = str(tmp_path / "uniform.model")
    pieces = (SPECIALS
              + [("▁", 0.0, 1), ("a", 0.0, 1), ("b", 0.0, 1),
                 ("ab", 0.0, 1)])
    vocab = _write_proto(path, pieces)
    tok = SentencePieceBPETokenizer(path)
    assert tok.encode("ab") == [vocab["▁"], vocab["ab"]]


def test_sp_pickle_roundtrip(tmp_path):
    import pickle
    path = str(tmp_path / "toy_sp.model")
    build_sp_model(path)
    tok = SentencePieceBPETokenizer(path)
    tok2 = pickle.loads(pickle.dumps(tok))
    assert tok2.encode("cats") == tok.encode("cats")
