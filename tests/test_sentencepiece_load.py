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


def test_sp_pickle_roundtrip(tmp_path):
    import pickle
    path = str(tmp_path / "toy_sp.model")
    build_sp_model(path)
    tok = SentencePieceBPETokenizer(path)
    tok2 = pickle.loads(pickle.dumps(tok))
    assert tok2.encode("cats") == tok.encode("cats")
