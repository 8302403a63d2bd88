r"""
BPE tokenizer with a SentencePiece-style interface.

The reference wraps the SentencePiece C++ library
(``virtex/data/tokenizers.py:6-58``); this build produces the same *behavioral
contract* — a 10k BPE vocabulary over lowercased, accent-stripped COCO
captions with special tokens ``<unk>``=0 (doubles as padding), ``[SOS]``=1,
``[EOS]``=2, ``[MASK]``=3 — on top of the HuggingFace ``tokenizers`` Rust
core, using a Metaspace pre-tokenizer for SentencePiece-compatible
whole-word-boundary BPE merges.

The trained model is a single JSON file, loadable from any process (the class
is pickle-safe for data-loader workers, mirroring
``tokenizers.py:23-36``).
"""
from __future__ import annotations

import os
import unicodedata
from typing import Any, Dict, Iterable, List

from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

SPECIAL_TOKENS = ["<unk>", "[SOS]", "[EOS]", "[MASK]"]
UNK_INDEX, SOS_INDEX, EOS_INDEX, MASK_INDEX = 0, 1, 2, 3


class SentencePieceBPETokenizer:
    r"""
    A tokenizer wrapping a BPE model trained by :func:`train_tokenizer`.

    Mirrors the reference API (``virtex/data/tokenizers.py``):
    ``get_vocab_size`` / ``token_to_id`` / ``id_to_token`` / ``encode`` /
    ``decode``. ``decode`` skips special tokens.

    Args:
        model_path: Path to the trained tokenizer JSON file.
    """

    def __init__(self, model_path: str):
        self.model_path = model_path
        self._tok = _load_tokenizer_file(model_path)

    # Pickle safety for multiprocess data loading: serialize only the path.
    def __getstate__(self) -> Dict[str, Any]:
        state = self.__dict__.copy()
        state["_tok"] = None
        return state

    def __setstate__(self, state: Dict[str, Any]) -> None:
        self.__dict__ = state
        self._tok = _load_tokenizer_file(self.model_path)

    def get_vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    def token_to_id(self, token: str) -> int:
        tid = self._tok.token_to_id(token)
        return UNK_INDEX if tid is None else tid

    def id_to_token(self, token_id: int) -> str:
        tok = self._tok.id_to_token(token_id)
        return "<unk>" if tok is None else tok

    def encode(self, text: str) -> List[int]:
        """Convert a (raw) caption into a list of token ids (no SOS/EOS)."""
        text = preprocess_caption(text)
        return self._tok.encode(text, add_special_tokens=False).ids

    def decode(self, token_ids: Iterable[int]) -> str:
        """Convert token ids back into a caption, skipping special tokens.

        Deliberate divergence: SentencePiece's ``DecodeIds`` renders
        ``<unk>`` (id 0) as ``" ⁇ "``; here it is dropped like the other
        specials — id 0 doubles as the padding index
        (``build_vocabulary.py:86-96``) and decoders never emit it, so
        dropping it yields clean captions for padded inputs."""
        ids = [int(t) for t in token_ids if int(t) > MASK_INDEX]
        return self._tok.decode(ids, skip_special_tokens=True).strip()


def _load_tokenizer_file(model_path: str) -> Tokenizer:
    """Load a vocabulary file: HF-tokenizers JSON (our native format) or a
    binary SentencePiece ``.model`` from the reference toolchain
    (``scripts/build_vocabulary.py`` there trains SentencePiece BPE).

    The SP proto is parsed without the sentencepiece runtime (via the proto
    schema transformers ships); BPE merges are reconstructed from the piece
    table. SentencePiece's BPE trainer records merge order in the piece
    *scores* (each merged piece's score is the negated merge rank,
    ``bpe_model_trainer.cc``), so candidate merges — every split of a
    composite piece whose halves exist — are ranked by score (higher =
    earlier), falling back to piece-id order only for degenerate protos
    whose scores carry no order (all equal). Residual risk: a proto whose
    scores were rewritten post-training loses merge order entirely; the
    ``reproduce_parity.sh`` tokenizer self-check (encode pinned captions vs
    a committed golden) is the end-to-end gate for real models.
    """
    with open(model_path, "rb") as f:
        head = f.read(64)
    if head.lstrip()[:1] == b"{":  # JSON → native format
        return Tokenizer.from_file(model_path)
    return _tokenizer_from_sentencepiece(model_path)


def _sp_proto_schema():
    """The SentencePiece ModelProto schema (shipped by transformers). Both
    proto directions (importing the reference's ``coco_10k.model``,
    exporting our vocab) need it; native HF-JSON vocabularies do not."""
    try:
        from transformers.utils import (  # noqa: PLC0415
            sentencepiece_model_pb2_new as spb,
        )
    except ImportError as e:
        raise ImportError(
            "binary SentencePiece .model support needs the proto schema "
            "from the transformers package — pip install "
            "'virtex-tpu[sp-protos]' (native HF-JSON vocabularies load "
            "with the base install)") from e
    except Exception as e:
        # The transformers/protobuf chain can also die with TypeError
        # ("Descriptors cannot be created...") or RuntimeError on a broken
        # install — keep the guidance actionable either way.
        raise ImportError(
            f"binary SentencePiece .model support needs a WORKING "
            f"transformers/protobuf install (the proto schema import "
            f"failed with {e!r}) — reinstall via pip install "
            f"'virtex-tpu[sp-protos]'") from e
    return spb


def _tokenizer_from_sentencepiece(model_path: str) -> Tokenizer:
    spb = _sp_proto_schema()

    proto = spb.ModelProto()
    with open(model_path, "rb") as f:
        proto.ParseFromString(f.read())

    pieces = [(p.piece, p.score) for p in proto.pieces]
    vocab = {piece: i for i, (piece, _) in enumerate(pieces)}

    model_type = proto.trainer_spec.model_type  # 1=unigram, 2=bpe
    byte_fallback = bool(proto.trainer_spec.byte_fallback)
    if model_type == 1:
        # byte_fallback must carry over here too: a byte-fallback Unigram
        # model encodes OOV chars to <0xNN> pieces, never <unk> (id 0, which
        # doubles as padding) — dropping it would silently diverge.
        tok = Tokenizer(models.Unigram(pieces, unk_id=UNK_INDEX,
                                       byte_fallback=byte_fallback))
    else:
        # Only NORMAL(1) / USER_DEFINED(4) pieces can be merge products;
        # CONTROL/UNKNOWN/BYTE pieces (e.g. "[SOS]", "<0x41>") must not
        # contribute splits even when their substrings happen to be pieces.
        mergeable = {1, 4}
        candidates = []
        for pid, p in enumerate(proto.pieces):
            piece, score = p.piece, p.score
            if len(piece) < 2 or p.type not in mergeable:
                continue
            for split in range(1, len(piece)):
                left, right = piece[:split], piece[split:]
                if left in vocab and right in vocab:
                    candidates.append((-score, pid, vocab[left],
                                       vocab[right], (left, right)))
        # SP-BPE merge order lives in the scores (negated merge rank →
        # sort by -score ascending = earliest merge first). Hand-built or
        # stripped protos may carry uniform scores; only then is piece-id
        # order the best available proxy.
        scores_ordered = len({c[0] for c in candidates}) > 1
        key = (None if scores_ordered else (lambda c: c[1:4]))
        merges = [c[4] for c in sorted(candidates, key=key)]
        tok = Tokenizer(models.BPE(vocab, merges, unk_token="<unk>",
                                   fuse_unk=True,
                                   byte_fallback=byte_fallback))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="\u2581")
    tok.decoder = decoders.Metaspace(replacement="\u2581")
    return tok


def preprocess_caption(text: str, lower: bool = True, strip_accents: bool = True) -> str:
    """Lowercase + NFKD accent-strip, matching the reference's caption
    preprocessing (``virtex/data/datasets/coco_captions.py:33-37`` and
    ``scripts/build_vocabulary.py:57-63``)."""
    if lower:
        text = text.lower()
    if strip_accents:
        text = unicodedata.normalize("NFKD", text)
        text = "".join(c for c in text if not unicodedata.combining(c))
    return text


def train_tokenizer(
    captions: Iterable[str],
    output_path: str,
    vocab_size: int = 10000,
    lower: bool = True,
    strip_accents: bool = True,
) -> "SentencePieceBPETokenizer":
    """Train a BPE vocabulary over captions and serialize it to
    ``output_path``. Role-equivalent of the reference's SentencePiece
    training (``scripts/build_vocabulary.py:86-96``): vocab 10000, full
    character coverage, control symbols [SOS]/[EOS]/[MASK], ``<unk>`` at
    index 0 doubling as padding.

    **Training parity with SentencePiece is NOT claimed.** This trains the
    HF-tokenizers BPE trainer, whose merge selection and tie-breaking
    differ from SentencePiece's — a vocabulary trained HERE on the same
    corpus will NOT byte-match the reference's ``coco_10k.model``. Parity
    runs must import the reference's actual ``.model`` (the SP-proto
    importer above + ``scripts/tokenizer_selfcheck.py`` gate that). The
    inverse direction IS covered: :func:`export_sentencepiece_model` emits
    our trained vocab as an SP proto, round-trip-tested to identical
    encodes (``tests/test_tokenizer.py``)."""
    # fuse_unk=True matches SentencePiece semantics (a run of unknown
    # characters becomes ONE <unk>) and the SP-proto importer above — the
    # binary-export round-trip diverges on OOV runs without it (e.g. "42"
    # → two unks unfused vs one fused).
    tok = Tokenizer(models.BPE(unk_token="<unk>", fuse_unk=True))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    tok.decoder = decoders.Metaspace(replacement="▁")
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=SPECIAL_TOKENS,
        show_progress=False,
    )
    corpus = [preprocess_caption(c, lower, strip_accents) for c in captions]
    tok.train_from_iterator(corpus, trainer=trainer)
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    tok.save(output_path)
    return SentencePieceBPETokenizer(output_path)


# SentencePiece piece types (sentencepiece_model.proto).
_SP_NORMAL, _SP_UNKNOWN, _SP_CONTROL = 1, 2, 3


def export_sentencepiece_model(model_path: str, output_path: str) -> None:
    """Export a native HF-JSON vocabulary (from :func:`train_tokenizer`)
    as a binary SentencePiece ``ModelProto``.

    Makes vocabularies trained HERE consumable by SP-proto readers — the
    importer above, and the SentencePiece runtime itself. Merge order is
    recorded the way SentencePiece's own BPE trainer records it
    (``bpe_model_trainer.cc``): each merged piece's score is its negated
    merge rank, which is exactly what ``_tokenizer_from_sentencepiece``
    reconstructs merges from — so train → export → reimport yields
    identical encodes (round-trip test in ``tests/test_tokenizer.py``).

    NOTE the asymmetry (see :func:`train_tokenizer`): this does NOT make
    our trainer reproduce a SentencePiece-trained model; it makes our
    trained model readable through the SentencePiece format.
    """
    import json as _json

    spb = _sp_proto_schema()

    with open(model_path) as f:
        blob = _json.load(f)
    model = blob["model"]
    if model.get("type") != "BPE":
        raise ValueError(f"{model_path}: not a BPE tokenizer JSON")
    vocab: Dict[str, int] = model["vocab"]
    merges = [tuple(m.split(" ", 1)) if isinstance(m, str) else tuple(m)
              for m in model["merges"]]
    # SP protos identify pieces by POSITION: the ids must be exactly
    # 0..len-1 (train_tokenizer guarantees this; a hand-pruned vocab or
    # one whose specials live only in added_tokens does not) — validate
    # instead of crashing with IndexError / protobuf TypeError downstream.
    ids = sorted(vocab.values())
    if ids != list(range(len(vocab))):
        gaps = sorted(set(range(len(vocab))) - set(ids))[:5]
        raise ValueError(
            f"{model_path}: vocab ids are not contiguous 0..{len(vocab)-1} "
            f"(first missing: {gaps}; max id {ids[-1] if ids else 'n/a'}) — "
            f"SP protos identify pieces by position, so this vocabulary "
            f"cannot be exported as-is")
    id_to_piece = [None] * len(vocab)
    for piece, i in vocab.items():
        id_to_piece[i] = piece
    product_rank: Dict[str, int] = {}
    for rank, (left, right) in enumerate(merges):
        product_rank.setdefault(left + right, rank)

    proto = spb.ModelProto()
    n_unranked = 0
    for piece in id_to_piece:
        p = proto.pieces.add()
        p.piece = piece
        if piece == "<unk>":
            p.type, p.score = _SP_UNKNOWN, 0.0
        elif piece in SPECIAL_TOKENS:
            p.type, p.score = _SP_CONTROL, 0.0
        elif piece in product_rank:
            p.type, p.score = _SP_NORMAL, -float(product_rank[piece])
        else:
            # alphabet/base pieces: never merge candidates, rank-neutral;
            # composite NORMAL pieces without a recorded merge shouldn't
            # exist in BPE output, but rank them after every real merge
            # rather than corrupt the order.
            if len(piece) >= 2:
                n_unranked += 1
                p.type = _SP_NORMAL
                p.score = -float(len(merges) + n_unranked)
            else:
                p.type, p.score = _SP_NORMAL, 0.0
    proto.trainer_spec.model_type = 2  # BPE
    proto.trainer_spec.vocab_size = len(vocab)
    proto.trainer_spec.byte_fallback = False
    proto.trainer_spec.unk_id = UNK_INDEX
    # Pin the normalizer EXPLICITLY: an unset normalizer_spec makes the real
    # SentencePiece runtime apply proto defaults (nmt_nfkc normalization,
    # remove_extra_whitespaces=True) that our native path does not perform —
    # whitespace runs would collapse and encodes diverge on any spm host
    # (round-5 review finding #2). identity + keep-whitespace +
    # dummy-prefix/escape matches the HF Metaspace pre-tokenizer on any
    # text that does not START with whitespace. Known residual asymmetry:
    # spm's add_dummy_prefix prepends unconditionally while HF Metaspace
    # skips the prepend when the text already begins with the replacement
    # char, so "  a man" gains an extra lone-▁ piece under real spm.
    # Caption pipelines in this repo never feed leading whitespace
    # (preprocess + dataset readers), and the in-repo round-trip cannot
    # observe it (the importer reuses Metaspace) — documented, not hidden.
    proto.normalizer_spec.name = "identity"
    proto.normalizer_spec.precompiled_charsmap = b""
    proto.normalizer_spec.add_dummy_prefix = True
    proto.normalizer_spec.remove_extra_whitespaces = False
    proto.normalizer_spec.escape_whitespaces = True
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "wb") as f:
        f.write(proto.SerializeToString())
