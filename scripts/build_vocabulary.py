r"""
Build the BPE caption vocabulary from COCO train2017 captions.

Role parity: reference ``scripts/build_vocabulary.py:12-96`` — vocab
10000, lowercase + NFKD accent stripping, special tokens ``<unk>``=0
(doubles as padding), ``[SOS]``=1, ``[EOS]``=2, ``[MASK]``=3.

**Training parity is NOT claimed**: this trains the HF-tokenizers BPE
trainer, not SentencePiece's — merge selection/tie-breaking differ, so a
vocabulary trained here will NOT byte-match the reference's
``coco_10k.model`` even on the identical corpus. Reference-parity runs must
point ``DATA.TOKENIZER_MODEL`` at the reference's actual ``.model`` (the
SP-proto importer in ``virtex_tpu/data/tokenizers.py`` reads it directly,
gated by ``scripts/tokenizer_selfcheck.py``). Alongside the native JSON,
this CLI also writes ``<prefix>.sp.model`` — our vocab exported as an SP
ModelProto (round-trip tested) for SP-format consumers.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import unicodedata

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from virtex_tpu.data.tokenizers import (
    export_sentencepiece_model,
    train_tokenizer,
)


def main(_A) -> None:
    with open(os.path.join(_A.captions)) as f:
        raw = json.load(f)
    captions = []
    for ann in raw["annotations"]:
        caption = ann["caption"]
        if _A.do_lower_case:
            caption = caption.lower()
        if not _A.keep_accents:
            caption = unicodedata.normalize("NFKD", caption)
            caption = "".join(c for c in caption
                              if not unicodedata.combining(c))
        captions.append(caption)

    os.makedirs(os.path.dirname(os.path.abspath(_A.output_prefix)),
                exist_ok=True)
    out = _A.output_prefix + ".model"
    train_tokenizer(captions, out, vocab_size=_A.vocab_size)
    # SP-proto export is best-effort: it needs transformers (for the proto
    # schema), which is not a declared dependency of this package. Broad
    # except: the transformers/protobuf import chain can also fail with
    # TypeError ("Descriptors cannot be created...") or RuntimeError on a
    # broken torch — the trained JSON vocabulary must never be held
    # hostage by the optional export.
    sp_note = ""
    try:
        sp_out = _A.output_prefix + ".sp.model"
        export_sentencepiece_model(out, sp_out)
        sp_note = f" (+ SP-proto export {sp_out})"
    except Exception as e:
        print(f"SP-proto export skipped (needs a working transformers/"
              f"protobuf install for the proto schema): {e!r}")
    print(f"Trained {_A.vocab_size}-token vocabulary on {len(captions)} "
          f"captions → {out}{sp_note}")
    print("NOTE: HF-BPE trainer, not SentencePiece — this vocabulary will "
          "NOT match a SentencePiece-trained one (e.g. the reference's "
          "coco_10k.model); point DATA.TOKENIZER_MODEL at the reference's "
          ".model for parity runs.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Build a BPE caption vocabulary.")
    parser.add_argument(
        "-c", "--captions",
        default="datasets/coco/annotations/captions_train2017.json")
    parser.add_argument("-s", "--vocab-size", type=int, default=10000)
    parser.add_argument("-o", "--output-prefix",
                        default="datasets/vocab/coco_10k")
    parser.add_argument("-l", "--do-lower-case", action="store_true",
                        default=True)
    parser.add_argument("-a", "--keep-accents", action="store_true")
    main(parser.parse_args())
