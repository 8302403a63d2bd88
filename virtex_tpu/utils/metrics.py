r"""
Evaluation metrics: top-k accuracy accumulator and COCO caption metrics
(CIDEr, SPICE).

Parity target: reference ``virtex/utils/metrics.py`` —
:class:`TopkAccuracy` (``metrics.py:22-72``), and
:class:`CocoCaptionsEvaluator` following the official coco-caption protocol
(``metrics.py:75-306``): PTB tokenization, CIDEr-D (tf-idf 4-gram cosine
with a σ=6 length gaussian, ×10), and SPICE via the Stanford JAR.

Differences: PTB tokenization is pure Python here (the reference shells out
to the CoreNLP PTBTokenizer JAR, ``metrics.py:132-158``) implementing the
same published Penn-Treebank rules + punctuation removal used by
coco-caption; SPICE still requires the external JAR (subprocess contract
preserved, gated on java being present).
"""
from __future__ import annotations

import json
import math
import os
import re
import shutil
import subprocess
import tempfile
from collections import defaultdict
from typing import Any, Dict, List, Sequence

import numpy as np


class TopkAccuracy:
    r"""Running top-k accuracy (reference ``metrics.py:22-72``):
    ``__call__(logits (B, C) or (B, T, C), targets)`` accumulates; ``get``
    returns percentage and resets."""

    def __init__(self, top_k: int = 1):
        self._top_k = top_k
        self.reset()

    def reset(self):
        self.num_total = 0.0
        self.num_correct = 0.0

    def __call__(self, predictions, ground_truth):
        predictions = np.asarray(predictions)
        ground_truth = np.asarray(ground_truth)
        if self._top_k == 1:
            top_k = predictions.argmax(-1)[..., None]
        else:
            top_k = np.argsort(-predictions, axis=-1)[..., : self._top_k]
        correct = (top_k == ground_truth[..., None]).any(-1)
        self.num_correct += float(correct.sum())
        self.num_total += float(correct.size)

    def get_metric(self, reset: bool = False) -> float:
        acc = 100.0 * self.num_correct / max(self.num_total, 1e-12)
        if reset:
            self.reset()
        return acc


# ---------------------------------------------------------------------------
# PTB-style tokenization (pure python).
# ---------------------------------------------------------------------------

# Punctuation stripped AFTER tokenization, exactly the reference's filter
# (metrics.py:163-167). NOTE the filter is case-sensitive while the
# tokenizer runs with -lowerCase: bracket tokens come out as "-lrb-" etc.
# and therefore SURVIVE — a reference quirk we reproduce.
_PUNCT = {"''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
          ".", "?", "!", ",", ":", "-", "--", "...", ";"}

# PTB bracket normalization (applied before lowercasing, like the JAR).
_BRACKETS = {"(": "-LRB-", ")": "-RRB-", "[": "-LSB-", "]": "-RSB-",
             "{": "-LCB-", "}": "-RCB-"}

# Assimilated forms split by PTBTokenizer (splitAssimilations default).
_CONTRACTIONS = [
    (re.compile(r"\b(can)(not)\b", re.I), r"\1 \2"),
    (re.compile(r"\b(d)('ye)\b", re.I), r"\1 \2"),
    (re.compile(r"\b(gim)(me)\b", re.I), r"\1 \2"),
    (re.compile(r"\b(gon)(na)\b", re.I), r"\1 \2"),
    (re.compile(r"\b(got)(ta)\b", re.I), r"\1 \2"),
    (re.compile(r"\b(lem)(me)\b", re.I), r"\1 \2"),
    (re.compile(r"\b(wan)(na)\b", re.I), r"\1 \2"),
    (re.compile(r"\b(more)('n)\b", re.I), r"\1 \2"),
]


def ptb_tokenize(caption: str) -> List[str]:
    """Penn-Treebank-style word tokenization, lowercased, punctuation
    dropped — emulates the reference's CoreNLP ``PTBTokenizer
    -preserveLines -lowerCase`` subprocess + post-filter
    (``metrics.py:132-173``; no JVM dependency). Golden behaviors covered
    by ``tests/fixtures/ptb_tokenizer_golden.json``:

    - brackets become ``-lrb-``-style tokens (and survive the
      case-sensitive punctuation filter, like the reference);
    - ``.``/``,`` inside numbers stay attached (``3.5``, ``1,000``);
    - contractions split off (``do n't``, ``dog 's``); assimilations split
      (``gon na``); hyphenated words stay whole;
    - ``$``/``%``/``&``/``@`` are kept as separate tokens;
    - quotes, ellipses and standalone punctuation are dropped;
    - unicode punctuation is normalized first, the JAR's ptb3Escaping
      behavior: curly quotes → PTB quote tokens (an apostrophe-like ``’``
      becomes ``'`` BEFORE contraction handling, so ``dog’s`` still splits
      to ``dog 's``), en/em/horizontal-bar dashes → ``--``, ``…`` →
      ``...``, non-breaking space → space, unicode currency signs
      separated like ``$``.
    """
    s = caption.strip().replace("\n", " ")
    # -- unicode normalization (CoreNLP ptb3Escaping defaults) ------------
    s = (s.replace("\u00a0", " ")                    # nbsp
         .replace("‘", "`").replace("’", "'")   # ‘ ’
         .replace("“", " `` ").replace("”", " '' ")  # “ ”
         .replace("„", " `` ").replace("‟", " '' ")  # „ ‟
         .replace("–", " -- ").replace("—", " -- ")  # – —
         .replace("―", " -- ")                  # ―
         .replace("…", " ... "))                # …
    # backtick quotes: `` pair then single ` (PTB open-quote tokens)
    s = re.sub(r"``", " `` ", s)
    s = re.sub(r"`(?!`)", " ` ", s)
    # unicode currency signs behave like $
    s = re.sub(r"([¢£¥€])", r" \1 ", s)
    # ellipses → the PTB "..." token (dropped by the filter below)
    s = re.sub(r"\.\.\.+", " ... ", s)
    for raw, tok in _BRACKETS.items():
        s = s.replace(raw, f" {tok} ")
    # double quotes → PTB quote pair tokens (both filtered out)
    s = s.replace('"', " '' ")
    # separate . and , unless number-internal (digit BOTH sides: 3.5,
    # 1,000) or a leading decimal point (token start + digit after: .22).
    # A bare "digit follows" rule would glue letter-adjacent punctuation
    # ("plates,2" staying one token), a "digit both sides" rule would
    # strip the dot off ".22"; check both neighbors in the ORIGINAL string
    # (re.sub scans the unmodified input left to right).
    def _sep_numpunct(m):
        i, ch = m.start(), m.group(1)
        prev = m.string[i - 1] if i > 0 else " "
        nxt = m.string[i + 1] if i + 1 < len(m.string) else " "
        if prev.isdigit() and nxt.isdigit():
            return ch
        if ch == "." and not prev.isalnum() and nxt.isdigit():
            return ch
        return f" {ch} "
    # dotted acronyms/abbreviations stay whole like the JAR's PTBLexer
    # ("u.s.", "p.m.", "i.e."): letter-dot repeated, optional final letter.
    # Protect their dots through the separation passes below.
    s = re.sub(r"\b(?:[A-Za-z]\.){2,}[A-Za-z]?(?!\w)",
               lambda m: m.group(0).replace(".", "\x00"), s)
    s = re.sub(r"([.,])", _sep_numpunct, s)
    # digit:digit times/ratios stay whole ("7:30", "3:2") — PTBLexer
    # recognizes them as single tokens; other colons separate.
    def _sep_colon(m):
        i = m.start()
        prev = m.string[i - 1] if i > 0 else " "
        nxt = m.string[i + 1] if i + 1 < len(m.string) else " "
        return ":" if prev.isdigit() and nxt.isdigit() else " : "
    s = re.sub(r":", _sep_colon, s)
    # always-separated symbols ($ 5, 50 %, black & white)
    s = re.sub(r"([;!?$%&@#*+=<>/\\|~^])", r" \1 ", s)
    s = s.replace("\x00", ".")
    # contractions: n't, then 's 're 've 'll 'd 'm; standalone apostrophes
    s = re.sub(r"\b(\w+)(n't)\b", r"\1 \2", s, flags=re.I)
    s = re.sub(r"(\w)('s|'re|'ve|'ll|'d|'m)\b", r"\1 \2", s, flags=re.I)
    for pat, repl in _CONTRACTIONS:
        s = pat.sub(repl, s)
    # standalone / trailing apostrophes ("dogs'" → "dogs '"); an apostrophe
    # followed by a word char is a contraction start and stays attached
    s = re.sub(r"'(?!\w)", " ' ", s)
    tokens = s.lower().split()
    return [t for t in tokens if t not in _PUNCT]


# ---------------------------------------------------------------------------
# CIDEr-D (pure python, reference metrics.py:177-264).
# ---------------------------------------------------------------------------


def _ngrams(tokens: Sequence[str], max_n: int = 4) -> Dict[int, Dict[tuple, int]]:
    out: Dict[int, Dict[tuple, int]] = {n: defaultdict(int)
                                        for n in range(1, max_n + 1)}
    for n in range(1, max_n + 1):
        for i in range(len(tokens) - n + 1):
            out[n][tuple(tokens[i:i + n])] += 1
    return out


def cider(predictions: Dict[Any, List[str]],
          ground_truth: Dict[Any, List[List[str]]],
          n: int = 4, sigma: float = 6.0) -> float:
    r"""CIDEr-D over tokenized captions.

    Args:
        predictions: image_id → [candidate tokens].
        ground_truth: image_id → list of [reference tokens].
    """
    ids = list(ground_truth.keys())
    # document frequency over reference sets
    df: Dict[int, Dict[tuple, float]] = {k: defaultdict(float)
                                         for k in range(1, n + 1)}
    for img in ids:
        seen = set()
        for ref in ground_truth[img]:
            for k, grams in _ngrams(ref, n).items():
                for g in grams:
                    seen.add((k, g))
        for k, g in seen:
            df[k][g] += 1.0
    log_num = math.log(max(len(ids), 1))

    def vec(tokens):
        grams = _ngrams(tokens, n)
        v = {}
        norm = {}
        for k in range(1, n + 1):
            vk = {}
            for g, cnt in grams[k].items():
                idf = log_num - math.log(max(df[k][g], 1.0))
                vk[g] = cnt * idf
            v[k] = vk
            norm[k] = math.sqrt(sum(x * x for x in vk.values()))
        return v, norm

    scores = []
    for img in ids:
        cand_tokens = predictions.get(img, [])
        cv, cn = vec(cand_tokens)
        img_score = 0.0
        for ref in ground_truth[img]:
            rv, rn = vec(ref)
            sim = 0.0
            for k in range(1, n + 1):
                num = 0.0
                for g, val in cv[k].items():
                    # clipped candidate counts (CIDEr-D)
                    num += min(val, rv[k].get(g, 0.0)) * rv[k].get(g, 0.0)
                denom = cn[k] * rn[k]
                if denom > 0:
                    sim += num / denom
            delta = len(cand_tokens) - len(ref)
            sim *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
            img_score += sim
        img_score = 10.0 * img_score / max(len(ground_truth[img]), 1) / n
        scores.append(img_score)
    return float(np.mean(scores)) if scores else 0.0


# ---------------------------------------------------------------------------
# SPICE (subprocess contract, reference metrics.py:267-306).
# ---------------------------------------------------------------------------

SPICE_JAR_ENV = "VIRTEX_TPU_SPICE_JAR"


def spice(predictions: Dict[Any, List[str]],
          ground_truth: Dict[Any, List[List[str]]]) -> float:
    """Run the SPICE-1.0 JAR if java + the jar are available; else raise.
    The jar path comes from $VIRTEX_TPU_SPICE_JAR."""
    jar = os.environ.get(SPICE_JAR_ENV)
    if not jar or not os.path.exists(jar) or shutil.which("java") is None:
        raise RuntimeError(
            "SPICE requires java and the SPICE-1.0 jar; set "
            f"${SPICE_JAR_ENV} to the jar path (reference "
            "virtex/utils/assets/download_spice.sh).")
    payload = [
        {"image_id": img,
         "test": " ".join(predictions.get(img, [])),
         "refs": [" ".join(r) for r in refs]}
        for img, refs in ground_truth.items()
    ]
    with tempfile.TemporaryDirectory() as tmp:
        in_file = os.path.join(tmp, "input.json")
        out_file = os.path.join(tmp, "output.json")
        with open(in_file, "w") as f:
            json.dump(payload, f)
        subprocess.check_call(
            ["java", "-jar", "-Xmx8G", jar, in_file, "-cache",
             os.path.join(tmp, "cache"), "-out", out_file, "-subset",
             "-silent"])
        with open(out_file) as f:
            results = json.load(f)
    return float(np.mean([
        item["scores"]["All"]["f"] for item in results]))


class CocoCaptionsEvaluator:
    r"""Evaluate predicted captions against COCO ground truth
    (reference ``metrics.py:75-122``).

    Args:
        gt_annotations: path to ``captions_val2017.json`` or a preloaded
            ``{image_id: [caption strings]}`` dict.
    """

    def __init__(self, gt_annotations):
        if isinstance(gt_annotations, str):
            with open(gt_annotations) as f:
                raw = json.load(f)
            gts: Dict[int, List[str]] = defaultdict(list)
            for ann in raw["annotations"]:
                gts[ann["image_id"]].append(ann["caption"])
            gt_annotations = dict(gts)
        self.ground_truth = {
            img: [ptb_tokenize(c) for c in caps]
            for img, caps in gt_annotations.items()
        }

    def evaluate(self, preds) -> Dict[str, float]:
        """preds: list of {"image_id", "caption"} or dict image_id→caption.
        Returns {"CIDEr": …, "SPICE": …} (SPICE 0.0 + warning if the JAR is
        unavailable)."""
        if isinstance(preds, list):
            preds = {p["image_id"]: p["caption"] for p in preds}
        pred_tokens = {img: ptb_tokenize(c) for img, c in preds.items()}
        # Same scale convention as the reference (metrics.py:119-122):
        # per-image CIDEr-D ∈ [0, 10], reported ×100.
        out = {"CIDEr": 100.0 * cider(pred_tokens, self.ground_truth)}
        try:
            out["SPICE"] = 100.0 * spice(pred_tokens, self.ground_truth)
        except RuntimeError:
            out["SPICE"] = 0.0
        return out
