#!/usr/bin/env bash
# =============================================================================
# Real-data parity closure rehearsal (VERDICT r2 #2).
#
# The moment real COCO + the published reference checkpoints are reachable,
# this script runs the full quality-parity closure end to end:
#
#   download/convert -> feature bit-check -> eval_captioning (CIDEr/SPICE)
#   -> clf_voc07 (VOC07 mAP) -> clf_linear (IN-1k top-1)
#
# and prints each measured number next to the reference's published value
# (reference docs/virtex/usage/model_zoo.rst:88-231; paper reports ~94
# CIDEr / ~18.5 SPICE for the best model).
#
# With no real data it runs the SAME pipeline against synthetic fixtures
# (tests/utils_fixtures.py) so every command line below is exercised today:
#
#   scripts/reproduce_parity.sh                      # synthetic rehearsal
#   scripts/reproduce_parity.sh --mode real \
#       --coco-root /data/coco --voc-root /data/VOC2007 \
#       --imagenet-root /data/imagenet \
#       --zoo-dir https://your-mirror/virtex-zoo      # the real closure
#
# --zoo-dir may be a local directory of the published .pth files or an
# http(s) base URL (model_zoo.fetch caches + checksums downloads).
# =============================================================================
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
MODE=synthetic
COCO_ROOT=""
VOC_ROOT=""
IMAGENET_ROOT=""
ZOO_DIR="${VIRTEX_TPU_ZOO_DIR:-}"
WORKDIR="${WORKDIR:-/tmp/virtex_parity}"
# Flagship checkpoint for captioning metrics; VOC/IN-1k run on the same.
MODEL_NAME="bicaptioning_R_50_L1_H2048"
MODEL_CONFIG="task_ablations/bicaptioning_R_50_L1_H2048.yaml"

while [[ $# -gt 0 ]]; do
  case "$1" in
    --mode) MODE="$2"; shift 2 ;;
    --coco-root) COCO_ROOT="$2"; shift 2 ;;
    --voc-root) VOC_ROOT="$2"; shift 2 ;;
    --imagenet-root) IMAGENET_ROOT="$2"; shift 2 ;;
    --zoo-dir) ZOO_DIR="$2"; shift 2 ;;
    --workdir) WORKDIR="$2"; shift 2 ;;
    *) echo "unknown arg $1"; exit 2 ;;
  esac
done

mkdir -p "$WORKDIR"
cd "$REPO"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_tpu}"

# Published reference numbers to compare against (model_zoo.rst:88-231).
declare -A EXPECT_VOC=( [bicaptioning_R_50_L1_H2048]=88.7 )
declare -A EXPECT_IN1K=( [bicaptioning_R_50_L1_H2048]=53.8 )
EXPECT_CIDER="~94 (paper, best model)"
EXPECT_SPICE="~18.5 (paper, best model)"

say() { echo; echo "=== $*"; }

if [[ "$MODE" == "synthetic" ]]; then
  # ---------------------------------------------------------------------
  # Synthetic rehearsal: same commands, fixture data, tiny model. Verifies
  # the whole closure path executes before real data exists.
  # ---------------------------------------------------------------------
  say "[synthetic] building fixtures in $WORKDIR"
  python - "$WORKDIR" <<'PY'
import pathlib, sys
sys.path.insert(0, "tests")
from utils_fixtures import make_fake_coco, make_fake_voc07, \
    make_fake_imagenet, make_tokenizer
w = pathlib.Path(sys.argv[1])
make_fake_coco(str(w / "coco"), n_images=16)
make_fake_voc07(str(w / "VOC2007"))
make_fake_imagenet(str(w / "imagenet"))
make_tokenizer(w)
PY
  COCO_ROOT="$WORKDIR/coco"
  VOC_ROOT="$WORKDIR/VOC2007"
  IMAGENET_ROOT="$WORKDIR/imagenet"
  TINY=( "DATA.TOKENIZER_MODEL" "$WORKDIR/tok.model"
         "MODEL.VISUAL.NAME" "torchvision::resnet18"
         "MODEL.VISUAL.FEATURE_SIZE" "512"
         "MODEL.TEXTUAL.NAME" "transdec_postnorm::L1_H128_A4_F256"
         "DATA.IMAGE_CROP_SIZE" "64" )

  say "[synthetic] tokenizer self-check rehearsal (golden write -> verify)"
  python scripts/tokenizer_selfcheck.py --model "$WORKDIR/tok.model" \
    --golden "$WORKDIR/tok_golden.json" --write-golden
  python scripts/tokenizer_selfcheck.py --model "$WORKDIR/tok.model" \
    --golden "$WORKDIR/tok_golden.json"

  say "[synthetic] BINARY SP-proto importer rehearsal (export -> selfcheck vs the JSON golden)"
  # Exercises the exact real-data mode-2 path: a binary .model through the
  # SP-proto merge reconstruction, diffed against a committed golden. The
  # golden was just written from the native JSON, so any importer drift on
  # score-ranked protos fails HERE, not on real-data day.
  python - "$WORKDIR" <<'PY'
import sys
from virtex_tpu.data.tokenizers import export_sentencepiece_model
export_sentencepiece_model(sys.argv[1] + "/tok.model",
                           sys.argv[1] + "/tok.sp.model")
PY
  sed "s/tok.model/tok.sp.model/" "$WORKDIR/tok_golden.json" \
    > "$WORKDIR/tok_sp_golden.json"
  python scripts/tokenizer_selfcheck.py --model "$WORKDIR/tok.sp.model" \
    --golden "$WORKDIR/tok_sp_golden.json"

  say "[synthetic] short pretrain -> checkpoint (stands in for the published .pth)"
  python scripts/pretrain_virtex.py \
    --config configs/_base_bicaptioning_R_50_L1_H1024.yaml \
    --serialization-dir "$WORKDIR/pretrain" \
    --cpu-workers 2 --checkpoint-every 4 \
    --config-override OPTIM.NUM_ITERATIONS 4 OPTIM.BATCH_SIZE 8 \
      DATA.ROOT "$COCO_ROOT" "${TINY[@]}"
  CKPT="$WORKDIR/pretrain/checkpoint_4"

  say "[synthetic] export -> reimport round-trip (exercises the .pth converter both ways)"
  python scripts/export_torch_checkpoint.py \
    --config configs/_base_bicaptioning_R_50_L1_H1024.yaml \
    --config-override "${TINY[@]}" \
    --checkpoint-path "$CKPT" --output "$WORKDIR/exported.pth"
  python scripts/import_torch_checkpoint.py \
    --config "$REPO/configs/_base_bicaptioning_R_50_L1_H1024.yaml" \
    --config-override "${TINY[@]}" \
    --checkpoint-path "$WORKDIR/exported.pth" \
    --output "$WORKDIR/reimported" --iteration 4
  CKPT="$WORKDIR/reimported"

  say "[synthetic] feature bit-check (torch reference model vs converted flax, same .pth)"
  python scripts/feature_bitcheck.py \
    --config configs/_base_bicaptioning_R_50_L1_H1024.yaml \
    --config-override "${TINY[@]}" \
    --checkpoint-path "$WORKDIR/exported.pth"

  say "[synthetic] eval_captioning --calc-metrics (CIDEr on fixture COCO val)"
  python scripts/eval_captioning.py \
    --config configs/_base_bicaptioning_R_50_L1_H1024.yaml \
    --serialization-dir "$WORKDIR/evalcap" \
    --checkpoint-path "$CKPT" --batch-size 8 --cpu-workers 0 \
    --output "$WORKDIR/preds.json" --calc-metrics \
    --config-override DATA.ROOT "$COCO_ROOT" "${TINY[@]}" \
      MODEL.DECODER.MAX_DECODING_STEPS 10

  say "[synthetic] clf_voc07 (SVM mAP through the real CLI)"
  python scripts/clf_voc07.py \
    --config configs/_base_bicaptioning_R_50_L1_H1024.yaml \
    --down-config configs/downstream/voc07_clf.yaml \
    --serialization-dir "$WORKDIR/voc07" \
    --weight-init virtex --checkpoint-path "$CKPT" --cpu-workers 0 \
    --config-override "${TINY[@]}" \
    --down-config-override DATA.ROOT "$VOC_ROOT" DATA.IMAGE_CROP_SIZE 64

  say "[synthetic] clf_linear (linear probe through the real CLI)"
  python scripts/clf_linear.py \
    --config configs/_base_bicaptioning_R_50_L1_H1024.yaml \
    --down-config configs/downstream/imagenet_clf.yaml \
    --serialization-dir "$WORKDIR/linear" \
    --weight-init virtex --checkpoint-path "$CKPT" --cpu-workers 0 \
    --config-override "${TINY[@]}" \
    --down-config-override DATA.ROOT "$IMAGENET_ROOT" \
      DATA.IMAGE_CROP_SIZE 64 OPTIM.NUM_ITERATIONS 4 OPTIM.BATCH_SIZE 8 \
      OPTIM.WARMUP_STEPS 2

  say "[synthetic] rehearsal complete — every closure command executed."
  echo "Real invocation: scripts/reproduce_parity.sh --mode real \\"
  echo "  --coco-root /data/coco --voc-root /data/VOC2007 \\"
  echo "  --imagenet-root /data/imagenet --zoo-dir <dir-or-url>"
  exit 0
fi

# ---------------------------------------------------------------------------
# REAL closure. Requires: COCO 2017 at --coco-root (train2017/ val2017/
# annotations/), VOC2007 at --voc-root, ImageNet at --imagenet-root, and
# --zoo-dir holding the published checkpoints (.pth) or an http(s) mirror.
# ---------------------------------------------------------------------------
[[ -n "$COCO_ROOT" && -n "$ZOO_DIR" ]] || {
  echo "--mode real needs --coco-root and --zoo-dir"; exit 2; }

say "[0/5] tokenizer self-check (SP .model importer vs pinned golden)"
# The merge reconstruction in virtex_tpu/data/tokenizers.py must match the
# SentencePiece runtime on the real coco_10k.model before ANY quality number
# is trusted (captions/CIDEr drift silently otherwise).
TOKMODEL=$(python -c "import sys; sys.path.insert(0, '$REPO'); \
from virtex_tpu.config import Config; \
print(Config('$REPO/configs/$MODEL_CONFIG').DATA.TOKENIZER_MODEL)")
python scripts/tokenizer_selfcheck.py --model "$TOKMODEL" \
  --golden tests/fixtures/coco_10k_tokenizer_golden.json

say "[1/5] fetch + convert $MODEL_NAME"
export VIRTEX_TPU_ZOO_DIR="$ZOO_DIR"
PTH="$ZOO_DIR/$MODEL_NAME.pth"
if [[ "$ZOO_DIR" == http* ]]; then
  PTH=$(python -c "from virtex_tpu.model_zoo.model_zoo import fetch; \
print(fetch('$ZOO_DIR/$MODEL_NAME.pth'))")
fi
python scripts/import_torch_checkpoint.py \
  --config "$REPO/configs/$MODEL_CONFIG" \
  --checkpoint-path "$PTH" --output "$WORKDIR/$MODEL_NAME"
CKPT="$WORKDIR/$MODEL_NAME"

say "[2/5] feature bit-check vs the published torch weights"
# Load the fetched .pth into BOTH the reference torch model and the
# converted flax model; require agreement on the (B,7,7,2048) layer4 grid,
# the composed training loss, and d(loss)/d(image). HARD gate: a converter
# drift here aborts the closure (set -e) before any quality number is read.
python scripts/feature_bitcheck.py \
  --config "$REPO/configs/$MODEL_CONFIG" \
  --checkpoint-path "$PTH"

say "[3/5] eval_captioning on COCO val2017 (expect CIDEr $EXPECT_CIDER, SPICE $EXPECT_SPICE)"
python scripts/eval_captioning.py \
  --config "configs/$MODEL_CONFIG" \
  --serialization-dir "$WORKDIR/evalcap" \
  --checkpoint-path "$CKPT" --batch-size 32 \
  --output "$WORKDIR/preds.json" --calc-metrics \
  --config-override DATA.ROOT "$COCO_ROOT"

say "[4/5] clf_voc07 (expect mAP ${EXPECT_VOC[$MODEL_NAME]})"
python scripts/clf_voc07.py \
  --config "configs/$MODEL_CONFIG" \
  --down-config configs/downstream/voc07_clf.yaml \
  --serialization-dir "$WORKDIR/voc07" \
  --weight-init virtex --checkpoint-path "$CKPT" \
  --down-config-override DATA.ROOT "$VOC_ROOT"

say "[5/5] clf_linear IN-1k (expect top-1 ${EXPECT_IN1K[$MODEL_NAME]})"
python scripts/clf_linear.py \
  --config "configs/$MODEL_CONFIG" \
  --down-config configs/downstream/imagenet_clf.yaml \
  --serialization-dir "$WORKDIR/linear" \
  --weight-init virtex --checkpoint-path "$CKPT" \
  --down-config-override DATA.ROOT "$IMAGENET_ROOT"

say "done — compare the three numbers above with the expected values."
