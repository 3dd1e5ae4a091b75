#!/bin/bash
# Three-backbone reduced-scale training sweep (round-5 VERDICT #1): the
# reference's central published result is the CER ordering SE+BiLSTM < VGG <
# ResNet (/root/reference/readme.md:128-131); this reproduces all three
# trainings with the same recipe at reduced scale (30 epochs x 50k subsample
# of the cached 200k corpus; the flagship was near-converged by epoch 11 at
# full scale — docs/REF_SCALE_RUN.md).
#
#   bash examples/train_three_backbones.sh [EPOCHS] [CORPUS_DIR]
#
# Each backbone gets its own workdir /root/r5_train_<backbone> (checkpoints,
# epoch metrics); the corpus + held-out splits are shared via --corpus-dir.
# Held-out evaluation runs SEPARATELY on the degraded suite afterwards
# (khmer-ocr-eval --degraded) — the clean splits are CER-saturated.
set -e
cd "$(dirname "$0")/.."
EPOCHS="${1:-30}"
CORPUS="${2:-/root/ref_scale_run}"
for bb in se_vgg vgg resnet; do
  echo "=== training $bb ($EPOCHS epochs) ==="
  python examples/train_reference_scale.py \
    --backbone "$bb" --epochs "$EPOCHS" \
    --workdir "/root/r5_train_$bb" --corpus-dir "$CORPUS" \
    --processes 1 --skip-eval --resume auto
done
echo "=== all three backbones trained ==="
