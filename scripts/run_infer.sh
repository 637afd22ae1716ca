#!/usr/bin/env bash
# The five evaluation workloads (reference run_infer.sh analogue).
# Usage: scripts/run_infer.sh [uni|uni_2stage|mmu|plan|rm|edit] [extra --opt ...]
set -e
MODE=${1:-uni}
shift || true

case "$MODE" in
  uni)        python -m plangen_tpu.cli eval --task uni        --data creati "$@" ;;
  uni_2stage) python -m plangen_tpu.cli eval --task uni_2stage --data creati "$@" ;;
  mmu)        python -m plangen_tpu.cli eval --task mmu        --data creati "$@" ;;
  plan)       python -m plangen_tpu.cli eval --task plan       --data creati "$@" ;;
  # removal: teacher forcing + per-sample clutter negative grounding
  rm)         python -m plangen_tpu.cli eval --task rm  --data rm_coco \
                --opt generation.use_teacher_forcing=True generation.use_neg_box=True \
                      generation.fast_edit=True "$@" ;;
  # editing: teacher forcing, dilated edit boxes
  edit)       python -m plangen_tpu.cli eval --task edit --data edit_coco \
                --opt generation.use_teacher_forcing=True generation.pad_edit_box=0.1 \
                      generation.fast_edit=True "$@" ;;
  *) echo "unknown mode $MODE"; exit 1 ;;
esac
