#!/usr/bin/env bash
# Multi-task training with the released PlanGen recipe
# (reference run_train.sh analogue). Fill dataset paths in the config first.
set -e
python -m plangen_tpu.cli train --cfg configs/uni_text_ump_oimsam.py "$@"
