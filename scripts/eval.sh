#!/usr/bin/env bash
# Evaluation at the reference regime (eval.sh:9-13): bs 16, quad NMS IoU
# 0.25, corner-match threshold 0.40m.
# Usage: scripts/eval.sh <checkpoint> <data_root> [extra flags...]
set -e
CKPT=${1:?checkpoint path required}
DATA_ROOT=${2:-data/scannet}
shift 2 || true
python -m omni_pq_tpu.cli.eval \
    --checkpoint_path "$CKPT" \
    --data_root "$DATA_ROOT" \
    --batch_size 16 \
    --nms_iou_quad 0.25 \
    "$@"
