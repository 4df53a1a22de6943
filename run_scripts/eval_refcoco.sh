#!/bin/bash
# RefCOCO/+/g REC+RES evaluation over all splits
# (reference eval/evaluation_scripts/eval_refcoco.sh iterates 8 splits).
set -e
cd "$(dirname "$0")/.."
MODEL=${MODEL:-ckpts/PaDT_Pro_3B}
DATA_DIR=${DATA_DIR:-data/processed}
IMAGES=${IMAGES:-data/coco/train2014}
OUT=${OUT:-outputs/refcoco}
SUFFIX=${SUFFIX:-padt}

for spec in refcoco_val refcoco_testA refcoco_testB refcoco+_val refcoco+_testA refcoco+_testB refcocog_val refcocog_test; do
  data="$DATA_DIR/${spec}.jsonl"
  [ -f "$data" ] || { echo "skip $spec (no $data)"; continue; }
  echo "== $spec =="
  python scripts/infer_eval.py infer --model "$MODEL" --data "$data" \
    --image_folder "$IMAGES" --dataset "$spec" --batch_size 32 \
    --output_dir "$OUT" --suffix "$SUFFIX" "$@"
  python scripts/infer_eval.py score --task refcoco \
    --pred_glob "$OUT/${spec}_*_pred_results_${SUFFIX}.json" \
    --processed_json "$data"
done
