#!/bin/bash
# COCO OVD evaluation (reference eval/evaluation_scripts/eval_coco.sh):
# batched inference -> per-host JSONL -> mAP scoring.
set -e
cd "$(dirname "$0")/.."
MODEL=${MODEL:-ckpts/PaDT_OVD_3B}
DATA=${DATA:-data/processed/instances_val2017.jsonl}
IMAGES=${IMAGES:-data/coco/val2017}
COCO_JSON=${COCO_JSON:-data/coco/annotations/instances_val2017.json}
OUT=${OUT:-outputs/coco}
SUFFIX=${SUFFIX:-padt}

python scripts/infer_eval.py infer --model "$MODEL" --data "$DATA" \
  --image_folder "$IMAGES" --dataset coco --batch_size 16 \
  --output_dir "$OUT" --suffix "$SUFFIX" "$@"
python scripts/infer_eval.py score --task coco \
  --pred_glob "$OUT/coco_*_pred_results_${SUFFIX}.json" \
  --processed_json "$DATA" --coco_json "$COCO_JSON"
