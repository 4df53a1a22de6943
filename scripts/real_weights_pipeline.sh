#!/usr/bin/env bash
# Real-checkpoint parity pipeline — the ONE command to run the moment the
# released PaDT weights are stageable in this environment (BASELINE.md
# "parity targets"; blocked today only by zero network egress).
#
# Stage the following anywhere (e.g. /ckpts) and point the env vars at them:
#   PADT_HF_CKPT    - HF checkpoint dir of PaDT-MLLM/PaDT_Pro_3B (safetensors
#                     + config.json with the embedded vl_decoder dict)
#                     [tokenizer files may live here too — Qwen2.5-VL tokenizer:
#                      vocab.json, merges.txt, tokenizer_config.json,
#                      chat_template, preprocessor_config.json]
#   PADT_DEMO_IMG   - the reference demo image (reference
#                     eval/imgs/000000368335.jpg)
#   PADT_COCO_VAL   - (optional) preprocessed COCO val JSONL + image folder
#   PADT_REFCOCO    - (optional) preprocessed RefCOCO split JSONLs
#
# What it proves, in order:
#   1. convert: HF -> native orbax (scripts/convert_checkpoint.py handles the
#      4.50-era key layout; config captured into checkpoint metadata)
#   2. golden demo gate: greedy REC on the demo image must reproduce the
#      committed completion `...<|VRT_122|><|VRT_107|><|VRT_138|><|VRT_256|>
#      <|VRT_135|>...` (reference eval/outputs/demo/completion.txt:7) and the
#      demo box/mask — the end-to-end single-sample oracle
#   3. (optional) COCO OVD mAP + RefCOCO AP@0.5/cIoU on the real splits via
#      the eval harness; JSONL outputs are schema-identical to the
#      reference's (utils.py:249-266), so the reference's own
#      eval_coco.py/eval_refcoco.py can re-score them unchanged as a
#      cross-check of our in-repo scorers.
set -euo pipefail
cd "$(dirname "$0")/.."

: "${PADT_HF_CKPT:?stage the released HF checkpoint and set PADT_HF_CKPT}"
: "${PADT_DEMO_IMG:?stage the demo image and set PADT_DEMO_IMG}"
NATIVE=${PADT_NATIVE_DIR:-ckpts/padt_pro_3b_tpu}
# Rehearsal knobs (tests/test_pipeline_rehearsal.py drives every stage of
# this script with a tiny synthetic checkpoint so the weights-arrival path is
# KNOWN to work end-to-end, not merely staged):
#   PADT_GOLDEN_VRTS - override the expected demo VRT sequence (real default
#                      below; the rehearsal injects the tiny model's output)
#   PADT_DEMO_ARGS   - extra scripts/demo.py args (e.g. --max_new_tokens 8)
#   PADT_INFER_ARGS  - extra infer args for the eval stages (argparse
#                      last-wins, so e.g. --batch_size 2 overrides)
GOLDEN=${PADT_GOLDEN_VRTS-122,107,138,256,135}

echo "== 1/3 convert HF -> native =="
python scripts/convert_checkpoint.py --src "$PADT_HF_CKPT" --dst "$NATIVE"

echo "== 2/3 golden demo gate =="
# shellcheck disable=SC2086
python scripts/demo.py \
  --model "$NATIVE" \
  --image "$PADT_DEMO_IMG" \
  --prompt 'the car is on the left side of the horse' \
  --check-golden --golden_vrts "$GOLDEN" ${PADT_DEMO_ARGS:-}

if [[ -n "${PADT_COCO_VAL:-}" ]]; then
  echo "== 3/3a COCO OVD eval =="
  # shellcheck disable=SC2086
  MODEL="$NATIVE" DATA="$PADT_COCO_VAL" bash run_scripts/eval_coco.sh ${PADT_INFER_ARGS:-}
fi
if [[ -n "${PADT_REFCOCO:-}" ]]; then
  echo "== 3/3b RefCOCO eval =="
  # shellcheck disable=SC2086
  MODEL="$NATIVE" DATA_DIR="$PADT_REFCOCO" bash run_scripts/eval_refcoco.sh ${PADT_INFER_ARGS:-}
fi
echo "ALL GATES PASSED"
