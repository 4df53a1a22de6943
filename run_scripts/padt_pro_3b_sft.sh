#!/bin/bash
# PaDT-TPU PRO 3B SFT (reference run_scripts/padt_pro_3b_sft.sh:
# 8 GPUs / ZeRO-3 -> 8-chip fsdp mesh; per-device batch 16, lr 2e-5, bf16).
set -e
cd "$(dirname "$0")/.."
python scripts/sft_train.py \
  --model_name_or_path ckpts/Qwen2.5-VL-3B-Instruct \
  --data_file_paths data/processed/instances_train2017.jsonl:data/processed/refcoco_train.jsonl:data/processed/ric_train.jsonl \
  --image_folders data/coco/train2017:data/coco/train2014:data/coco/train2017 \
  --output_dir outputs/padt_pro_3b \
  --mesh_fsdp 8 \
  --per_device_train_batch_size 16 \
  --learning_rate 2e-5 \
  --num_train_epochs 4 \
  --save_steps 100 \
  --use_mask_loss \
  --resume_from_checkpoint true \
  "$@"
