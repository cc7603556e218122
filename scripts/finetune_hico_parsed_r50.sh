#!/usr/bin/env bash
# HICO-DET full fine-tune, RLIP-ParSeD (non-DAB deformable) R50
# Mirrors reference: scripts/RLIP_ParSeD/fine_tune_RLIP_ParSeD_v2_hico_r50.sh
set -e
python main.py \
  --preset rlip_parsed_v2_r50 \
  --dataset_file hico --hoi_path "$HICO_DIR" \
  --pretrained "$PRETRAIN_CKPT" \
  --negative_text_sampling 500 --sampling_strategy freq \
  --epochs 60 --lr_drop 40 --use_nms_filter \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/finetune_hico_parsed_r50 "$@"
