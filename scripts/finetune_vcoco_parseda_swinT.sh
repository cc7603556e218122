#!/usr/bin/env bash
# V-COCO fine-tune, RLIP-ParSeDA swinT
# Mirrors reference: scripts/RLIP_ParSeDA/fine_tune_RLIP_ParSeDA_v2_vcoco*.sh
set -e
python main.py \
  --preset rlip_parseda_v2_swin_t \
  --dataset_file vcoco --hoi_path "$VCOCO_DIR" \
  --pretrained "$PRETRAIN_CKPT" \
  --negative_text_sampling 500 --sampling_strategy freq \
  --epochs 60 --lr_drop 40 --use_nms_filter \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/finetune_vcoco_parseda_swinT "$@"
