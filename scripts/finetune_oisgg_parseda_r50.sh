#!/usr/bin/env bash
# Open Images v6 SGG fine-tune, RLIP-ParSeDA r50
# Mirrors reference: scripts/RLIP_ParSeDA/fine_tune_RLIP_ParSeDA_v2_oi_sgg*.sh
set -e
python main.py \
  --preset rlip_parseda_v2_r50 \
  --dataset_file oi_sgg --hoi_path "$OISGG_DIR" \
  --pretrained "$PRETRAIN_CKPT" \
  --negative_text_sampling 500 --sampling_strategy freq \
  --epochs 40 --lr_drop 30 \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/finetune_oisgg_parseda_r50 "$@"
