#!/usr/bin/env bash
# HICO-DET few-shot 10% transfer, RLIP-ParSeDA swinL
# Mirrors reference: scripts/RLIP_ParSeDA/fine_tune_RLIP_ParSeDA_v2_hico*_few-shot.sh
set -e
python main.py \
  --preset rlip_parseda_v2_swin_l \
  --dataset_file hico --hoi_path "$HICO_DIR" \
  --few_shot_transfer 10 \
  --pretrained "$PRETRAIN_CKPT" \
  --giou_verb_label \
  --negative_text_sampling 500 --sampling_strategy freq \
  --epochs 60 --lr_drop 40 --use_nms_filter \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/fewshot10_hico_parseda_swinL "$@"
