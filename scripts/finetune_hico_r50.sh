#!/usr/bin/env bash
# HICO-DET full fine-tune, R50 (reference:
# scripts/RLIP_ParSeDA/fine_tune_RLIP_ParSeDA_v2_hico_resnet.sh).
set -e
python main.py \
  --preset rlip_parseda_v2_r50 \
  --dataset_file hico --hoi_path "$HICO_DIR" \
  --pretrained "$PRETRAINED_PTH" \
  --epochs 20 --lr_drop 15 --lr 1e-4 --lr_backbone 1e-5 --lr_text_encoder 1e-5 \
  --giou_verb_label --ema \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/finetune_hico_r50 "$@"
