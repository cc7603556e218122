#!/usr/bin/env bash
# HICO-DET full fine-tune, Swin-L (reference:
# scripts/RLIP_ParSeDA/fine_tune_RLIP_ParSeDA_v2_hico_swinL.sh).
set -e
python main.py \
  --preset rlip_parseda_v2_swin_large \
  --dataset_file hico --hoi_path "$HICO_DIR" \
  --pretrained "$PRETRAINED_PTH" \
  --epochs 20 --lr_drop 15 \
  --giou_verb_label --ema --remat_encoder \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/finetune_hico_swinL "$@"
