#!/usr/bin/env bash
# HICO-DET full fine-tune, RLIP-ParSeDA swinL (giou_verb_label RPL + pseudo_verb as in the canonical config)
# Mirrors reference: scripts/RLIP_ParSeDA/fine_tune_RLIP_ParSeDA_v2_hico_swinL.sh
set -e
python main.py \
  --preset rlip_parseda_v2_swin_l \
  --dataset_file hico --hoi_path "$HICO_DIR" \
  --pretrained "$PRETRAIN_CKPT" \
  --giou_verb_label --pseudo_verb \
  --negative_text_sampling 500 --sampling_strategy freq \
  --epochs 60 --lr_drop 40 --lr 1e-4 --lr_backbone 1e-5 --lr_text_encoder 1e-5 \
  --use_nms_filter \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/finetune_hico_parseda_swinL "$@"
