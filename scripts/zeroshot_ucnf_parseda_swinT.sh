#!/usr/bin/env bash
# HICO-DET zero-shot UC-NF (seen-pair training, unseen-pair eval), RLIP-ParSeDA swinT
# Mirrors reference: scripts/RLIP_ParSeDA/fine_tune_RLIP_ParSeDA_v2_hico*_UC-NF.sh
set -e
python main.py \
  --preset rlip_parseda_v2_swin_t \
  --dataset_file hico --hoi_path "$HICO_DIR" \
  --zero_shot_setting UC-NF \
  --pretrained "$PRETRAIN_CKPT" \
  --giou_verb_label \
  --negative_text_sampling 500 --sampling_strategy freq \
  --epochs 60 --lr_drop 40 --use_nms_filter \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/zeroshot_UC-NF_parseda_swinT "$@"
