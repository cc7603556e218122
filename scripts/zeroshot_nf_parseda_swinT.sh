#!/usr/bin/env bash
# HICO-DET zero-shot (NF: no fine-tune) eval of the pretrain checkpoint, RLIP-ParSeDA swinT
# Mirrors reference: scripts/RLIP_ParSeDA/zero_shot_RLIP_ParSeDA_v2*.sh
set -e
python main.py \
  --preset rlip_parseda_v2_swin_t \
  --dataset_file hico --hoi_path "$HICO_DIR" \
  --pretrained "$PRETRAIN_CKPT" \
  --eval --use_nms_filter \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/zeroshot_nf_parseda_swinT "$@"
