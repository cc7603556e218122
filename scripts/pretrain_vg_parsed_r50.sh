#!/usr/bin/env bash
# Relational pre-training on VG, RLIP-ParSeD R50
# Mirrors reference: scripts/RLIP_ParSeD/train_RLIP_ParSeD_v2_vg_resnet.sh
set -e
python main.py \
  --preset rlip_parsed_v2_r50 \
  --dataset_file pretrain \
  --pretrain_anno "$VG_ANNO" --vg_folder "$VG_DIR" \
  --negative_text_sampling 500 --sampling_strategy freq \
  --epochs 20 --lr_drop 15 \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/pretrain_vg_parsed_r50 "$@"
