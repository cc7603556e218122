#!/usr/bin/env bash
# Relational pre-training on VG scene graphs, RLIP-ParSeDA swinL
# Mirrors reference: scripts/RLIP_ParSeDA/train_RLIP_ParSeDA_v2_vg*.sh
set -e
python main.py \
  --preset rlip_parseda_v2_swin_l \
  --dataset_file pretrain \
  --pretrain_anno "$VG_ANNO" --vg_folder "$VG_DIR" \
  --negative_text_sampling 500 --sampling_strategy freq \
  --giou_verb_label --pseudo_verb --triplet_filtering \
  --epochs 20 --lr_drop 15 \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/pretrain_vg_parseda_swinL "$@"
