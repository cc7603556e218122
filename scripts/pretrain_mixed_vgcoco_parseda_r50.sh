#!/usr/bin/env bash
# Mixed VG+COCO relational pre-training (interleaved batches, one accumulated step per dataset pair), RLIP-ParSeDA r50
# Mirrors reference: scripts/RLIP_ParSeDA/train_RLIP_ParSeDA_v2_mixed_vgcoco*.sh
set -e
python main.py \
  --preset rlip_parseda_v2_r50 \
  --dataset_file pretrain \
  --pretrain_anno "$VG_ANNO,$COCO_REL_ANNO" \
  --vg_folder "$VG_DIR" --coco2017_folder "$COCO_DIR" \
  --iterative_paradigm 0,1 \
  --relation_threshold 0.2 --pair_overlap \
  --negative_text_sampling 500 --sampling_strategy freq \
  --giou_verb_label --pseudo_verb --triplet_filtering \
  --epochs 20 --lr_drop 15 \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/pretrain_mixed_vgcoco_parseda_r50 "$@"
