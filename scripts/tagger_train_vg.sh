#!/usr/bin/env bash
# R-Tagger training on VG (reference:
# scripts/verb_tagger/train_vg_RLIP_ParSeD_v2_tagger_resnet.sh: enc 6 /
# dec 3, nq 200, label_noise 0.3 / box_noise 0.6, loss_verb_tagger BCE).
set -e
python main.py \
  --preset rlip_parsed_v2_r50 \
  --dataset_file vg \
  --verb_tagger \
  --label_noise_scale 0.3 --box_noise_scale 0.6 \
  --pretrain_anno "$VG_ANNO" --vg_folder "$VG_DIR" \
  --verb_loss_type bce \
  --epochs 20 --lr_drop 15 \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/tagger_vg "$@"
