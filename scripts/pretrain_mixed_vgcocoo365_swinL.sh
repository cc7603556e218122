#!/usr/bin/env bash
# Relational pre-training on VG + pseudo-labelled COCO + O365, Swin-L.
# Canonical hyperparameters (reference:
# scripts/RLIP_ParSeDA/train_RLIP_ParSeDA_v2_mixed_vgcocoo365_swinL.sh:
# enc 6 / dec 3, nq 200, GLIP_attn + VXAc + vanilla_MBF, fusion_interval 2,
# fusion_last_vis, lang_aux_loss, GIoU-soft verb labels, pseudo_verb,
# relation_threshold 0.2, 500 freq-sampled negative texts) are pinned in
# the rlip_parseda_v2_swin_large preset.
set -e
python main.py \
  --preset rlip_parseda_v2_swin_large \
  --dataset_file pretrain \
  --pretrain_anno "$PRETRAIN_ANNO" \
  --vg_folder "$VG_DIR" --coco2017_folder "$COCO_DIR" --o365_folder "$O365_DIR" \
  --iterative_paradigm 0,1,2 \
  --relation_threshold 0.2 --pair_overlap \
  --negative_text_sampling 500 --sampling_strategy freq \
  --giou_verb_label --pseudo_verb --pseudo_verb_mode online \
  --triplet_filtering \
  --remat_encoder --ema \
  --epochs 20 --lr_drop 15 --batch_size 8 \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/pretrain_mixed_swinL "$@"
