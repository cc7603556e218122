#!/usr/bin/env bash
# Few-shot 1% transfer (reference: --few_shot_transfer 1 scripts; the 1%
# subset json comes from tools/convert_annotations.py
# sample_percentage_annotations).
set -e
python main.py \
  --preset rlip_parseda_v2_r50 \
  --dataset_file hico --hoi_path "$HICO_DIR" \
  --pretrained "$PRETRAINED_PTH" \
  --few_shot_transfer 1 \
  --epochs 10 --lr_drop 7 --giou_verb_label \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/fewshot_hico_1pct "$@"
