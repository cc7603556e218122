#!/usr/bin/env bash
# Zero-shot (no fine-tune) HICO evaluation straight from the pre-training
# checkpoint (reference: scripts/RLIP_ParSeDA/zero_shot_RLIP_ParSeDA_v2_swinL.sh).
set -e
python main.py \
  --preset rlip_parseda_v2_swin_large \
  --dataset_file hico --hoi_path "$HICO_DIR" \
  --pretrained "$PRETRAINED_PTH" \
  --eval \
  --tokenizer_dir "$TOKENIZER_DIR" \
  --output_dir output/zeroshot_nf "$@"
