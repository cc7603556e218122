#!/usr/bin/env bash
# Pseudo-label generation over COCO with the trained tagger (reference:
# scripts/verb_tagger/test_Tagger_resnet.sh ->
# generate_relations_using_verb_tagger.py). Produces a VG-format json
# consumed by --dataset_file pretrain with --relation_threshold.
set -e
python -m rlipv2_tpu.tools.generate_relations \
  --checkpoint "$TAGGER_CKPT" \
  --coco_img_folder "$COCO_DIR/train2017" \
  --coco_ann_file "$COCO_DIR/annotations/instances_train2017.json" \
  --rel_candidates "$REL_CANDIDATES_JSON" \
  --relation_threshold 0.2 \
  --out "$OUT_JSON" "$@"
