"""rlipv2_tpu — a TPU-native JAX/XLA/Pallas framework for relational
language-image pre-training (RLIPv2 capabilities, rebuilt TPU-first).

Layering (bottom-up):
  ops/       pure-function tensor ops: boxes, positional encodings,
             multi-scale deformable attention (XLA + Pallas kernels).
  models/    flax.linen modules: backbones (ResNet/Swin), RoBERTa text
             encoder, ALIF fusion encoder, DAB-deformable ParSe decoders,
             the RLIP-ParSeDA flagship model.
  losses/    Hungarian set matching + the HOI loss suite.
  data/      static-shape data pipeline: bucketing, label-text merging,
             negative sampling, dataset readers.
  eval/      HICO-DET / V-COCO / OI-SGG evaluators + postprocessing.
  engine/    pjit train/eval steps, optimizer groups, checkpointing.
  parallel/  mesh construction and sharding rules.

Reference capability map: see SURVEY.md at the repo root. The upstream
PyTorch implementation is JacobYuan7/RLIPv2 (ICCV 2023).
"""

__version__ = "0.1.0"
