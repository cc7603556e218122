"""Model factory: config variant -> model class (replaces the reference's
boolean-selector build in models/detr.py:320-701).

Variant map (BASELINE.json configs):
  parse            — closed-vocab ParSe = RLIPParSe with fixed label texts
  rlip_parse       — vanilla-DETR open-vocab (RLIPParSe)
  rlip_parse_v2    — vanilla-DETR + ALIF interleaved encoder (RLIPParSeV2)
  rlip_parsed      — deformable non-DAB, no ALIF (fusion_type=no_fusion)
  rlip_parsed_v2   — deformable non-DAB + ALIF (RLIPParSeD)
  rlip_parseda_v2  — DAB-deformable + ALIF (RLIPParSeDA, flagship)
"""

from __future__ import annotations

import dataclasses

from rlipv2_tpu.config import FusionConfig, ModelConfig


def build_model(cfg: ModelConfig):
    from rlipv2_tpu.models.parse import RLIPParSe, RLIPParSeV2
    from rlipv2_tpu.models.parsed import RLIPParSeD
    from rlipv2_tpu.models.parseda import RLIPParSeDA

    v = cfg.variant
    if v in ("rlip_parseda_v2",):
        return RLIPParSeDA(cfg)
    if v in ("rlip_parse_v2",):
        return RLIPParSeV2(cfg)
    if v in ("rlip_parsed_v2",):
        return RLIPParSeD(cfg)
    if v in ("rlip_parsed",):
        # v1: same architecture without ALIF fusion
        fusion = dataclasses.replace(cfg.transformer.fusion, fusion_type="no_fusion")
        cfg = dataclasses.replace(
            cfg, transformer=dataclasses.replace(cfg.transformer, fusion=fusion)
        )
        return RLIPParSeD(cfg)
    if v in ("parse", "rlip_parse"):
        return RLIPParSe(cfg)
    if v in ("qpic", "cdn", "qahoi", "ocn", "sep_detr_hoi", "sep_ddetr_hoi_v3"):
        from rlipv2_tpu.models.closed_vocab import (
            CDNModel,
            OCNModel,
            QAHOIModel,
            QPICModel,
            SepDDETRHOIv3Model,
            SepDETRHOIModel,
        )

        return {
            "qpic": QPICModel,
            "cdn": CDNModel,
            "qahoi": QAHOIModel,
            "ocn": OCNModel,
            "sep_detr_hoi": SepDETRHOIModel,
            "sep_ddetr_hoi_v3": SepDDETRHOIv3Model,
        }[v](cfg)
    if v in ("seq_detr_hoi", "stochastic_detr_hoi"):
        from rlipv2_tpu.models.closed_vocab import (
            SeqDETRHOIModel,
            StochasticDETRHOIModel,
        )

        return {
            "seq_detr_hoi": SeqDETRHOIModel,
            "stochastic_detr_hoi": StochasticDETRHOIModel,
        }[v](cfg)
    if v in ("iterative_detr_hoi", "detr_hoi_hm", "coupled_detr_hoi"):
        from rlipv2_tpu.models.closed_vocab import (
            CoupledDETRHOIModel,
            DETRHOIhmModel,
            IterativeDETRHOIModel,
        )

        return {
            "iterative_detr_hoi": IterativeDETRHOIModel,
            "detr_hoi_hm": DETRHOIhmModel,
            "coupled_detr_hoi": CoupledDETRHOIModel,
        }[v](cfg)
    if v == "qahoi_two_stage":
        from rlipv2_tpu.models.closed_vocab import QAHOITwoStageModel

        return QAHOITwoStageModel(cfg)
    if v == "parse_dab_ddetr":
        from rlipv2_tpu.models.closed_vocab import ParSeDABDDETRModel

        return ParSeDABDDETRModel(cfg)
    if v == "parse_dab_detr":
        from rlipv2_tpu.models.dab_detr import ParSeDABDETR

        return ParSeDABDETR(cfg)
    if v == "rlip_mdetr":
        from rlipv2_tpu.models.mdetr import RLIPMDETR

        return RLIPMDETR(cfg)
    if v == "rlip_parse_v1_joint":
        from rlipv2_tpu.models.mdetr import RLIPParSeV1Joint

        return RLIPParSeV1Joint(cfg)
    raise ValueError(f"unknown variant: {v}")
