from rlipv2_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    box_area,
    box_iou,
    generalized_box_iou,
)
from rlipv2_tpu.ops.positional import (
    sine_position_embedding,
    gen_sineembed_for_position,
    inverse_sigmoid,
)
from rlipv2_tpu.ops.ms_deform_attn import (
    ms_deform_attn,
    ms_deform_attn_reference,
)

__all__ = [
    "box_cxcywh_to_xyxy",
    "box_xyxy_to_cxcywh",
    "box_area",
    "box_iou",
    "generalized_box_iou",
    "sine_position_embedding",
    "gen_sineembed_for_position",
    "inverse_sigmoid",
    "ms_deform_attn",
    "ms_deform_attn_reference",
]
