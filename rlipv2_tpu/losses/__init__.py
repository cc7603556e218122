from rlipv2_tpu.losses.matcher import (
    hoi_matching_costs,
    hungarian_match,
    lsap_jax,
)
from rlipv2_tpu.losses.criterion import SetCriterionHOI

__all__ = ["hoi_matching_costs", "hungarian_match", "lsap_jax", "SetCriterionHOI"]
