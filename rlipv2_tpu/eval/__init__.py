from rlipv2_tpu.eval.postprocess import postprocess_hoi, postprocess_sgg
from rlipv2_tpu.eval.hico_eval import HICOEvaluator

__all__ = ["postprocess_hoi", "postprocess_sgg", "HICOEvaluator"]
