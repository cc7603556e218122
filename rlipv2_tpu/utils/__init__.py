from rlipv2_tpu.utils.logging import MetricLogger, SmoothedValue

__all__ = ["MetricLogger", "SmoothedValue"]
