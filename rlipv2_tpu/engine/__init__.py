from rlipv2_tpu.engine.optim import build_optimizer, learning_rate_schedule
from rlipv2_tpu.engine.train import (
    TrainState,
    create_train_state,
    fsdp_state_sharding,
    hybrid_state_sharding,
    tp_state_sharding,
    make_train_step,
)

__all__ = [
    "build_optimizer",
    "learning_rate_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "fsdp_state_sharding",
    "hybrid_state_sharding",
    "tp_state_sharding",
]
