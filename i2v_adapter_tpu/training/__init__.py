from i2v_adapter_tpu.training.state import (
    TrainState,
    create_train_state,
    partition_params,
    merge_params,
    trainable_predicate,
)
from i2v_adapter_tpu.training.train_i2v import make_train_step

__all__ = [
    "TrainState",
    "create_train_state",
    "partition_params",
    "merge_params",
    "trainable_predicate",
    "make_train_step",
]
