from .matmul import (
    TrainQTensor, make_train_params, train_qlinear, extract_weight_grads,
    apply_weight_updates, value_and_grad, grad, DynamicTensor,
    dynamic_qlinear,
)
from .convert import convert_model_to_training, \
    convert_training_model_to_inference
from .loop import fit, latest_checkpoint_step
from .remat import checkpoint_block, dots_saveable_policy

__all__ = [
    "TrainQTensor", "make_train_params", "train_qlinear",
    "extract_weight_grads", "apply_weight_updates", "value_and_grad",
    "grad", "DynamicTensor", "dynamic_qlinear",
    "convert_model_to_training", "convert_training_model_to_inference",
    "fit", "latest_checkpoint_step", "checkpoint_block",
    "dots_saveable_policy",
]
