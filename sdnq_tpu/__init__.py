"""SDNQ-TPU: a TPU-native quantized inference & training engine.

Brand-new JAX/XLA/Pallas implementation of the capability space of
Disty0/sdnq (reference mounted at /root/reference): 1-16 bit int/uint/fp/ufp
weight storage with group-wise scales, Hadamard rotation, SVD low-rank
correction, fused INT8/FP8 quantized matmul and quantized flash attention —
plus the multi-chip execution layer (mesh/pjit sharding, quantized
collectives) the reference delegates to torch FSDP.
"""

__version__ = "0.1.0"

from .formats import (
    FORMATS,
    WEIGHTS_DTYPE_ORDER,
    ACCEPTED_MATMUL_DTYPES,
    Format,
    get_format,
    resolve_alias,
    default_matmul_format,
)
from .config import QuantConfig
from .tensor import QTensor, QuantMeta, quantize_tensor, dequantize
from .dynamic import quantize_tensor_dynamic, quantization_loss
from .apply import quantize_model, dequantize_model, model_memory_footprint
from .layers import qlinear, qconv, qembedding
from .options import apply_options_to_model, requantize_model

__all__ = [
    "FORMATS",
    "WEIGHTS_DTYPE_ORDER",
    "ACCEPTED_MATMUL_DTYPES",
    "Format",
    "get_format",
    "resolve_alias",
    "default_matmul_format",
    "QuantConfig",
    "QTensor",
    "QuantMeta",
    "quantize_tensor",
    "dequantize",
    "quantize_tensor_dynamic",
    "quantization_loss",
    "quantize_model",
    "dequantize_model",
    "model_memory_footprint",
    "qlinear",
    "qconv",
    "qembedding",
    "apply_options_to_model",
    "requantize_model",
    "__version__",
]
