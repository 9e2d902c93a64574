from .core import (
    get_scale_symmetric,
    get_scale_asymmetric,
    quantize_weight,
    dequantize_values,
    quantize_int_mm,
    quantize_uint_mm,
    quantize_fp_mm,
)
from .hadamard import (
    hadamard_matrix,
    rotate_hadamard,
    apply_hadamard,
    get_hadamard_group_size,
)
from .svd import svd_lowrank, apply_svdquant

__all__ = [
    "get_scale_symmetric",
    "get_scale_asymmetric",
    "quantize_weight",
    "dequantize_values",
    "quantize_int_mm",
    "quantize_uint_mm",
    "quantize_fp_mm",
    "hadamard_matrix",
    "rotate_hadamard",
    "apply_hadamard",
    "get_hadamard_group_size",
    "svd_lowrank",
    "apply_svdquant",
]
