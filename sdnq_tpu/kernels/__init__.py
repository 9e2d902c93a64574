from .dispatch import kernel_backend, use_pallas, pallas_interpret
from .scaled_mm import scaled_mm, scaled_mm_tn, dynamic_mm_tn, int8_mm, \
    fp8_mm, bf16_scaled_mm
from .dequant_mm import dequant_matmul

__all__ = [
    "kernel_backend",
    "use_pallas",
    "pallas_interpret",
    "scaled_mm",
    "scaled_mm_tn",
    "dynamic_mm_tn",
    "int8_mm",
    "fp8_mm",
    "bf16_scaled_mm",
    "dequant_matmul",
]
