from .safetensors_io import save_quantized, load_quantized
from .checkpoint import save_checkpoint, restore_checkpoint
from .hf import (
    stream_state_dict, assemble_params, load_and_quantize_state_dict,
)

__all__ = ["save_quantized", "load_quantized", "save_checkpoint",
           "restore_checkpoint", "stream_state_dict", "assemble_params",
           "load_and_quantize_state_dict"]
