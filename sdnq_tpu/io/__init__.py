from .safetensors_io import save_quantized, load_quantized
from .checkpoint import save_checkpoint, restore_checkpoint

__all__ = ["save_quantized", "load_quantized", "save_checkpoint",
           "restore_checkpoint"]
