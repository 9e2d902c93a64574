from .base import OptConfig, QOptimizer, BufferQ, quantize_buffer, \
    dequantize_buffer, offload_opt_state, fetch_opt_state, \
    cast_state_for_transfer, cast_state_from_transfer
from .optimizers import adamw, lion, adafactor, came, make_optimizer
from .muon import muon, zeropower_via_newtonschulz5

__all__ = [
    "OptConfig", "QOptimizer", "BufferQ", "quantize_buffer",
    "dequantize_buffer", "adamw", "lion", "adafactor", "came",
    "make_optimizer", "muon", "zeropower_via_newtonschulz5",
    "offload_opt_state", "fetch_opt_state",
    "cast_state_for_transfer", "cast_state_from_transfer",
]
