from .dit import (
    DiTConfig, init_dit, dit_forward, make_rope_freqs,
    FLUX_DEV_CONFIG, FLUX_TINY_CONFIG,
)

__all__ = [
    "DiTConfig", "init_dit", "dit_forward", "make_rope_freqs",
    "FLUX_DEV_CONFIG", "FLUX_TINY_CONFIG",
]
