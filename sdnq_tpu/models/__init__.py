from .dit import (
    DiTConfig, init_dit, dit_forward, make_rope_freqs, stack_dit_blocks,
    make_staged_dit_forward, FLUX_DEV_CONFIG, FLUX_TINY_CONFIG,
)
from .unet import (
    UNetConfig, SD15_CONFIG, SDXL_CONFIG, UNET_TINY_CONFIG,
    make_staged_unet_forward,
    init_unet, unet_forward,
)
from .vae import (
    VAEConfig, SD_VAE_CONFIG, VAE_TINY_CONFIG, init_vae, vae_decode,
    vae_encode,
)
from .llm import (
    LLMConfig, LLM_TINY_CONFIG, init_llm, llm_forward, generate,
    stack_llm_blocks,
)
from .moe import (
    MoEConfig, MOE_TINY_CONFIG, init_moe, moe_ffn, quantize_moe,
    shard_moe,
)
from .text_encoder import (
    CLIPConfig, T5Config, CLIP_TINY_CONFIG, T5_TINY_CONFIG,
    init_clip, clip_encode, init_t5, t5_encode,
)

__all__ = [
    "DiTConfig", "init_dit", "dit_forward", "make_rope_freqs",
    "stack_dit_blocks", "make_staged_dit_forward",
    "FLUX_DEV_CONFIG", "FLUX_TINY_CONFIG",
    "UNetConfig", "SD15_CONFIG", "SDXL_CONFIG", "UNET_TINY_CONFIG",
    "make_staged_unet_forward",
    "init_unet", "unet_forward",
    "VAEConfig", "SD_VAE_CONFIG", "VAE_TINY_CONFIG", "init_vae",
    "vae_decode", "vae_encode",
    "CLIPConfig", "T5Config", "CLIP_TINY_CONFIG", "T5_TINY_CONFIG",
    "init_clip", "clip_encode", "init_t5", "t5_encode",
    "LLMConfig", "LLM_TINY_CONFIG", "init_llm", "llm_forward", "generate",
    "stack_llm_blocks",
    "MoEConfig", "MOE_TINY_CONFIG", "init_moe", "moe_ffn", "quantize_moe",
    "shard_moe",
]
