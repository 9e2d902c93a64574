"""Concrete HF-checkpoint key mappings into the model-zoo param trees.

The reference plugs into ``from_pretrained`` and inherits HF's key layout
for free (/root/reference/src/sdnq/quantizer.py:592-810, loader.py:82-196);
here the mapping is explicit data: each function maps one architecture's
safetensors keys to the functional param-tree paths used by ``models/``.
``load_llama`` / ``load_clip_text`` stream a real checkpoint directory
(config.json + *.safetensors written by ``save_pretrained``) and quantize
eligible weights on the fly.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp

from ..config import QuantConfig
from .hf import load_and_quantize_state_dict

__all__ = ["llama_key_map", "clip_text_key_map", "sd_unet_key_map",
           "llama_config_from_hf", "clip_config_from_hf",
           "load_llama", "load_clip_text"]


def llama_key_map(key: str) -> str | None:
    """transformers LlamaForCausalLM -> models/llm.py tree.

    model.embed_tokens.* / model.layers.N.* / model.norm.* lose the
    ``model.`` prefix; lm_head stays; rotary buffers are dropped."""
    if "rotary_emb" in key:
        return None
    if key.startswith("model."):
        return key[len("model."):]
    if key.startswith("lm_head."):
        return key
    return None


def clip_text_key_map(key: str) -> str | None:
    """transformers CLIPTextModel -> models/text_encoder.py CLIP tree."""
    if "position_ids" in key:
        return None
    if key.startswith("text_model."):
        key = key[len("text_model."):]
    if key.startswith("encoder.layers."):
        return key[len("encoder."):]
    if key.startswith(("embeddings.", "final_layer_norm.")):
        return key
    return None


def sd_unet_key_map(key: str) -> str | None:
    """diffusers UNet2DConditionModel -> models/unet.py tree (names follow
    diffusers, so this is an identity map that drops non-param buffers)."""
    if key.endswith((".running_mean", ".running_var", ".num_batches_tracked")):
        return None
    return key


def _read_hf_config(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


def llama_config_from_hf(path: str):
    """Build an LLMConfig from a checkpoint's config.json."""
    from ..models.llm import LLMConfig
    c = _read_hf_config(path)
    heads = c["num_attention_heads"]
    return LLMConfig(
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=heads,
        num_kv_heads=c.get("num_key_value_heads", heads),
        head_dim=c.get("head_dim") or c["hidden_size"] // heads,
        ff_dim=c["intermediate_size"],
        rope_theta=c.get("rope_theta", 10000.0),
        tie_embeddings=c.get("tie_word_embeddings", False),
    )


def clip_config_from_hf(path: str):
    from ..models.text_encoder import CLIPConfig
    c = _read_hf_config(path)
    if "text_config" in c:
        c = c["text_config"]
    return CLIPConfig(
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=c["num_attention_heads"],
        max_positions=c["max_position_embeddings"],
        intermediate=c["intermediate_size"],
    )


def load_llama(path: str, config: QuantConfig | None = None,
               dtype=jnp.bfloat16, rng=None):
    """Stream + quantize a transformers Llama checkpoint directory.

    Returns (params, LLMConfig, QuantConfig)."""
    llm_cfg = llama_config_from_hf(path)
    params, config = load_and_quantize_state_dict(
        path, config, arch="llama", key_map=llama_key_map,
        kinds={"embed_tokens.weight": "embedding"}, dtype=dtype, rng=rng)
    if llm_cfg.tie_embeddings and "lm_head" not in params:
        params["lm_head"] = {"weight": params["embed_tokens"]["weight"]}
    return params, llm_cfg, config


def load_clip_text(path: str, config: QuantConfig | None = None,
                   dtype=jnp.bfloat16, rng=None):
    """Stream + quantize a transformers CLIPTextModel checkpoint directory.

    Returns (params, CLIPConfig, QuantConfig)."""
    clip_cfg = clip_config_from_hf(path)
    params, config = load_and_quantize_state_dict(
        path, config, arch="clip", key_map=clip_text_key_map,
        kinds={"embeddings.token_embedding.weight": "embedding",
               "embeddings.position_embedding.weight": "embedding"},
        dtype=dtype, rng=rng)
    return params, clip_cfg, config
