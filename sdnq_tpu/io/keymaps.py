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
from .hf import (CheckpointCoverageError, check_tree_coverage,
                 load_and_quantize_state_dict)

__all__ = ["llama_key_map", "clip_text_key_map", "sd_unet_key_map",
           "flux_key_map", "fuse_flux_params", "flux_config_from_hf",
           "llama_config_from_hf", "clip_config_from_hf",
           "load_llama", "load_clip_text", "load_flux",
           "t5_key_map", "t5_config_from_hf", "load_t5",
           "vae_key_map", "vae_config_from_hf", "load_vae"]


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
               dtype=jnp.bfloat16, rng=None, strict: bool = True):
    """Stream + quantize a transformers Llama checkpoint directory.

    Returns (params, LLMConfig, QuantConfig).  ``strict`` (default) fails
    loudly on unconsumed checkpoint keys and on any mismatch between the
    assembled tree and the model structure (missing/renamed keys cannot
    silently drop — reference guarantee: loader.py:82-196)."""
    import jax as _jax
    llm_cfg = llama_config_from_hf(path)
    params, config = load_and_quantize_state_dict(
        path, config, arch="llama", key_map=llama_key_map,
        kinds={"embed_tokens.weight": "embedding"}, dtype=dtype, rng=rng,
        known_skips=("rotary_emb",), strict=strict)
    if strict:
        from ..models.llm import init_llm
        check_tree_coverage(
            params, _jax.eval_shape(
                lambda: init_llm(_jax.random.key(0), llm_cfg)),
            what="llama")
    if llm_cfg.tie_embeddings and "lm_head" not in params:
        params["lm_head"] = {"weight": params["embed_tokens"]["weight"]}
    return params, llm_cfg, config


def load_clip_text(path: str, config: QuantConfig | None = None,
                   dtype=jnp.bfloat16, rng=None, strict: bool = True):
    """Stream + quantize a transformers CLIPTextModel checkpoint directory.

    Returns (params, CLIPConfig, QuantConfig)."""
    import jax as _jax
    clip_cfg = clip_config_from_hf(path)
    params, config = load_and_quantize_state_dict(
        path, config, arch="clip", key_map=clip_text_key_map,
        kinds={"embeddings.token_embedding.weight": "embedding",
               "embeddings.position_embedding.weight": "embedding"},
        dtype=dtype, rng=rng,
        known_skips=("position_ids", "text_projection", "logit_scale"),
        strict=strict)
    if strict:
        from ..models.text_encoder import init_clip
        check_tree_coverage(
            params, _jax.eval_shape(
                lambda: init_clip(_jax.random.key(0), clip_cfg)),
            what="clip")
    return params, clip_cfg, config


# ---------------------------------------------------------------------------
# Flux (diffusers FluxTransformer2DModel -> models/dit.py tree)
# ---------------------------------------------------------------------------

_FLUX_TOP = {
    "time_text_embed.timestep_embedder.linear_1": "time_in.fc1",
    "time_text_embed.timestep_embedder.linear_2": "time_in.fc2",
    "time_text_embed.text_embedder.linear_1": "vector_in.fc1",
    "time_text_embed.text_embedder.linear_2": "vector_in.fc2",
    "time_text_embed.guidance_embedder.linear_1": "guidance_in.fc1",
    "time_text_embed.guidance_embedder.linear_2": "guidance_in.fc2",
}

_FLUX_DOUBLE = {
    "norm1.linear": "img_mod.linear",
    "norm1_context.linear": "txt_mod.linear",
    "attn.to_q": "img_attn.q", "attn.to_k": "img_attn.k",
    "attn.to_v": "img_attn.v",
    "attn.norm_q": "img_attn.norm_q", "attn.norm_k": "img_attn.norm_k",
    "attn.add_q_proj": "txt_attn.q", "attn.add_k_proj": "txt_attn.k",
    "attn.add_v_proj": "txt_attn.v",
    "attn.norm_added_q": "txt_attn.norm_q",
    "attn.norm_added_k": "txt_attn.norm_k",
    "attn.to_out.0": "img_attn.proj", "attn.to_add_out": "txt_attn.proj",
    "ff.net.0.proj": "img_mlp.fc1", "ff.net.2": "img_mlp.fc2",
    "ff_context.net.0.proj": "txt_mlp.fc1", "ff_context.net.2": "txt_mlp.fc2",
}

_FLUX_SINGLE = {
    "norm.linear": "norm.linear",
    "attn.to_q": "q", "attn.to_k": "k", "attn.to_v": "v",
    "attn.norm_q": "norm_q", "attn.norm_k": "norm_k",
    "proj_mlp": "mlp_in",
    "proj_out": "linear2",
}


def flux_key_map(key: str) -> str | None:
    """diffusers FluxTransformer2DModel -> models/dit.py tree.

    Separate to_q/to_k/to_v (and the single blocks' proj_mlp) land on
    staging names; ``fuse_flux_params`` concatenates them into the fused
    qkv / linear1 operands the BFL-style forward consumes, and swaps
    norm_out's [scale, shift] row order (diffusers AdaLayerNormContinuous)
    to this tree's [shift, scale]."""
    leaf = key.rsplit(".", 1)[-1]            # weight / bias
    stem = key[: -(len(leaf) + 1)]
    if stem in ("x_embedder", "context_embedder", "proj_out",
                "norm_out.linear"):
        return key
    if stem in _FLUX_TOP:
        return f"{_FLUX_TOP[stem]}.{leaf}"
    for prefix, table in (("transformer_blocks.", _FLUX_DOUBLE),
                          ("single_transformer_blocks.", _FLUX_SINGLE)):
        if stem.startswith(prefix):
            rest = stem[len(prefix):]
            idx, sub = rest.split(".", 1)
            if sub in table:
                return f"{prefix}{idx}.{table[sub]}.{leaf}"
            return None
    return None


def _concat_linear(parts, names):
    import jax.numpy as _jnp
    out = {}
    ws = [parts[n]["weight"] for n in names]
    out["weight"] = _jnp.concatenate(ws, axis=0)
    if "bias" in parts[names[0]]:
        out["bias"] = _jnp.concatenate([parts[n]["bias"] for n in names],
                                       axis=0)
    return out


def fuse_flux_params(params: dict) -> dict:
    """Post-pass after ``flux_key_map`` assembly: fuse q/k/v (+mlp_in) into
    the qkv / linear1 operands and fix the norm_out chunk order."""
    import jax.numpy as _jnp
    for blk in params.get("transformer_blocks", []):
        for attn_name in ("img_attn", "txt_attn"):
            attn = blk[attn_name]
            attn["qkv"] = _concat_linear(attn, ("q", "k", "v"))
            for n in ("q", "k", "v"):
                del attn[n]
    for blk in params.get("single_transformer_blocks", []):
        blk["linear1"] = _concat_linear(blk, ("q", "k", "v", "mlp_in"))
        for n in ("q", "k", "v", "mlp_in"):
            del blk[n]
    # diffusers AdaLayerNormContinuous emits [scale, shift]; this tree's
    # final norm consumes [shift, scale]
    no = params["norm_out"]["linear"]
    h = no["weight"].shape[0] // 2
    no["weight"] = _jnp.concatenate([no["weight"][h:], no["weight"][:h]],
                                    axis=0)
    if "bias" in no:
        no["bias"] = _jnp.concatenate([no["bias"][h:], no["bias"][:h]],
                                      axis=0)
    return params


def flux_config_from_hf(path: str):
    from ..models.dit import DiTConfig
    c = _read_hf_config(path)
    heads = c.get("num_attention_heads", 24)
    hd = c.get("attention_head_dim", 128)
    return DiTConfig(
        in_channels=c.get("in_channels", 64),
        hidden_size=heads * hd,
        num_heads=heads,
        depth_double=c.get("num_layers", 19),
        depth_single=c.get("num_single_layers", 38),
        txt_dim=c.get("joint_attention_dim", 4096),
        vec_dim=c.get("pooled_projection_dim", 768),
        axes_dims=tuple(c.get("axes_dims_rope", (16, 56, 56))),
        guidance_embed=c.get("guidance_embeds", True),
    )


def load_flux(path: str, config: QuantConfig | None = None,
              dtype=jnp.bfloat16, rng=None, strict: bool = True):
    """Stream a diffusers Flux transformer checkpoint, fuse q/k/v into the
    BFL-style operands, then quantize (fusion must precede quantization,
    so this assembles raw and applies apply.quantize_model afterwards).

    Returns (qparams, DiTConfig, QuantConfig).  ``strict`` (default) fails
    loudly on unconsumed checkpoint keys and any structural mismatch vs
    ``init_dit`` of the parsed config."""
    import jax as _jax
    from ..apply import quantize_model
    from .hf import assemble_params, stream_state_dict, _torch_to_np

    dit_cfg = flux_config_from_hf(path)
    if config is None:
        config = QuantConfig()
    unmapped: list[str] = []

    def items():
        for key, tensor in stream_state_dict(path):
            mapped = flux_key_map(key)
            if mapped is None:
                unmapped.append(key)
                continue
            yield mapped, jnp.asarray(_torch_to_np(tensor), dtype)

    params = fuse_flux_params(assemble_params(items()))
    if strict:
        if unmapped:
            raise CheckpointCoverageError(
                f"flux: {len(unmapped)} checkpoint key(s) not consumed by "
                "flux_key_map: " + ", ".join(unmapped[:20])
                + (" ..." if len(unmapped) > 20 else ""))
        from ..models.dit import init_dit
        check_tree_coverage(
            params, _jax.eval_shape(
                lambda: init_dit(_jax.random.key(0), dit_cfg)),
            what="flux")
    qparams, config = quantize_model(params, config,
                                     arch="FluxTransformer2DModel")
    return qparams, dit_cfg, config


# ---------------------------------------------------------------------------
# T5 encoder (transformers T5EncoderModel -> models/text_encoder.py T5 tree)
# ---------------------------------------------------------------------------

def t5_key_map(key: str) -> str | None:
    """transformers T5EncoderModel -> models/text_encoder.py T5 tree.

    ``encoder.block.N.layer.0.*`` (self-attention + its layer_norm) and
    ``layer.1.*`` (gated-gelu DenseReluDense) flatten into one block dict;
    the relative-attention bias table lives only in block 0 and hoists to
    the tree root.  Only the gated (wi_0/wi_1) feed-forward variant is
    supported — T5 v1.1 / flan / the SD3+Flux T5-XXL all use it."""
    if key == "shared.weight":
        return key
    if key == "encoder.embed_tokens.weight":
        return None                      # duplicate view of shared.weight
    if key == "encoder.final_layer_norm.weight":
        return "final_layer_norm.weight"
    if key.startswith("encoder.block."):
        rest = key[len("encoder.block."):]
        idx, sub = rest.split(".", 1)
        if sub == "layer.0.SelfAttention.relative_attention_bias.weight":
            return "relative_attention_bias.weight"
        if sub.startswith("layer.0.SelfAttention."):
            return f"block.{idx}.SelfAttention." \
                   f"{sub[len('layer.0.SelfAttention.'):]}"
        if sub == "layer.0.layer_norm.weight":
            return f"block.{idx}.layer_norm0.weight"
        if sub.startswith("layer.1.DenseReluDense."):
            return f"block.{idx}.DenseReluDense." \
                   f"{sub[len('layer.1.DenseReluDense.'):]}"
        if sub == "layer.1.layer_norm.weight":
            return f"block.{idx}.layer_norm1.weight"
    return None


def t5_config_from_hf(path: str):
    from ..models.text_encoder import T5Config
    c = _read_hf_config(path)
    return T5Config(
        vocab_size=c["vocab_size"],
        hidden_size=c["d_model"],
        num_layers=c["num_layers"],
        num_heads=c["num_heads"],
        head_dim=c.get("d_kv", c["d_model"] // c["num_heads"]),
        ff_dim=c["d_ff"],
        rel_buckets=c.get("relative_attention_num_buckets", 32),
        rel_max_distance=c.get("relative_attention_max_distance", 128),
    )


def load_t5(path: str, config: QuantConfig | None = None,
            dtype=jnp.bfloat16, rng=None, strict: bool = True):
    """Stream + quantize a transformers T5EncoderModel checkpoint
    directory.  Returns (params, T5Config, QuantConfig)."""
    import jax as _jax
    t5_cfg = t5_config_from_hf(path)
    params, config = load_and_quantize_state_dict(
        path, config, arch="t5", key_map=t5_key_map,
        kinds={"shared.weight": "embedding",
               "relative_attention_bias.weight": "embedding"},
        dtype=dtype, rng=rng,
        known_skips=("encoder.embed_tokens.weight",), strict=strict)
    if strict:
        from ..models.text_encoder import init_t5
        check_tree_coverage(
            params, _jax.eval_shape(
                lambda: init_t5(_jax.random.key(0), t5_cfg)),
            what="t5")
    return params, t5_cfg, config


# ---------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL -> models/vae.py tree)
# ---------------------------------------------------------------------------

def vae_key_map(key: str) -> str | None:
    """diffusers AutoencoderKL -> models/vae.py tree.

    Names already align (the tree was written against diffusers); the only
    rewrites are the attention blocks' ``to_out.0`` (torch ModuleList) ->
    ``to_out`` and legacy ``.query/.key/.value/.proj_attn`` names from
    pre-0.19 diffusers checkpoints.  ``quant_conv``/``post_quant_conv``
    stay top-level — vae_encode/vae_decode consume them when present."""
    if key.endswith((".running_mean", ".running_var",
                     ".num_batches_tracked")):
        return None
    key = key.replace(".to_out.0.", ".to_out.")
    for old, new in ((".query.", ".to_q."), (".key.", ".to_k."),
                     (".value.", ".to_v."), (".proj_attn.", ".to_out.")):
        key = key.replace(old, new)
    return key


def vae_config_from_hf(path: str):
    from ..models.vae import VAEConfig
    c = _read_hf_config(path)
    mults = [bc // c["block_out_channels"][0]
             for bc in c["block_out_channels"]]
    return VAEConfig(
        latent_channels=c.get("latent_channels", 4),
        base_channels=c["block_out_channels"][0],
        channel_mults=tuple(mults),
        layers_per_block=c.get("layers_per_block", 2),
        out_channels=c.get("out_channels", 3),
        norm_groups=c.get("norm_num_groups", 32),
        scaling_factor=c.get("scaling_factor", 0.18215),
    )


def load_vae(path: str, config: QuantConfig | None = None,
             dtype=jnp.bfloat16, rng=None, strict: bool = True):
    """Stream + quantize a diffusers AutoencoderKL checkpoint directory.
    Returns (params, VAEConfig, QuantConfig).

    Conv weights stay OIHW (qconv transposes at trace time); by default
    the VAE is left unquantized like the reference's skip-list does for
    VAE modules (policy.MODEL_SKIP_KEYS) unless the QuantConfig says
    otherwise."""
    import jax as _jax
    vae_cfg = vae_config_from_hf(path)
    params, config = load_and_quantize_state_dict(
        path, config, arch="vae", key_map=vae_key_map, dtype=dtype, rng=rng,
        known_skips=(".running_mean", ".running_var",
                     ".num_batches_tracked"),
        strict=strict)
    if strict:
        from ..models.vae import init_vae
        check_tree_coverage(
            params, _jax.eval_shape(
                lambda: init_vae(_jax.random.key(0), vae_cfg)),
            what="vae",
            optional=("quant_conv", "post_quant_conv"))
    return params, vae_cfg, config
