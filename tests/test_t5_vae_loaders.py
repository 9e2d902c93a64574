"""T5 + VAE checkpoint loaders (round-3 VERDICT item 6).

T5: genuine transformers T5EncoderModel checkpoint via save_pretrained,
streamed through io/keymaps.load_t5, activation parity against the torch
forward (same guarantee class as the LLaMA/CLIP tests).

VAE: diffusers is not installed in this environment, so the loader is
validated against a synthetic checkpoint in the exact diffusers
AutoencoderKL key layout (incl. quant_conv/post_quant_conv and the
``to_out.0`` ModuleList naming) with a numerics round-trip through our own
init_vae tree."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from sdnq_tpu import QuantConfig, QTensor
from sdnq_tpu.io import load_t5, load_vae
from sdnq_tpu.io.keymaps import vae_key_map
from sdnq_tpu.models.text_encoder import t5_encode
from sdnq_tpu.models.vae import (
    VAE_TINY_CONFIG, init_vae, vae_decode, vae_encode,
)


@pytest.fixture(scope="module")
def t5_ckpt(tmp_path_factory):
    from transformers import T5Config, T5EncoderModel
    torch.manual_seed(0)
    cfg = T5Config(
        vocab_size=256, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
        decoder_start_token_id=0)
    model = T5EncoderModel(cfg).eval()
    path = tmp_path_factory.mktemp("t5")
    model.save_pretrained(path, safe_serialization=True)
    g = torch.Generator().manual_seed(1)
    ids = torch.randint(1, 250, (2, 24), generator=g)
    with torch.no_grad():
        ref = model(ids).last_hidden_state.float().numpy()
    return str(path), np.asarray(ids.numpy()), ref


def test_t5_checkpoint_unquantized_parity(t5_ckpt):
    path, ids, ref = t5_ckpt
    params, cfg, _ = load_t5(
        path, QuantConfig(modules_to_not_convert=["*"]), dtype=jnp.float32)
    assert cfg.num_layers == 2 and cfg.head_dim == 16
    h = t5_encode(params, jnp.asarray(ids), cfg)
    rel = np.abs(np.asarray(h) - ref).max() / np.abs(ref).max()
    assert rel < 2e-3, rel


def test_t5_checkpoint_int8_within_threshold(t5_ckpt):
    path, ids, ref = t5_ckpt
    cfg_q = QuantConfig(weights_dtype="int8", minimum_allowed_numel=1024,
                        minimum_allowed_channel_size=16)
    params, cfg, _ = load_t5(path, cfg_q, dtype=jnp.float32)
    leaves = jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, QTensor))
    assert any(isinstance(x, QTensor) for x in leaves)
    h = t5_encode(params, jnp.asarray(ids), cfg)
    err = (np.abs(np.asarray(h) - ref) ** 2).mean() / (ref ** 2).mean()
    assert err < 1e-3, err


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}.")
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}.")
    else:
        yield prefix[:-1], tree


@pytest.fixture(scope="module")
def vae_ckpt(tmp_path_factory):
    """Write a synthetic AutoencoderKL-layout safetensors checkpoint from
    our own random tree: diffusers names == our names except to_out(.0)
    and the extra quant convs."""
    from safetensors.numpy import save_file
    cfg = VAE_TINY_CONFIG
    params = init_vae(jax.random.key(0), cfg, dtype=jnp.float32)
    lat = cfg.latent_channels
    rng = np.random.default_rng(0)
    state = {}
    for k, v in _flatten(params):
        k = k.replace(".to_out.", ".to_out.0.")        # diffusers naming
        state[k] = np.asarray(v)
    state["quant_conv.weight"] = (
        rng.normal(size=(2 * lat, 2 * lat, 1, 1)).astype(np.float32) * 0.3
        + np.eye(2 * lat, dtype=np.float32)[..., None, None])
    state["quant_conv.bias"] = np.zeros(2 * lat, np.float32)
    state["post_quant_conv.weight"] = (
        rng.normal(size=(lat, lat, 1, 1)).astype(np.float32) * 0.3
        + np.eye(lat, dtype=np.float32)[..., None, None])
    state["post_quant_conv.bias"] = np.zeros(lat, np.float32)
    path = tmp_path_factory.mktemp("vae")
    save_file(state, str(path / "model.safetensors"))
    import json
    (path / "config.json").write_text(json.dumps({
        "block_out_channels": [cfg.base_channels * m
                               for m in cfg.channel_mults],
        "latent_channels": cfg.latent_channels,
        "layers_per_block": cfg.layers_per_block,
        "out_channels": cfg.out_channels,
        "norm_num_groups": cfg.norm_groups,
        "scaling_factor": cfg.scaling_factor,
    }))
    return str(path), params


def test_vae_key_map_rewrites():
    assert vae_key_map("decoder.mid_block.attentions.0.to_out.0.weight") \
        == "decoder.mid_block.attentions.0.to_out.weight"
    assert vae_key_map("decoder.mid_block.attentions.0.query.weight") \
        == "decoder.mid_block.attentions.0.to_q.weight"
    assert vae_key_map("encoder.conv_in.weight") == "encoder.conv_in.weight"
    assert vae_key_map("decoder.norm1.running_mean") is None


def test_vae_checkpoint_roundtrip(vae_ckpt):
    path, src = vae_ckpt
    params, cfg, _ = load_vae(
        path, QuantConfig(modules_to_not_convert=["*"]), dtype=jnp.float32)
    assert cfg.base_channels == VAE_TINY_CONFIG.base_channels
    assert "quant_conv" in params and "post_quant_conv" in params
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(1, 8, 8, cfg.latent_channels))
                    .astype(np.float32))
    img = vae_decode(params, z, cfg)
    # VAE_TINY has 2 levels -> one up/down-sampler: 8 -> 16
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()
    # decode WITHOUT the loader's post_quant_conv differs (it is applied)
    bare = dict(params)
    bare.pop("post_quant_conv")
    img2 = vae_decode(bare, z, cfg)
    assert np.abs(np.asarray(img) - np.asarray(img2)).max() > 1e-5
    # encoder path incl. quant_conv
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    lat = vae_encode(params, x, cfg)
    assert lat.shape == (1, 8, 8, cfg.latent_channels)
    assert np.isfinite(np.asarray(lat)).all()


def test_vae_checkpoint_weights_match_source(vae_ckpt):
    path, src = vae_ckpt
    params, cfg, _ = load_vae(
        path, QuantConfig(modules_to_not_convert=["*"]), dtype=jnp.float32)
    got = params["decoder"]["mid_block"]["attentions"][0]["to_q"]["weight"]
    want = src["decoder"]["mid_block"]["attentions"][0]["to_q"]["weight"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
