"""Real-checkpoint end-to-end validation (VERDICT item 1/3).

Builds genuine HF checkpoints with ``save_pretrained`` (real safetensors
layout + config.json from the actual transformers implementations), streams
them through io/ with the concrete key maps, and gates on activation parity
against the reference torch forward — unquantized near-exact, int8 within
the quantization-noise threshold."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from sdnq_tpu import QuantConfig, QTensor
from sdnq_tpu.io import load_llama, load_clip_text
from sdnq_tpu.models.llm import llm_forward, generate
from sdnq_tpu.models.text_encoder import clip_encode


@pytest.fixture(scope="module")
def llama_ckpt(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    # default init gives tiny weights; rescale for a non-degenerate test
    with torch.no_grad():
        for p in model.parameters():
            if p.ndim >= 2:
                p.mul_(3.0)
    path = tmp_path_factory.mktemp("llama")
    model.save_pretrained(path, safe_serialization=True)
    ids = torch.randint(0, 512, (2, 16), generator=torch.Generator()
                        .manual_seed(1))
    with torch.no_grad():
        ref_logits = model(ids).logits.float().numpy()
    return str(path), np.asarray(ids.numpy()), ref_logits


def test_llama_checkpoint_unquantized_parity(llama_ckpt):
    path, ids, ref = llama_ckpt
    params, cfg, _ = load_llama(
        path, QuantConfig(modules_to_not_convert=["*"]),
        dtype=jnp.float32)
    # nothing quantized: pure architecture parity vs transformers
    assert not any(isinstance(x, QTensor)
                   for x in jax.tree_util.tree_leaves(
                       params, is_leaf=lambda x: isinstance(x, QTensor)))
    logits, _ = llm_forward(params, jnp.asarray(ids), cfg)
    rel = np.abs(np.asarray(logits) - ref).max() / np.abs(ref).max()
    assert rel < 2e-3, rel


def test_llama_checkpoint_int8_within_threshold(llama_ckpt):
    path, ids, ref = llama_ckpt
    cfg_q = QuantConfig(weights_dtype="int8", quant_embedding=True,
                        minimum_allowed_numel=1024,
                        minimum_allowed_channel_size=16)
    params, cfg, _ = load_llama(path, cfg_q, dtype=jnp.float32)
    leaves = jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, QTensor))
    assert any(isinstance(x, QTensor) for x in leaves)
    logits, _ = llm_forward(params, jnp.asarray(ids), cfg)
    # model-level accuracy gate in the spirit of dynamic_loss_threshold:
    # normalized error of the full forward at 8 bits
    err = (np.abs(np.asarray(logits) - ref) ** 2).mean() / (ref ** 2).mean()
    assert err < 1e-3, err


def test_llama_checkpoint_generate_runs(llama_ckpt):
    path, ids, _ = llama_ckpt
    params, cfg, _ = load_llama(path, QuantConfig(), dtype=jnp.bfloat16)
    toks = generate(params, jnp.asarray(ids[:, :8]), cfg, max_new_tokens=4)
    assert toks.shape == (2, 4)


@pytest.fixture(scope="module")
def clip_ckpt(tmp_path_factory):
    from transformers import CLIPTextConfig, CLIPTextModel
    torch.manual_seed(0)
    cfg = CLIPTextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=32, hidden_act="quick_gelu",
        bos_token_id=254, eos_token_id=255, pad_token_id=0)
    model = CLIPTextModel(cfg).eval()
    path = tmp_path_factory.mktemp("clip")
    model.save_pretrained(path, safe_serialization=True)
    g = torch.Generator().manual_seed(2)
    ids = torch.randint(1, 250, (2, 32), generator=g)
    ids[:, -1] = cfg.eos_token_id
    with torch.no_grad():
        out = model(ids)
    return (str(path), np.asarray(ids.numpy()),
            out.last_hidden_state.float().numpy())


def test_clip_checkpoint_unquantized_parity(clip_ckpt):
    path, ids, ref = clip_ckpt
    params, cfg, _ = load_clip_text(
        path, QuantConfig(modules_to_not_convert=["*"]),
        dtype=jnp.float32)
    h, _ = clip_encode(params, jnp.asarray(ids), cfg)
    rel = np.abs(np.asarray(h) - ref).max() / np.abs(ref).max()
    assert rel < 2e-3, rel


def test_clip_checkpoint_int8_within_threshold(clip_ckpt):
    path, ids, ref = clip_ckpt
    cfg_q = QuantConfig(weights_dtype="int8", minimum_allowed_numel=1024,
                        minimum_allowed_channel_size=16)
    params, cfg, _ = load_clip_text(path, cfg_q, dtype=jnp.float32)
    h, _ = clip_encode(params, jnp.asarray(ids), cfg)
    err = (np.abs(np.asarray(h) - ref) ** 2).mean() / (ref ** 2).mean()
    assert err < 1e-3, err
