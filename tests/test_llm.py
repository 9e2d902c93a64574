"""Quantized LLM decoder tests."""

import numpy as np
import jax
import jax.numpy as jnp

from sdnq_tpu import QuantConfig, quantize_model
from sdnq_tpu.models import LLM_TINY_CONFIG, generate, init_llm, llm_forward


def test_llm_forward_shapes():
    cfg = LLM_TINY_CONFIG
    params = init_llm(jax.random.key(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0)
                      .integers(0, cfg.vocab_size, (2, 12)))
    logits, _ = llm_forward(params, ids, cfg)
    assert logits.shape == (2, 12, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_llm_cache_matches_full_forward():
    """Prefill+decode with KV cache must match the cache-free causal
    forward token-for-token."""
    cfg = LLM_TINY_CONFIG
    params = init_llm(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)))

    toks_cached = generate(params, ids, cfg, max_new_tokens=5)

    # cache-free greedy decode
    cur = ids
    toks_plain = []
    for _ in range(5):
        logits, _ = llm_forward(params, cur, cfg)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        toks_plain.append(nxt)
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
    toks_plain = jnp.stack(toks_plain, axis=1)
    np.testing.assert_array_equal(np.asarray(toks_cached),
                                  np.asarray(toks_plain))


def test_llm_quantized_generation():
    cfg = LLM_TINY_CONFIG
    params = init_llm(jax.random.key(0), cfg)
    qp, _ = quantize_model(
        params, QuantConfig(weights_dtype="int8",
                            minimum_allowed_numel=4096,
                            minimum_allowed_channel_size=16),
        arch="Emu3ForCausalLM")
    from sdnq_tpu import QTensor
    # lm_head stays unquantized (skip registry)
    assert not isinstance(qp["lm_head"]["weight"], QTensor)
    assert isinstance(qp["layers"][0]["mlp"]["gate_proj"]["weight"], QTensor)
    ids = jnp.asarray(np.random.default_rng(2)
                      .integers(0, cfg.vocab_size, (1, 6)))
    toks = generate(qp, ids, cfg, max_new_tokens=4)
    assert toks.shape == (1, 4)


def test_llm_int8_kv_cache_matches_bf16_cache():
    """The quantized KV cache (int8 rows + per-token scales, quantized once
    at insert) must decode the same tokens as the bf16 cache on a
    well-conditioned model — a serving capability the reference lacks."""
    import dataclasses
    cfg = LLM_TINY_CONFIG
    params = init_llm(jax.random.key(0), cfg)
    ids = jnp.asarray(np.random.default_rng(3)
                      .integers(0, cfg.vocab_size, (2, 12)))
    out_bf = generate(params, ids, cfg, max_new_tokens=8)
    cfg8 = dataclasses.replace(cfg, kv_cache_dtype="int8")
    out_q = generate(params, ids, cfg8, max_new_tokens=8)
    agree = float((np.asarray(out_bf) == np.asarray(out_q)).mean())
    assert agree >= 0.75, agree  # int8 KV noise may flip rare near-ties

    from sdnq_tpu.models.llm import init_cache
    c = init_cache(cfg8, 1, 16)[0]
    assert len(c) == 5 and c[0].dtype == jnp.int8 and c[2].dtype == jnp.int8
