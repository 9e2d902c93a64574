#!/usr/bin/env python
"""Component-level timing of one Flux-width double block: where does the
step time actually go (matmuls vs attention vs pointwise fixed costs)?"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_common import timeit
from sdnq_tpu import QuantConfig, quantize_model
from sdnq_tpu.layers import qlinear
from sdnq_tpu.models.common import (
    apply_rope, attention, layer_norm, rms_norm, split_heads,
)
from sdnq_tpu.models.dit import DiTConfig, init_dit, make_rope_freqs
from sdnq_tpu.models.dit import _double_block, _modulation, _qk_norm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=3072)
    ap.add_argument("--heads", type=int, default=24)
    ap.add_argument("--tokens", type=int, default=4096)
    ap.add_argument("--txt", type=int, default=512)
    ap.add_argument("--quant", action="store_true")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    hd = args.hidden // args.heads
    cfg = DiTConfig(in_channels=64, hidden_size=args.hidden,
                    num_heads=args.heads, depth_double=1, depth_single=0,
                    txt_dim=2048, vec_dim=768,
                    axes_dims=(16, (hd - 16) // 2, (hd - 16) // 2))
    params = init_dit(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    blk = params["transformer_blocks"][0]
    if args.quant:
        blk, _ = quantize_model(
            {"transformer_blocks": [blk]},
            QuantConfig(weights_dtype="int8", use_quantized_matmul=True),
            arch="FluxTransformer2DModel")
        blk = blk["transformer_blocks"][0]

    rng = np.random.default_rng(0)
    b, n_img, L, d = 1, args.tokens, args.txt, args.hidden
    n = n_img + L
    h = args.heads
    side = int(n_img ** 0.5)
    img = jnp.asarray(rng.normal(size=(b, n_img, d)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    txt = jnp.asarray(rng.normal(size=(b, L, d)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    vec = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    freqs = make_rope_freqs(cfg, L, (side, side))
    qkv = jnp.asarray(rng.normal(size=(b, n, h, hd)).astype(np.float32)) \
        .astype(jnp.bfloat16).transpose(0, 2, 1, 3)

    from scripts.bench_common import timeit_chained

    def t(name, fn, *a):
        # chain the op through a data-dependent carry so the axon
        # per-dispatch floor (0.8-5 ms!) amortizes away; args beyond the
        # first are closed over (weights become jit constants — fine at
        # single-layer size).
        x0, rest = a[0], a[1:]

        def body(c):
            out = fn(c, *rest)
            while isinstance(out, (tuple, list)):
                out = out[0]
            return out
        tt = timeit_chained(body, x0, steps=5, inner=16, calibrate=True)
        print(f"{name:38s} {tt*1e3:8.3f} ms", flush=True)
        return tt

    ia = blk["img_attn"]
    im = blk["img_mlp"]
    print(f"== double block components (quant={args.quant}, n={n}) ==")
    t("full double block",
      lambda i_: _double_block(blk, i_, txt, vec, freqs, cfg, None), img)
    t("qkv linear (img)",
      lambda x: qlinear(x, ia["qkv"]["weight"], ia["qkv"].get("bias")), img)
    t("proj linear (img)",
      lambda x: qlinear(x, ia["proj"]["weight"], ia["proj"].get("bias")),
      img)
    t("mlp fc1+gelu+fc2 (img)",
      lambda x: qlinear(jax.nn.gelu(
          qlinear(x, im["fc1"]["weight"], im["fc1"].get("bias")),
          approximate=True),
          im["fc2"]["weight"], im["fc2"].get("bias")), img)
    t("attention (joint, bf16 flash)",
      lambda q: attention(q, q, q, None), qkv)
    t("layer_norm+mod (img)",
      lambda x: layer_norm(x) * (1 + _modulation(blk["img_mod"], vec, 6)[1])
      + _modulation(blk["img_mod"], vec, 6)[0], img)
    t("split_heads x3 (img)",
      lambda x: [split_heads(xx, h) for xx in jnp.split(
          jnp.concatenate([x, x, x], -1), 3, -1)][0], img)
    t("qk rms_norm (joint q,k)",
      lambda q: _qk_norm(q, q, ia["norm_q"], ia["norm_k"])[0], qkv)
    t("rope (joint q)", lambda q: apply_rope(q, freqs), qkv)
    t("attn out transpose+reshape",
      lambda q: q.transpose(0, 2, 1, 3).reshape(b, n, h * hd), qkv)
    t("gelu alone (mlp width)",
      lambda x: jax.nn.gelu(x, approximate=True),
      jnp.concatenate([img, img, img, img], -1))


if __name__ == "__main__":
    main()
