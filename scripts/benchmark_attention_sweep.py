#!/usr/bin/env python
"""Attention crossover sweep: where does quantized attention WIN?

VERDICT r3 #5: int8 QK loses to bf16 flash at (n=4096, d=128) — the int8
MXU needs a >=256-wide contraction for its 2x rate, and d=128 QK dots
don't provide one.  This sweep maps the regime where the n^2 QK/PV terms
and the int8 KV-cache bytes dominate instead:

  part 1 — kernel sweep over n x d x {bf16 flash, int8 qk, int8 qk+pv}
           (reference kernel being justified: triton_atten.py:37-192);
  part 2 — LLM decode tokens/s with int8-KV vs bf16-KV cache
           (models/llm.py generate()) at growing context lengths.

The measured crossovers feed kernels/attention.attn_auto_matmul_dtype —
the dispatch that picks bf16 flash below the crossover automatically.

Output: benchmarks/tpu_v5e_attention_sweep.txt (run via
scripts/run_all_benchmarks.sh).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_common import timeit
from sdnq_tpu.kernels.attention import quantized_attention


def sweep_kernels(steps: int, tiny: bool = False):
    print("== part 1: attention kernel sweep (B*H fixed = 16) ==")
    print(f"{'n':>6} {'d':>4} | {'bf16 TF':>8} {'int8qk TF':>9} "
          f"{'qk+pv TF':>9} | int8/bf16")
    rows = []
    shapes = [
        (1024, 64, 2, 8), (1024, 128, 2, 8),
        (4096, 64, 2, 8), (4096, 128, 2, 8),
        (16384, 64, 1, 8), (16384, 128, 1, 8),
        (65536, 64, 1, 2), (65536, 128, 1, 2),
    ] if not tiny else [(256, 64, 1, 2)]
    for n, d, b, h in shapes:
        rng = np.random.default_rng(0)
        shp = (b, h, n, d)
        q = jnp.asarray(rng.normal(size=shp).astype(np.float32) * 0.5
                        ).astype(jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=shp).astype(np.float32) * 0.5
                        ).astype(jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=shp).astype(np.float32) * 0.5
                        ).astype(jnp.bfloat16)
        flops = 4.0 * b * h * n * n * d
        res = {}
        for name, kw in [
            ("bf16", dict(matmul_dtype=None)),
            ("int8qk", dict(matmul_dtype="int8")),
            ("int8qkpv", dict(matmul_dtype="int8", pv_matmul_dtype="int8")),
        ]:
            try:
                t = timeit(jax.jit(
                    lambda q, k, v, kw=kw: quantized_attention(q, k, v, **kw)
                ), q, k, v, steps=steps)
                res[name] = flops / t / 1e12
            except Exception as e:  # noqa: BLE001
                print(f"  {name} failed at n={n} d={d}: {str(e)[:60]}",
                      flush=True)
                res[name] = 0.0
        ratio = res["int8qk"] / res["bf16"] if res["bf16"] else 0.0
        print(f"{n:>6} {d:>4} | {res['bf16']:8.1f} {res['int8qk']:9.1f} "
              f"{res['int8qkpv']:9.1f} | {ratio:8.2f}x", flush=True)
        rows.append((n, d, res))
    return rows


def sweep_decode(steps: int, tiny: bool = False):
    """Decode tokens/s: quantized KV cache halves the per-step KV read."""
    print("\n== part 2: LLM decode, int8-KV vs bf16-KV cache ==")
    from sdnq_tpu import QuantConfig, quantize_model
    from sdnq_tpu.models.llm import (
        LLMConfig, init_llm, init_cache, llm_forward)

    cfg = LLMConfig(vocab_size=32000, hidden_size=2048, num_layers=8,
                    num_heads=16, num_kv_heads=8, head_dim=128, ff_dim=5632) \
        if not tiny else LLMConfig(
            vocab_size=512, hidden_size=256, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=64, ff_dim=512)
    params = init_llm(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    qp, _ = quantize_model(
        params, QuantConfig(weights_dtype="int8", use_quantized_matmul=True))
    print(f"model: dim={cfg.hidden_size} layers={cfg.num_layers} "
          f"heads={cfg.num_heads}/{cfg.num_kv_heads}kv hd={cfg.head_dim}",
          flush=True)

    print(f"{'ctx':>7} | {'bf16KV tok/s':>12} {'int8KV tok/s':>12} | ratio")
    for ctx in ((4096, 16384, 65536) if not tiny else (256,)):
        res = {}
        for name, kv_dtype in [("bf16KV", "bfloat16"), ("int8KV", "int8")]:
            try:
                caches = init_cache(cfg, 1, ctx, dtype=kv_dtype)
                # steady-state decode: cache structurally full, one new
                # token written at offset ctx-1 (static shapes; attention
                # masks to positions <= pos so cost == full-context decode)
                caches = [c[:-1] + (jnp.asarray(ctx - 1, jnp.int32),)
                          for c in caches]
                tok = jnp.ones((1, 1), jnp.int32)
                pos = jnp.full((1, 1), ctx - 1, jnp.int32)

                def step(tok, caches, pos):
                    logits, caches = llm_forward(
                        qp, tok, cfg, positions=pos, caches=caches)
                    return jnp.argmax(logits[:, -1], -1)[:, None]

                jstep = jax.jit(step)
                t = timeit(lambda tok: jstep(tok, caches, pos), tok,
                           steps=steps)
                res[name] = 1.0 / t
            except Exception as e:  # noqa: BLE001
                print(f"  {name} failed at ctx={ctx}: {str(e)[:80]}",
                      flush=True)
                res[name] = 0.0
        r = res["int8KV"] / res["bf16KV"] if res["bf16KV"] else 0.0
        print(f"{ctx:>7} | {res['bf16KV']:12.1f} {res['int8KV']:12.1f} "
              f"| {r:5.2f}x", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--part", choices=["all", "kernels", "decode"],
                    default="all")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke-test shapes")
    args = ap.parse_args()
    print(f"# attention crossover sweep  {time.strftime('%Y-%m-%d %H:%M')}"
          f"  device={jax.devices()[0].device_kind}", flush=True)
    if args.part in ("all", "kernels"):
        sweep_kernels(args.steps, tiny=args.tiny)
    if args.part in ("all", "decode"):
        sweep_decode(args.steps, tiny=args.tiny)


if __name__ == "__main__":
    main()
