"""SDNQ-TPU headline benchmark.

Mirrors the reference's published microbenchmark
(/root/reference/scripts/benchmark_sdnq_inference_matmul.py: quantized
nn.Linear, M=16384 N=8192 K=4096, bias, TFLOPS = 2MNK/t) on the TPU chip:

  * bf16 baseline linear (XLA dot)
  * SDNQ int8 quantized matmul (per-token activation quant + fused Pallas
    scaled-mm epilogue) — the headline path
  * int4 weight-only fused dequant-matmul

Prints ONE JSON line:
  value        = int8-quantized-matmul speedup over bf16 (x)
  vs_baseline  = value / 1.5  (BASELINE.json target: >= 1.5x bf16
                 images|tokens per sec per chip; >1.0 beats target)
Detailed numbers go to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

M, N, K = 16384, 8192, 4096
STEPS = 5
INNER = 16


def _time(fn, x0, steps=STEPS):
    """Chained-scan timing: the axon tunnel pays a DRIFTING 0.8-5 ms
    per-program dispatch cost that does NOT pipeline across calls, so
    per-call timing pollutes a 2-7 ms op by 10-100%+ (measured: a trivial
    (8,128) op reports 156 us/iter at inner=32 vs 3.5 at inner=1024).
    Chain INNER data-dependent iterations inside one scan and subtract the
    measured empty-chain floor; baseline and quantized rows get identical
    treatment, so the ratio is the honest on-chip one.

    The carry couples through sum(y*y), NOT sum(y): sum over a final
    linear layer commutes (sum(W@x) -> colsum(W)@x) and XLA's algebraic
    simplifier elides the matmul under test.  The floor chain broadcasts
    its carry to fn's output shape so both chains pay the same reduction
    cost."""
    out_shape = jax.eval_shape(fn, x0).shape

    def chain(f):
        def body(c, _):
            y = f(c).astype(jnp.float32)
            c = c * (1 + 1e-30 * jnp.sum(y * y)).astype(c.dtype)
            return c, ()
        return jax.jit(
            lambda c0: jax.lax.scan(body, c0, None, length=INNER)[0])

    def run(prog):
        out = prog(x0)
        jax.block_until_ready(out)  # compile
        t0 = time.perf_counter()
        for _ in range(steps):
            out = prog(x0)
            jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps / INNER

    t = run(chain(fn))
    t_floor = run(chain(
        lambda c: jnp.broadcast_to(c[:, :1], out_shape)))
    return max(t - t_floor, 1e-9)


def main():
    from sdnq_tpu import quantize_tensor, qlinear

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32) * 0.3)

    flops = 2.0 * M * N * K

    # bf16 baseline
    wb = w.astype(jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    base = jax.jit(lambda x: (x @ wb.T + bb))
    t_bf16 = _time(base, xb)
    tf_bf16 = flops / t_bf16 / 1e12

    # int8 quantized matmul (full path incl. activation quantization)
    qt8 = quantize_tensor(w, "int8", use_quantized_matmul=True, group_size=-1)
    f8 = jax.jit(lambda x: qlinear(x, qt8, b, out_dtype=jnp.bfloat16))
    t_int8 = _time(f8, xb)
    tf_int8 = flops / t_int8 / 1e12

    # int4 weight-only fused dequant matmul
    qt4 = quantize_tensor(w, "int4", group_size=128)
    f4 = jax.jit(lambda x: qlinear(x, qt4, b, out_dtype=jnp.bfloat16))
    t_int4 = _time(f4, xb)
    tf_int4 = flops / t_int4 / 1e12

    speedup = t_bf16 / t_int8
    print(
        f"bf16:  {tf_bf16:8.2f} TFLOPS ({t_bf16*1e3:.2f} ms)\n"
        f"int8:  {tf_int8:8.2f} TFLOPS ({t_int8*1e3:.2f} ms)  "
        f"{speedup:.2f}x bf16\n"
        f"int4wo:{tf_int4:8.2f} TFLOPS ({t_int4*1e3:.2f} ms)  "
        f"{t_bf16/t_int4:.2f}x bf16",
        file=sys.stderr)

    print(json.dumps({
        "metric": "int8 quantized-matmul speedup vs bf16 "
                  f"(M={M},N={N},K={K}, incl act-quant)",
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / 1.5, 4),
    }))


if __name__ == "__main__":
    main()
