#!/usr/bin/env python
"""One-off perf bisect for the round-2 kernel regressions (not part of the
benchmark suite).  Times specific kernel variants with explicit block
sizes to separate block-policy effects from code-path effects."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts.bench_common import make_linear_inputs, run_path, timeit  # noqa: F401
from sdnq_tpu import quantize_tensor, qlinear  # noqa: F401
from sdnq_tpu.kernels.scaled_mm import (
    _scaled_mm_pallas, _fused_act_mm_pallas)
from sdnq_tpu.quant.core import quantize_int_mm

M, N, K = 16384, 8192, 4096


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    x, w, b, flops = make_linear_inputs(M, N, K)
    bias = b
    wb = w.astype(jnp.bfloat16)
    ws = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    wnorm = (w / ws).astype(jnp.bfloat16)
    ws1 = ws.reshape(-1)

    if which in ("all", "bf16"):
        for bm, bn, bk in [(256, 256, 4096), (512, 512, 4096),
                           (512, 512, 1024), (1024, 1024, 512)]:
            run_path(
                f"bf16 scaled-mm pallas ({bm},{bn},{bk})",
                jax.jit(lambda x, bm=bm, bn=bn, bk=bk: _scaled_mm_pallas(
                    x, wnorm, None, ws1, bias, None, None,
                    out_dtype=jnp.bfloat16, acc_dtype=jnp.float32,
                    bm=bm, bn=bn, bk=bk)),
                x, flops=flops, steps=10)

    if which in ("all", "int8"):
        qt = quantize_tensor(w, "int8", use_quantized_matmul=True,
                             group_size=-1)
        w_q = qt.qdata
        wsc = qt.scale.reshape(-1)

        def two_pass(x, bm, bn, bk):
            x_q, x_s = quantize_int_mm(x, axis=-1)
            return _scaled_mm_pallas(
                x_q, w_q, x_s, wsc, bias, None, None,
                out_dtype=jnp.bfloat16, acc_dtype=jnp.int32,
                bm=bm, bn=bn, bk=bk)

        for bm, bn, bk in [(512, 512, 4096)]:
            run_path(f"int8 two-pass ({bm},{bn},{bk})",
                     jax.jit(lambda x, a=bm, c=bn, d=bk:
                             two_pass(x, a, c, d)),
                     x, flops=flops, steps=10)
        for bm, bn in [(512, 512), (1024, 512), (1024, 1024)]:
            run_path(
                f"int8 fused-act ({bm},{bn})",
                jax.jit(lambda x, a=bm, c=bn: _fused_act_mm_pallas(
                    x, w_q, wsc, bias, x_fmt="int8",
                    out_dtype=jnp.bfloat16, bm=a, bn=c)),
                x, flops=flops, steps=10)

    if which in ("all", "xla8"):
        from sdnq_tpu.kernels.scaled_mm import _scaled_mm_xla
        qt = quantize_tensor(w, "int8", use_quantized_matmul=True,
                             group_size=-1)
        w_q = qt.qdata
        wsc = qt.scale.reshape(1, -1)

        def e2e(x):
            x_q, x_s = quantize_int_mm(x, axis=-1)
            return _scaled_mm_xla(x_q, w_q, x_s, wsc, bias,
                                  jnp.bfloat16, jnp.int32)
        run_path("int8 xla dot e2e (quant + dot + epilogue)",
                 jax.jit(e2e), x, flops=flops, steps=10)
        for bm, bn in [(2048, 1024), (1024, 2048)]:
            run_path(
                f"int8 fused-act ({bm},{bn})",
                jax.jit(lambda x, a=bm, c=bn: _fused_act_mm_pallas(
                    x, w_q, qt.scale.reshape(-1), bias, x_fmt="int8",
                    out_dtype=jnp.bfloat16, bm=a, bn=c)),
                x, flops=flops, steps=10)

    if which in ("all", "fp16"):
        qtf = quantize_tensor(w, "fp16", use_quantized_matmul=True,
                              group_size=-1)
        wf16 = qtf.qdata
        wsf = qtf.scale.reshape(-1)
        run_path("fp16 qlinear path (f16 storage)",
                 jax.jit(lambda x: qlinear(x, qtf, b,
                                           out_dtype=jnp.bfloat16)),
                 x, flops=flops, steps=10)
        wpre = jnp.asarray(wf16.astype(jnp.bfloat16))
        from sdnq_tpu.kernels.scaled_mm import bf16_scaled_mm
        run_path("fp16 pre-cast bf16 kernel",
                 jax.jit(lambda x: bf16_scaled_mm(x, wpre, None, wsf,
                                                  bias)),
                 x, flops=flops, steps=10)

    if which in ("all", "int4"):
        from sdnq_tpu.kernels.dequant_mm import (
            dequant_matmul, _dequant_mm_pallas)  # noqa: F401
        qt4 = quantize_tensor(w, "int4", group_size=64)
        for bm, bn in [(0, 0), (256, 512), (512, 512), (256, 1024)]:
            name = f"int4 dequant-mm blocks={bm},{bn}"
            if bm:
                os.environ["SDNQ_TPU_DEQUANT_BLOCKS"] = f"{bm},{bn}"
            else:
                os.environ.pop("SDNQ_TPU_DEQUANT_BLOCKS", None)
            run_path(name,
                     jax.jit(lambda x, q=qt4: qlinear(
                         x, q, b, out_dtype=jnp.bfloat16)),
                     x, flops=flops, steps=10)


if __name__ == "__main__":
    main()
