#!/usr/bin/env bash
# Regenerate every benchmarks/*.txt on the attached TPU chip, with date /
# env / git stamps so recorded numbers are reproducible artifacts (not
# commit-message claims).  Runs benchmarks SEQUENTIALLY — two processes
# sharing the one tunneled chip contend and corrupt each other's timings.
#
# Usage:  bash scripts/run_all_benchmarks.sh [--quick]
#   --quick  halves steps and skips the full dtype sweep (~15 min vs ~1.5 h)
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks
QUICK=${1:-}

stamp() {  # stamp <file> <title>
    {
        echo "$2"
        echo "date: $(date -u +%Y-%m-%dT%H:%M:%SZ)   git: $(git rev-parse --short HEAD)"
        python - <<'PY'
import jax, sys
d = jax.devices()[0]
print(f"device: {d.device_kind}   jax: {jax.__version__}   "
      f"backend: {jax.default_backend()}")
PY
        echo "---"
    } > "$1"
}

run() {  # run <file> <cmd...>
    local f=$1; shift
    echo "== $* -> $f" >&2
    timeout 3600 "$@" >> "$f" 2> >(grep -v "xla_bridge" >&2)
    echo "exit: $?" >> "$f"
}

STEPS=20; MSTEPS=5
[ "$QUICK" = "--quick" ] && { STEPS=10; MSTEPS=3; }

# 1. reference-shape inference matmul (the headline table)
F=$OUT/tpu_v5e_inference.txt
stamp $F "SDNQ-TPU inference matmul benchmark (reference shape M=16384 N=8192 K=4096)"
run $F python scripts/benchmark_inference.py --steps $STEPS
run $F python scripts/benchmark_inference.py --steps $STEPS --hadamard

# 2. memory-bound small-M weight-only
F=$OUT/tpu_v5e_small_m.txt
stamp $F "SDNQ-TPU memory-bound (small-M) weight-only benchmark (O=8192 K=4096)"
run $F python scripts/benchmark_small_m.py \
    --fmts "int8,int4:128,int4:128:q,int4:1024:q,uint4:128:q,int3:128:q,int2:128:q,float6_e3m2fn:128" \
    --ms 1,16,128,512

# 3. training fwd+bwd per family
F=$OUT/tpu_v5e_training.txt
stamp $F "SDNQ-TPU training fwd+bwd benchmark (M=8192 N=8192 K=4096)"
run $F python scripts/benchmark_training.py --steps $STEPS

# 4. quantized flash attention
F=$OUT/tpu_v5e_attention.txt
stamp $F "SDNQ-TPU attention benchmark (B=4 H=16 N=4096 D=128)"
run $F python scripts/benchmark_attention.py --steps $STEPS

# 4b. attention crossover sweep + int8-KV decode (feeds the auto policy)
F=$OUT/tpu_v5e_attention_sweep.txt
stamp $F "SDNQ-TPU attention crossover sweep (n x d grid + LLM decode KV)"
run $F python scripts/benchmark_attention_sweep.py --steps $MSTEPS

# 5. Flux-width staged model step
F=$OUT/tpu_v5e_model.txt
stamp $F "SDNQ-TPU Flux-width staged model benchmark (hidden=1536 6+12 blocks, 4608 tok)"
run $F python scripts/benchmark_model.py --staged --steps $MSTEPS --only bf16
run $F python scripts/benchmark_model.py --staged --steps $MSTEPS --only quant
run $F python scripts/benchmark_model.py --staged --steps $MSTEPS --only quant --no-stack

# 6. SDXL UNet model-level (BASELINE target row)
F=$OUT/tpu_v5e_unet.txt
stamp $F "SDNQ-TPU SDXL UNet model benchmark (latent 128 = 1024px)"
run $F python scripts/benchmark_unet.py --model sdxl --latent 128 --staged \
    --steps $MSTEPS --only bf16
run $F python scripts/benchmark_unet.py --model sdxl --latent 128 --staged \
    --steps $MSTEPS --only quant

# 6b. per-component Flux block step budget (VERDICT r4 #2c)
F=$OUT/tpu_v5e_profile_block.txt
stamp $F "SDNQ-TPU Flux-width double-block component budget"
run $F python scripts/profile_block.py
run $F python scripts/profile_block.py --quant

# 6c. image-quality table (accuracy artifact; CPU-computable but recorded
# with the rest for one coherent snapshot)
F=$OUT/image_quality.txt
stamp $F "SDNQ-TPU image-quality table (bf16 vs quantized pipelines)"
run $F python scripts/benchmark_image_quality.py

# 7. full dtype sweep (slow)
if [ "$QUICK" != "--quick" ]; then
    F=$OUT/tpu_v5e_full_sweep.txt
    stamp $F "SDNQ-TPU full dtype sweep (all formats +-Hadamard)"
    run $F python scripts/benchmark_inference_full.py
fi

echo "all benchmark files regenerated under $OUT/" >&2
