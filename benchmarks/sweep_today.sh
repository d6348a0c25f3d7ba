#!/bin/bash
# Attribution + knob sweep for one tunnel window. Runs each experiment in
# its own process, sequentially (one TPU process at a time), printing
# incrementally. Compare numbers ONLY within this window.
cd "$(dirname "$0")/.." || exit 1
run() {
  echo "=== $* ==="
  timeout 2400 "$@" 2>&1 | grep -E '^\{' | tail -4
  echo "--- rc=$? ---"
}
# 0. Optimized-HLO dump (compile-only, 2 layers): hidden copies/fusions.
run python bench.py --dump-hlo /tmp/step2.hlo --layers 2
python benchmarks/kernels/analyze_hlo.py /tmp/step2.hlo --min-mb 1 | head -50
# 1. Control (re-baseline for this window).
run python bench.py
# 2. Head+sampler ablation: step cost without lm_head+argmax.
run python bench.py --no-head
# 3. Attention heads-per-dot sweep (block-diag VPU waste knob).
NMVLLM_ATTN_HPD=2 run env NMVLLM_ATTN_HPD=2 python bench.py
run env NMVLLM_ATTN_HPD=4 python bench.py
# 4. Quantized LM head A/B.
run python bench.py --quant-head 8
run python bench.py --quant-head 4
# 5. Layer ablation: attention vs MLP split (3 programs).
run python benchmarks/kernels/bench_layer_ablation.py \
    --ablations full,no_attn,no_mlp --layers 8 --steps 8
