#!/bin/bash
# Follow-up A/Bs (same-window comparisons only):
#  - norm-prologue fusion OFF (prologue forces bk=K — untested e2e in r1)
#  - one-kernel fused MLP block
#  - combined candidates
cd "$(dirname "$0")/.." || exit 1
run() {
  echo "=== $* ==="
  timeout 2400 "$@" 2>&1 | grep -E '^\{' | tail -4
  echo "--- rc=$? ---"
}
run python bench.py                                   # control re-pin
run env NMVLLM_DISABLE_NORM_FUSION=1 python bench.py  # prologue off
run env NMVLLM_FUSED_MLP=1 python bench.py            # fused MLP block
run env NMVLLM_FUSED_MLP=1 NMVLLM_QUANT_LM_HEAD=8 python bench.py
