import traceback
from bench import run_prefill_bench
try:
    r = run_prefill_bench("llama-3-8b", "gptq",
                          [(1, 2048), (4, 512), (1, 8192)])
    print("PREFILL OK", r)
except Exception:
    traceback.print_exc()
