"""Drift-bracketed e2e A/B at bench.py geometry.

The axon tunnel's fixed costs drift 10-15% between processes and over
tens of minutes (docs/PERF_NOTES.md), drowning <50 ms step effects in
separate-process A/Bs. This harness measures configs in ONE process in
an A-B-A bracket: if the two A phases disagree by more than the B
effect, the run is inconclusive and says so.

Each phase re-builds the model under the config's env vars (flags are
read at build/trace time), times `--samples` chained decode_many calls
of `--steps` steps each, then frees device buffers (two configs' params
+ KV cannot co-reside in 16 GB HBM).

Usage: python benchmarks/ab_bench.py --b fused_mlp [--a control]
Configs: control, fused_mlp, no_normfuse, qhead4, qhead8, hpd2, a8c
"""
import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CONFIGS = {
    "control": {},
    "fused_mlp": {"NMVLLM_FUSED_MLP": "1"},
    "no_fused_mlp": {"NMVLLM_FUSED_MLP": "0"},
    "no_normfuse": {"NMVLLM_DISABLE_NORM_FUSION": "1"},
    "qhead4": {"NMVLLM_QUANT_LM_HEAD": "4"},
    "qhead8": {"NMVLLM_QUANT_LM_HEAD": "8"},
    "hpd2": {"NMVLLM_ATTN_HPD": "2"},
    "hpd1": {"NMVLLM_ATTN_HPD": "1"},
    "a8c": {"NMVLLM_INT4_A8": "channel"},
    "sb8k": {"NMVLLM_ATTN_SB_COLS": "8192"},
    "sb2k": {"NMVLLM_ATTN_SB_COLS": "2048"},
    "fused_mlp+qhead4": {"NMVLLM_FUSED_MLP": "1",
                         "NMVLLM_QUANT_LM_HEAD": "4"},
    "best": {"NMVLLM_FUSED_MLP": "1", "NMVLLM_QUANT_LM_HEAD": "4"},
}
_ALL_KEYS = sorted({k for v in CONFIGS.values() for k in v})


def set_env(cfg):
    for k in _ALL_KEYS:
        os.environ.pop(k, None)
    os.environ.update(cfg)


def phase(name, cfg, batch, ctx, steps, samples, block_size):
    """Build under cfg, time `samples` chained decode_many calls."""
    set_env(cfg)
    import jax
    import bench as bench_mod
    t0 = time.perf_counter()
    tps, pbytes, kvb = bench_mod.run_decode_bench(
        "llama-3-8b", "gptq", batch, ctx, steps,
        block_size=block_size, samples=samples)
    build_s = time.perf_counter() - t0
    if not isinstance(tps, list):
        tps = [tps]
    out = {"config": name, "tok_s": [round(t, 1) for t in tps],
           "build_s": round(build_s, 1)}
    print(json.dumps(out), flush=True)
    gc.collect()
    jax.clear_caches()
    gc.collect()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="control")
    ap.add_argument("--b", required=True)
    ap.add_argument("--batch", type=int, default=56)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--block-size", type=int, default=32)
    args = ap.parse_args()

    a1 = phase(args.a + "#1", CONFIGS[args.a], args.batch, args.ctx,
               args.steps, args.samples, args.block_size)
    b = phase(args.b, CONFIGS[args.b], args.batch, args.ctx,
              args.steps, args.samples, args.block_size)
    a2 = phase(args.a + "#2", CONFIGS[args.a], args.batch, args.ctx,
               args.steps, args.samples, args.block_size)

    import statistics

    def mid(xs):
        return statistics.median(xs)

    am = (mid(a1["tok_s"]) + mid(a2["tok_s"])) / 2
    bm = mid(b["tok_s"])
    drift = abs(mid(a1["tok_s"]) - mid(a2["tok_s"])) / am
    effect = (bm - am) / am
    print(json.dumps({
        "a_mean": round(am, 1), "b": bm,
        "effect_pct": round(100 * effect, 1),
        "a_drift_pct": round(100 * drift, 1),
        "conclusive": abs(effect) > drift + 0.02,
    }))


if __name__ == "__main__":
    main()
