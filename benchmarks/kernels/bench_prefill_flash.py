"""Flash prefill kernel vs jnp einsum path: chained walltime at
llama-3-8b-ish shapes (B=1, T in {512, 1024, 2048}, 32q/8kv heads,
d=128). Run on TPU: python benchmarks/kernels/bench_prefill_flash.py"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

import nmvllm_tpu.ops.prefill_attention as pa


def chain(fn, x0, iters):
    x = fn(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    d, hq, hkv = 128, 32, 8
    for t in (512, 1024, 2048):
        b = 1
        rng = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (b, t, hq, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, t, hkv, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, t, hkv, d), jnp.bfloat16)
        pos = jnp.broadcast_to(jnp.arange(t), (b, t))
        sl = jnp.full((b,), t, jnp.int32)

        @jax.jit
        def run_flash(q_in):
            return pa._flash_prefill(q_in, k, v, sl, scale=d**-0.5,
                                     sliding_window=0, logit_soft_cap=0.0)

        # jnp path rebuilt inline (env-toggling the public fn is
        # process-global).
        @jax.jit
        def run_ref(q_in):
            qf = q_in.astype(jnp.float32).reshape(b, t, hkv, hq // hkv, d)
            kf = k.astype(jnp.float32)
            s = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf) * (d**-0.5)
            qpos = pos[:, :, None]
            kpos = pos[:, None, :]
            mask = (kpos <= qpos)
            s = jnp.where(mask[:, None, None], s, float("-inf"))
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhgqk,bkhd->bqhgd", p,
                           v.astype(jnp.float32))
            return o.reshape(b, t, hq, d).astype(q_in.dtype)

        ms_flash = chain(run_flash, q, 20)
        ms_ref = chain(run_ref, q, 20)
        flops = 4 * b * hq * t * t * d / 2
        print(f"T={t}: flash {ms_flash:7.3f} ms "
              f"({flops / ms_flash / 1e9:6.2f} TF/s)  "
              f"jnp {ms_ref:7.3f} ms ({flops / ms_ref / 1e9:6.2f} TF/s)  "
              f"speedup {ms_ref / ms_flash:5.2f}x")


if __name__ == "__main__":
    main()
