import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from nmvllm_tpu.ops.quant_matmul import quant_matmul

def bench(m, k, n, bn, bk, reps=32):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (m, k), jnp.bfloat16)
    qw = jax.random.randint(rng, (k // 8, n), -2**31, 2**31-1, jnp.int32)
    sc = jnp.full((k // 128, n), 1e-3, jnp.float32)
    z = jnp.full((k // 128, n), 8, jnp.int32)
    @jax.jit
    def many(x):
        def body(i, acc):
            y = quant_matmul(x, qw, sc, z, bits=4, group_size=128,
                             symmetric=True, block_n=bn, block_k=bk)
            return acc + y[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    r = many(x); r.block_until_ready()
    t0 = time.perf_counter(); r = many(x); r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return dt*1e3, (k*n//2)/dt/1e9

m, k, n = 32, 4096, 28672
for bn in (512, 1024, 2048):
    for bk in (2048, 4096):
        try:
            ms, bw = bench(m, k, n, bn, bk)
            print(f"bn={bn} bk={bk}: {ms:8.3f} ms {bw:8.1f} GB/s", flush=True)
        except Exception as e:
            print(f"bn={bn} bk={bk}: FAILED {type(e).__name__} {str(e)[:90]}", flush=True)
