import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from nmvllm_tpu.ops.paged_attention import paged_attention

def bench(batch, kv_heads, q_heads, head, ctx, bs, ppcb, reps=32):
    rng = jax.random.PRNGKey(0)
    bpp = ctx // bs
    nb = batch * bpp + 1
    q = jax.random.normal(rng, (batch, q_heads, head), jnp.bfloat16)
    kc = jax.random.normal(rng, (kv_heads, nb, bs, head), jnp.bfloat16)
    vc = jax.random.normal(rng, (kv_heads, nb, bs, head), jnp.bfloat16)
    bt = jnp.asarray(np.arange(batch * bpp).reshape(batch, bpp), jnp.int32)
    cl = jnp.full((batch,), ctx, jnp.int32)
    @jax.jit
    def many(q):
        def body(i, acc):
            o = paged_attention(q, kc, vc, bt, cl, scale=0.088,
                                pages_per_compute_block=ppcb)
            return acc + o[0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    r = many(q); r.block_until_ready()
    t0 = time.perf_counter(); r = many(q); r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    kv_bytes = 2 * batch * ctx * kv_heads * head * 2
    return dt*1e3, kv_bytes/dt/1e9

for bs, ppcb in [(16, 8), (16, 16), (32, 4), (32, 8), (64, 4)]:
    try:
        ms, bw = bench(32, 8, 32, 128, 1024, bs, ppcb)
        print(f"bs={bs} ppcb={ppcb}: {ms:8.3f} ms {bw:8.1f} GB/s", flush=True)
    except Exception as e:
        print(f"bs={bs} ppcb={ppcb}: FAILED {type(e).__name__} {str(e)[:90]}", flush=True)
