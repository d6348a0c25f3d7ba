"""MLPSpeculator draft head (reference:
vllm/model_executor/models/mlp_speculator.py, IBM fms speculators).

A stack of ``n_predict`` tiny predictors that extend the target model's
last hidden state: head i embeds the latest token, mixes it with the
running state (state_weight / emb_weight blend,
mlp_speculator.py:165-169), L2-normalizes (MLPSpeculatorLayerNorm —
rmsnorm with bias, no mean-centering), GELU-activates, and projects to
vocab logits. Proposals are generated greedily head-by-head.

Unlike draft-model speculation there is no KV cache: the proposer is a
pure function of (last_token, last_hidden), so on TPU the whole k-token
proposal chain is ONE jitted call (a lax for-loop over heads would
prevent per-head weight specialization; n_predict is tiny so Python
unrolling is the compiler-friendly choice).
"""
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import PartitionSpec as P

SQRT2 = 2**0.5


class MLPSpeculator:
    """Functional module; params pytree mirrors init()."""

    is_speculator = True

    def __init__(self, cfg, dtype=jnp.float32):
        self.cfg = cfg
        self.n_predict = int(cfg.n_predict)
        self.vocab_size = int(cfg.vocab_size)
        self.emb_dim = int(cfg.emb_dim)
        inner = int(getattr(cfg, "inner_dim", 0) or 0)
        self.inner_dim = inner if inner != 0 else self.emb_dim
        self.max_speculative_tokens = int(
            getattr(cfg, "num_lookahead_tokens", None) or self.n_predict)
        self.tie_weights = bool(getattr(cfg, "tie_weights", False))
        self.scale_input = bool(getattr(cfg, "scale_input", False))
        self.state_weight = 0.5**(0.5 / self.n_predict)
        self.emb_weight = math.sqrt(
            (1 - self.state_weight**2) * (self.inner_dim / 2))
        self.dtype = dtype

    # With tie_weights the checkpoint stores ONE set of (emb, head, ln)
    # and one tied proj for heads >= 1 (mlp_speculator.py:76-96).
    def _num_unique(self) -> Tuple[int, int]:
        n = self.max_speculative_tokens
        return (1, min(2, n)) if self.tie_weights else (n, n)

    def init(self, rng) -> Dict[str, Any]:
        n_shared, n_proj = self._num_unique()
        ks = jax.random.split(rng, 4)
        d, v, e = self.inner_dim, self.vocab_size, self.emb_dim
        p = {
            "emb": [jax.random.normal(jax.random.fold_in(ks[0], i),
                                      (v, d), self.dtype) * 0.02
                    for i in range(n_shared)],
            "proj": [jax.random.normal(
                jax.random.fold_in(ks[1], i),
                ((e if i == 0 else d), d), self.dtype) * d**-0.5
                for i in range(n_proj)],
            "head": [jax.random.normal(jax.random.fold_in(ks[2], i),
                                       (d, v), self.dtype) * 0.02
                     for i in range(n_shared)],
            "ln": [{"weight": jnp.ones((d,), self.dtype),
                    "bias": jnp.zeros((d,), self.dtype)}
                   for _ in range(n_shared)],
        }
        return p

    def specs(self):
        n_shared, n_proj = self._num_unique()
        return {
            "emb": [P() for _ in range(n_shared)],
            "proj": [P() for _ in range(n_proj)],
            "head": [P() for _ in range(n_shared)],
            "ln": [{"weight": P(), "bias": P()}
                   for _ in range(n_shared)],
        }

    def _pick(self, plist, i):
        if self.tie_weights:
            return plist[min(i, len(plist) - 1)]
        return plist[i]

    def _ln(self, lp, x, eps=1e-6):
        xf = x * jax.lax.rsqrt(
            jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)
        return xf * lp["weight"] + lp["bias"]

    def propose(self, params, last_tokens: jax.Array,
                hidden: jax.Array, k: int) -> jax.Array:
        """(B,) int32 last sampled tokens + (B, emb_dim) last hidden
        -> (B, k) greedy draft tokens (generate_proposals:134)."""
        state = hidden.astype(jnp.float32)
        if self.scale_input:
            state = state * jax.lax.rsqrt(
                jnp.mean(jnp.square(state), -1, keepdims=True) + 1e-6)
            state = state / SQRT2
        toks = last_tokens
        out = []
        for i in range(k):
            z = self._pick(params["emb"], i)[toks].astype(jnp.float32)
            w = self._pick(params["proj"], i).astype(jnp.float32)
            state = state @ w
            state = state + (self.emb_weight / self.state_weight) * z
            state = jax.nn.gelu(
                self._ln(self._pick(params["ln"], i), state),
                approximate=False)
            logits = state @ self._pick(params["head"],
                                        i).astype(jnp.float32)
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            out.append(toks)
        return jnp.stack(out, axis=1)

    def hf_name_map(self) -> Dict[str, Tuple]:
        m: Dict[str, Tuple] = {}
        n_shared, n_proj = self._num_unique()
        for i in range(n_shared):
            m[f"emb.{i}.weight"] = (("emb", i), None)
            m[f"head.{i}.weight"] = (("head", i), "transpose")
            m[f"ln.{i}.weight"] = (("ln", i, "weight"), None)
            m[f"ln.{i}.bias"] = (("ln", i, "bias"), None)
        for i in range(n_proj):
            m[f"proj.{i}.weight"] = (("proj", i), "transpose")
        # fms checkpoints prefix with "speculator."
        for k2 in list(m):
            m["speculator." + k2] = m[k2]
        return m

    def load_from_dir(self, params, model_dir: str):
        """Minimal safetensors ingest (no sharding: the head is tiny and
        replicated)."""
        import glob
        import os
        from safetensors import safe_open
        name_map = self.hf_name_map()
        files = sorted(glob.glob(os.path.join(model_dir,
                                              "*.safetensors")))
        for fn in files:
            with safe_open(fn, framework="np") as f:
                for name in f.keys():
                    if name not in name_map:
                        continue
                    path, transform = name_map[name]
                    arr = f.get_tensor(name)
                    if transform == "transpose":
                        arr = np.ascontiguousarray(arr.T)
                    node = params
                    for kk in path[:-1]:
                        node = node[kk]
                    node[path[-1]] = jnp.asarray(arr, self.dtype)
        return params
