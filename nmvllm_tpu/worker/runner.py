"""Model runner: batch assembly, shape bucketing, compiled step dispatch.

Reference parity: vllm/worker/model_runner.py (GPUModelRunnerBase:158,
_prepare_model_input_tensors:332, execute_model:1176) and the reference's own
TPU path vllm/worker/tpu_model_runner.py (warmup buckets :159, ModelWrapper
:503 fusing forward+logits+sample in one graph).

TPU-native design decisions (SURVEY.md §7):
  * One compiled step per (mode, bucket, sampling-variant): forward + logits
    + in-graph sampling, KV buffers donated — no host↔device ping-pong per
    token (the analogue of CUDA-graph capture is XLA compilation caching).
  * Decode steps: batch padded to a bucket (multiples of 8); prefill steps:
    one sequence padded to a power-of-two token bucket
    (tpu_model_runner.py:591-610 pattern, made a scheduler contract).
  * The whole step runs under shard_map over the (data, tp) mesh: weights
    and KV arrive as local shards, TP collectives are explicit psums inside
    the model, sampling is replicated in-graph
    (model_runner.py:1259's driver-only sampling has no SPMD analogue).
"""
import contextlib
import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.config import EngineConfig
from nmvllm_tpu.layers.sampler import (SamplerOutputArrays, SamplingTensors,
                                       sample)
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.models.base import AttentionMetadata
from nmvllm_tpu.parallel.mesh import TP_AXIS
from nmvllm_tpu.sampling_params import SamplingParams, SamplingType
from nmvllm_tpu.sequence import (CompletionSequenceGroupOutput, Logprob,
                                 SamplerOutput, SequenceGroupMetadata,
                                 SequenceOutput)
from nmvllm_tpu.utils import cdiv, next_power_of_2, round_up

logger = init_logger(__name__)

_MAX_NUM_LOGPROBS = 20


def shard_map_fn(f, mesh, in_specs, out_specs):
    """Version-tolerant shard_map wrapper."""
    try:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except TypeError:
        from jax.experimental.shard_map import shard_map
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)



def spec_accept_and_sample(logits, sampling_tensors, flags, drafts,
                           draft_lens, *, vocab_size: int, num_spec: int,
                           acc_method: str, typ_thr: float,
                           typ_alpha: float):
    """Shared in-graph speculative acceptance (reference
    rejection_sampler.py / typical_acceptance_sampler.py): takes the
    (B, s, V_pad) verification logits (s = num_spec + 1) and returns
    (out_tokens, n_acc, lp, topk_ids, topk_lp). Used by both the
    single-stage and the pipeline-parallel verify steps."""
    from nmvllm_tpu.layers.sampler import _EPS, _apply_top_k_top_p
    s = num_spec + 1
    logits = logits.astype(jnp.float32)
    b = logits.shape[0]
    v_pad = logits.shape[-1]
    if v_pad > vocab_size:
        logits = jnp.where(
            jnp.arange(v_pad)[None, None, :] < vocab_size, logits,
            float("-inf"))
    # Full sampler on position 0 — serves draft_len==0 rows.
    out0 = sample(logits[:, 0, :], sampling_tensors,
                  vocab_size=vocab_size, **flags)

    t = sampling_tensors
    if flags.get("do_penalties", False):
        # Per-position histories: position j's output history is
        # the base history + drafts[0..j-1] (its output only
        # matters when those drafts are all accepted, i.e. they
        # ARE the preceding tokens — matches sequential
        # decoding's penalty state; reference batch-expansion
        # rebuilds SamplingTensors per expanded row the same
        # way, spec_decode/batch_expansion.py).
        import dataclasses as _dc

        from nmvllm_tpu.layers.sampler import _apply_penalties
        spec_idx = jnp.arange(drafts.shape[1])[None, :]
        pen = []
        for j in range(s):
            extra = jnp.where(
                (spec_idx < j) & (spec_idx < draft_lens[:, None]),
                drafts, vocab_size)
            tj = _dc.replace(t, output_tokens=jnp.concatenate(
                [t.output_tokens, extra], axis=1))
            pen.append(_apply_penalties(
                logits[:, j, :vocab_size], tj, vocab_size))
        pen = jnp.stack(pen, axis=1)
        if v_pad > vocab_size:
            pen = jnp.pad(pen, ((0, 0), (0, 0),
                                (0, v_pad - vocab_size)),
                          constant_values=float("-inf"))
        logits = pen
    temp = jnp.maximum(t.temperature, _EPS)
    greedy = t.temperature < _EPS
    scaled = logits / temp[:, None, None]
    flat = scaled.reshape(b * s, v_pad)
    if flags.get("do_top_k_top_p", False):
        flat = _apply_top_k_top_p(
            flat, jnp.repeat(t.top_k, s), jnp.repeat(t.top_p, s))
    if flags.get("do_min_p", False):
        from nmvllm_tpu.layers.sampler import _apply_min_p
        flat = _apply_min_p(flat, jnp.repeat(t.min_p, s))
    probs = jax.nn.softmax(flat, axis=-1).reshape(b, s, v_pad)
    argmax_tok = jnp.argmax(scaled, axis=-1).astype(jnp.int32)

    # Modified rejection sampling with one-hot proposals
    # (reference rejection_sampler.py; ngram/greedy-draft q is a
    # point mass, so accept d_j with prob p(d_j)). Greedy rows
    # reduce to exact argmax matching.
    k = num_spec
    keys = jax.vmap(jax.random.wrap_key_data)(t.key_data)

    def row_uniform(key):
        ks = jax.vmap(lambda j: jax.random.fold_in(key, j))(
            jnp.arange(2 * s))
        return jax.vmap(lambda kk: jax.random.uniform(kk))(ks)
    u = jax.vmap(row_uniform)(keys)          # (B, 2s)
    p_draft = jnp.take_along_axis(
        probs[:, :k, :], drafts[..., None], axis=-1)[..., 0]
    if acc_method == "typical_acceptance":
        # Entropy-adaptive deterministic acceptance (reference
        # typical_acceptance_sampler.py:100, MEDUSA §3.3.1).
        from nmvllm_tpu.spec_decode.rejection_sampler import (
            typical_acceptance_mask)
        accept_st = typical_acceptance_mask(
            probs[:, :k, :], drafts, typ_thr, typ_alpha)
    else:
        accept_st = u[:, :k] < p_draft
    accept_gr = drafts == argmax_tok[:, :k]
    match = jnp.where(greedy[:, None], accept_gr, accept_st) & (
        jnp.arange(k)[None, :] < draft_lens[:, None])
    acc = jnp.cumprod(match.astype(jnp.int32), axis=1)
    n_acc = jnp.sum(acc, axis=1)

    # Correction/bonus token at each position: greedy -> argmax;
    # stochastic -> gumbel sample from probs with the (rejected)
    # draft zeroed out (residual of the one-hot proposal).
    drafts_pad = jnp.concatenate(
        [drafts, jnp.full((b, 1), -1, jnp.int32)], axis=1)
    resid = probs.at[
        jnp.arange(b)[:, None], jnp.arange(s)[None, :],
        jnp.clip(drafts_pad, 0, v_pad - 1)].mul(
            jnp.where(drafts_pad >= 0, 0.0, 1.0))
    # Positionwise categorical via inverse-CDF on the residual.
    cdf = jnp.cumsum(resid, axis=-1)
    total = cdf[..., -1:]
    thresh = u[:, s:2 * s, None] * jnp.maximum(total, 1e-20)
    sampled_corr = jnp.sum(
        (cdf < thresh).astype(jnp.int32), axis=-1).astype(jnp.int32)
    sampled_corr = jnp.minimum(sampled_corr, v_pad - 1)
    if acc_method == "typical_acceptance":
        # Replacement is the target argmax (reference
        # _replacement_token_ids:155), not a residual sample.
        corr = argmax_tok
    else:
        corr = jnp.where(greedy[:, None], argmax_tok,
                         sampled_corr)
    # Position 0: draft-less (or greedy) rows use the full
    # sampler's token; stochastic rows with a rejected first draft
    # use the residual sample (exactness of modified rejection
    # sampling).
    if acc_method == "typical_acceptance":
        corr0 = jnp.where(draft_lens == 0, out0.next_tokens,
                          corr[:, 0])
    else:
        corr0 = jnp.where(greedy | (draft_lens == 0),
                          out0.next_tokens, sampled_corr[:, 0])
    corr = corr.at[:, 0].set(corr0)

    pos = jnp.arange(s)[None, :]
    accepted_tok = jnp.concatenate(
        [drafts, jnp.zeros((b, 1), jnp.int32)], axis=1)
    out_tokens = jnp.where(
        pos < n_acc[:, None], accepted_tok,
        jnp.where(pos == n_acc[:, None], corr, -1))
    lp_all = jax.nn.log_softmax(scaled, axis=-1)
    lp = jnp.take_along_axis(
        lp_all, jnp.maximum(out_tokens, 0)[..., None],
        axis=-1)[..., 0]
    lp = lp.at[:, 0].set(out0.logprob)
    if flags.get("num_logprobs", 0) > 0:
        topk_lp, topk_ids = jax.lax.top_k(
            lp_all, flags["num_logprobs"])
    else:
        topk_lp = topk_ids = None
    return (out_tokens, n_acc.astype(jnp.int32), lp, topk_ids, topk_lp)



class LoRAState:
    """Device-resident multi-LoRA state (reference: WorkerLoRAManager,
    vllm/lora/worker_manager.py): per-target-layer adapter slot stacks +
    an LRU slot manager. Stacks are jit inputs, so swapping adapters never
    recompiles the step."""

    def __init__(self, model, lora_config):
        from nmvllm_tpu.lora.layers import LoRAConfig as LC, make_lora_stacks
        from nmvllm_tpu.lora.models import LoRAModelManager
        self.config = LC(max_loras=lora_config.max_loras,
                         max_lora_rank=lora_config.max_lora_rank)
        self.manager = LoRAModelManager(self.config)
        self.manager.install_fn = self._install
        self.stacks = {}
        self.shards = {}
        for name, linear in _named_linears(model):
            self.stacks[name] = make_lora_stacks(
                self.config.max_loras, linear.in_features,
                linear.out_features, self.config.max_lora_rank)
            self.shards[name] = linear.shard

    def stack_specs(self):
        """TP shardings for the adapter stacks (reference: fully-sharded
        LoRA, vllm/lora/fully_sharded_layers.py). Column-parallel layers
        shard B on the output dim (delta is computed per output shard);
        row-parallel layers shard A on the input dim (the partial delta
        joins the layer's existing psum)."""
        specs = {}
        for name, shard in self.shards.items():
            if shard == "column":
                specs[name] = (P(), P(None, None, TP_AXIS))
            elif shard == "row":
                specs[name] = (P(None, TP_AXIS, None), P())
            else:
                specs[name] = (P(), P())
        return specs

    def _install(self, slot, lora_model):
        from nmvllm_tpu.lora.layers import clear_lora_slot, set_lora_slot
        for name in self.stacks:
            a, b = self.stacks[name]
            if lora_model is not None and name in lora_model.loras:
                a, b = set_lora_slot(a, b, slot, lora_model.loras[name])
            else:
                a, b = clear_lora_slot(a, b, slot)
            self.stacks[name] = (a, b)

    def slots_for_rows(self, rows) -> np.ndarray:
        out = np.zeros((len(rows),), np.int32)
        for i, (meta, _) in enumerate(rows):
            if meta.lora_request is not None:
                out[i] = self.manager.activate(
                    meta.lora_request.lora_int_id)
        return out


def _layer_named_linears(layer):
    """Ordered (name, Linear) LoRA targets of one decoder layer."""
    from nmvllm_tpu.layers.linear import Linear
    for block_name in ("self_attn", "mlp", "block_sparse_moe"):
        block = getattr(layer, block_name, None)
        if block is None:
            continue
        for attr, val in vars(block).items():
            if isinstance(val, Linear) and val.name:
                yield val.name, val


def _named_linears(model):
    for layer in model.layers:
        yield from _layer_named_linears(layer)


@dataclass
class _PreparedDecode:
    tokens: np.ndarray
    positions: np.ndarray
    slot_mapping: np.ndarray
    block_tables: np.ndarray
    context_lens: np.ndarray
    rows: List[Tuple[SequenceGroupMetadata, int]]  # (group meta, seq_id)
    # Array position of each row (== arange(len(rows)) except under
    # data parallelism, where rows sit in per-replica segments).
    row_idx: np.ndarray = None


class ModelRunner:

    def __init__(self, engine_config: EngineConfig, mesh) -> None:
        self.config = engine_config
        self.model_config = engine_config.model_config
        self.cache_config = engine_config.cache_config
        self.scheduler_config = engine_config.scheduler_config
        self.parallel_config = engine_config.parallel_config
        self.mesh = mesh
        self.tp_size = engine_config.parallel_config.tensor_parallel_size
        # Data-parallel decode (beyond the reference, whose DP is an
        # external load balancer — SURVEY §2.3): batch rows and the KV
        # block pool shard over the `data` mesh axis; replica r owns
        # pages [r*bpr, (r+1)*bpr) and the rows whose pages live there
        # (core/block_manager.py seq_replica). Block/slot ids are
        # localized host-side before entering shard_map.
        self.dp = engine_config.parallel_config.data_parallel_size
        # Sequence (context) parallelism: prefill tokens shard over the
        # `sp` mesh axis and attention runs as a K/V ring
        # (parallel/ring_attention.py). Decode replicates over sp.
        self.sp = engine_config.parallel_config.sequence_parallel_size
        self.block_size = engine_config.cache_config.block_size
        self.model = None
        self.params = None
        self._param_specs = None
        from nmvllm_tpu.parallel.mesh import DATA_AXIS
        self._batch_spec = P(DATA_AXIS) if self.dp > 1 else P()
        self._kv_spec = P(DATA_AXIS if self.dp > 1 else None, None,
                          TP_AXIS, None, None)
        self._step_fns: Dict[Any, Any] = {}
        self._rng = jax.random.PRNGKey(self.model_config.seed)
        # Host-side sampling for rows with plain logits processors
        # (in-graph sampling cannot run arbitrary Python callables).
        self._host_sample_rng = np.random.default_rng(
            self.model_config.seed)
        self.max_blocks_per_seq = cdiv(self.scheduler_config.max_model_len,
                                       self.block_size)
        # Recurrent-state slot pool (Mamba/Jamba layers): seq_id -> slot.
        # Freed via the scheduler's free_seq hook (engine wiring).
        self.num_state_slots = 2 * self.scheduler_config.max_num_seqs
        self._state_slots: Dict[int, int] = {}
        self._state_free: List[int] = list(range(self.num_state_slots))
        # MLP-speculator support: when set (by the executor, before the
        # first step), every compiled step also emits the target model's
        # last hidden state per row (reference HiddenStates tracking in
        # spec_decode_worker.py); stored host-side per sequence.
        self.capture_hidden = False
        self.seq_hidden: Dict[int, np.ndarray] = {}
        # Native batch-assembly mirror (csrc/host/nm_host.cpp): per-seq
        # block tables + lengths live in C memory, updated incrementally
        # (append_token per decode; full resync when the block manager's
        # table version moves); prepare_decode becomes one C call.
        self._native_reg: Any = None  # None=untried, False=unavailable
        self._native_map: Dict[int, list] = {}  # seq_id -> [slot, ver, len]
        self._native_free: List[int] = []

    # ------------------------------------------------------------------ load
    def load_model(self) -> None:
        from nmvllm_tpu.model_loader import get_model
        self.model, self.params = get_model(self.config, self.mesh)
        self._param_specs = self.model.specs()
        self.lora_state = None
        if self.config.lora_config is not None:
            self.lora_state = LoRAState(self.model,
                                        self.config.lora_config)

    # -------------------------------------------------------------- lora api
    def add_lora(self, lora_request) -> None:
        """Register (and load) an adapter (reference WorkerBase.add_lora)."""
        assert self.lora_state is not None, "engine built without LoRA"
        from nmvllm_tpu.lora.models import LoRAModel
        if lora_request.lora_int_id not in self.lora_state.manager.\
                list_loras():
            model = LoRAModel.from_local_checkpoint(
                lora_request.lora_local_path, lora_request.lora_int_id)
            self.lora_state.manager.register(model)

    def remove_lora(self, lora_id: int) -> None:
        assert self.lora_state is not None
        self.lora_state.manager.deregister(lora_id)

    def list_loras(self):
        return (self.lora_state.manager.list_loras()
                if self.lora_state else [])

    @property
    def vocab_size(self) -> int:
        return self.model_config.get_vocab_size()

    # -------------------------------------------------------------- buckets
    def decode_batch_buckets(self) -> List[int]:
        out = []
        b = 8
        cap = round_up(self.scheduler_config.max_num_seqs, 8)
        while b < cap:
            out.append(b)
            b *= 2
        out.append(cap)
        return out

    def pad_decode_batch(self, n: int) -> int:
        for b in self.decode_batch_buckets():
            if n <= b:
                return b
        return self.decode_batch_buckets()[-1]

    def pad_prefill_len(self, n: int) -> int:
        # Powers of two ≥ 16 (tpu_model_runner.py:591 pattern). Under
        # sequence parallelism every sp shard must hold ≥ 16 tokens so
        # the bucket is a multiple of 16*sp (both are powers of two).
        return max(16 * self.sp, next_power_of_2(n))

    # ---------------------------------------------------------- input build
    def _native_registry(self):
        if self._native_reg is None:
            from nmvllm_tpu.native import (NativeSeqRegistry,
                                           native_available)
            if native_available():
                cap = max(256, 4 * self.scheduler_config.max_num_seqs)
                self._native_reg = NativeSeqRegistry(cap)
                self._native_free = list(range(cap - 1, -1, -1))
            else:
                self._native_reg = False
        return self._native_reg or None

    def _native_slot(self, reg, seq_id: int) -> int:
        if not self._native_free:
            # Slots exhausted (finished seqs are not individually
            # reclaimed): drop the whole mirror and resync lazily.
            for slot, *_ in self._native_map.values():
                reg.clear_seq(slot)
            self._native_free = list(range(reg.max_seqs - 1, -1, -1))
            self._native_map.clear()
        return self._native_free.pop()

    def _prepare_decode_native(self, rows, b: int, row_idx: np.ndarray):
        """One-C-call batch assembly via the persistent registry; falls
        back to the Python path when the library is unavailable, a meta
        carries no table version, or rows are DP-segmented."""
        reg = self._native_registry()
        if reg is None or self.dp > 1:
            return None
        n = len(rows)
        row_slots = np.empty((n,), np.int32)
        for i, (meta, seq_id) in enumerate(rows):
            vers = meta.table_versions
            if vers is None or seq_id not in vers:
                return None  # hand-built metas (tests): no version info
            ver = vers[seq_id]
            data = meta.seq_data[seq_id]
            seq_len = data.get_len()
            last = data.get_last_token_id()
            ent = self._native_map.get(seq_id)
            if ent is None:
                slot = self._native_slot(reg, seq_id)
                reg.set_seq(slot, seq_len, last,
                            meta.block_tables[seq_id])
                self._native_map[seq_id] = [slot, ver, seq_len]
            else:
                slot, pver, plen = ent
                if ver == pver and seq_len == plen + 1:
                    # Steady decode: one token, table unchanged (any
                    # table growth bumps the version).
                    reg.append_token(slot, last)
                    ent[2] = seq_len
                else:
                    reg.set_seq(slot, seq_len, last,
                                meta.block_tables[seq_id])
                    ent[1], ent[2] = ver, seq_len
            row_slots[i] = self._native_map[seq_id][0]
        tokens, positions, slots, block_tables, ctx = reg.prepare_decode(
            row_slots, b, self.block_size, self.max_blocks_per_seq)
        return _PreparedDecode(tokens, positions, slots, block_tables, ctx,
                               rows, row_idx)

    @property
    def blocks_per_replica(self) -> int:
        return (self.cache_config.num_gpu_blocks or 0) // self.dp

    def _dp_replica_of(self, meta, seq_id) -> int:
        # All of a sequence's pages live in one replica (the block
        # manager partitions the pool), so the first block id names it.
        return meta.block_tables[seq_id][0] // self.blocks_per_replica

    def _dp_localize(self, slots, block_tables, b_local: int) -> None:
        """Subtract each replica segment's pool offset in place: inside
        shard_map replica r sees only its own (bpr, ...) pool shard."""
        bpr = self.blocks_per_replica
        off = np.repeat(np.arange(self.dp, dtype=np.int32) * bpr,
                        b_local)
        block_tables -= off[:, None]
        np.maximum(block_tables, 0, out=block_tables)  # pad entries
        off_slots = (off * self.block_size)[:, None]
        np.copyto(slots, np.where(slots >= 0, slots - off_slots, -1))

    def prepare_decode(
            self, metas: List[SequenceGroupMetadata]) -> _PreparedDecode:
        rows = []
        for meta in metas:
            for seq_id in sorted(meta.seq_data.keys()):
                rows.append((meta, seq_id))
        n = len(rows)
        if self.dp > 1:
            # Group rows by owning replica; the batch is dp equal
            # segments of b_local rows (SPMD: every shard equal).
            segs = [[] for _ in range(self.dp)]
            for row in rows:
                segs[self._dp_replica_of(*row)].append(row)
            b_local = self.pad_decode_batch(max(len(s) for s in segs))
            b = self.dp * b_local
            rows = [r for seg in segs for r in seg]
            row_idx = np.concatenate([
                np.arange(len(seg), dtype=np.int32) + r * b_local
                for r, seg in enumerate(segs)])
        else:
            b = self.pad_decode_batch(n)
            row_idx = np.arange(n, dtype=np.int32)
        native = self._prepare_decode_native(rows, b, row_idx)
        if native is not None:
            prep = native
        else:
            tokens = np.zeros((b, 1), np.int32)
            positions = np.zeros((b, 1), np.int32)
            slots = np.full((b, 1), -1, np.int32)
            block_tables = np.zeros((b, self.max_blocks_per_seq), np.int32)
            ctx = np.zeros((b,), np.int32)
            for i, (meta, seq_id) in zip(row_idx, rows):
                data = meta.seq_data[seq_id]
                seq_len = data.get_len()
                tokens[i, 0] = data.get_last_token_id()
                positions[i, 0] = seq_len - 1
                table = meta.block_tables[seq_id]
                block_tables[i, :len(table)] = table
                pos = seq_len - 1
                slots[i, 0] = table[pos // self.block_size] * \
                    self.block_size + pos % self.block_size
                ctx[i] = seq_len
            prep = _PreparedDecode(tokens, positions, slots, block_tables,
                                   ctx, rows, row_idx)
        if self.dp > 1:
            self._dp_localize(prep.slot_mapping, prep.block_tables,
                              b // self.dp)
        return prep

    def build_sampling_tensors(
        self, rows: List[Tuple[SequenceGroupMetadata, int]], batch_pad: int,
        row_idx: Optional[np.ndarray] = None,
    ) -> Tuple[SamplingTensors, Dict[str, Any]]:
        n = len(rows)
        b = batch_pad
        # Array position per row (DP-segmented batches place rows in
        # per-replica segments; see _PreparedDecode.row_idx).
        idx = row_idx if row_idx is not None else np.arange(n)
        vocab = self.vocab_size
        temperature = np.ones((b,), np.float32)
        top_k = np.zeros((b,), np.int32)
        top_p = np.ones((b,), np.float32)
        min_p = np.zeros((b,), np.float32)
        pres = np.zeros((b,), np.float32)
        freq = np.zeros((b,), np.float32)
        rep = np.ones((b,), np.float32)
        key_data = np.zeros((b, 2), np.uint32)

        do_penalties = False
        do_min_tokens = False
        do_top_k_top_p = False
        do_min_p = False
        do_guided = False
        do_logit_bias = False
        max_bias = 1
        num_logprobs = 0
        max_out = 1
        max_prompt = 1
        max_ban = 1
        max_allow = 1
        guided_sets: Dict[int, Any] = {}
        for (meta, seq_id) in rows:
            sp = meta.sampling_params or SamplingParams()
            data = meta.seq_data[seq_id]
            if (sp.presence_penalty != 0.0 or sp.frequency_penalty != 0.0
                    or sp.repetition_penalty != 1.0):
                do_penalties = True
                max_out = max(max_out, data.get_output_len())
                max_prompt = max(max_prompt, data.get_prompt_len())
            if (sp.min_tokens > 0
                    and data.get_output_len() < sp.min_tokens
                    and sp.all_stop_token_ids):
                do_min_tokens = True
                max_ban = max(max_ban, len(sp.all_stop_token_ids))
            if sp.top_k > 0 or sp.top_p < 1.0:
                do_top_k_top_p = True
            if sp.min_p > 0.0:
                do_min_p = True
            if sp.logprobs is not None or sp.use_beam_search:
                # Beam search consumes the top-k capture host-side
                # (2*beam_width candidates per parent).
                num_logprobs = _MAX_NUM_LOGPROBS
            if sp.logit_bias:
                do_logit_bias = True
                max_bias = max(max_bias, len(sp.logit_bias))

        for i, (meta, seq_id) in zip(idx, rows):
            sp = meta.sampling_params or SamplingParams()
            for proc in sp.logits_processors:
                if getattr(proc, "is_guided", False):
                    allowed = proc.allowed_token_ids(
                        meta.seq_data[seq_id].output_token_ids)
                    if allowed is not None:
                        allowed = {t for t in allowed if t is not None}
                        guided_sets[i] = allowed
                        do_guided = True
                        max_allow = max(max_allow, len(allowed))

        hist_out = max(8, next_power_of_2(max_out))
        hist_prompt = max(8, next_power_of_2(max_prompt))
        ban_pad = max(8, next_power_of_2(max_ban))
        allow_pad = max(8, next_power_of_2(max_allow))
        allowed_arr = np.full((b, allow_pad), vocab, np.int32)
        for i, allowed in guided_sets.items():
            ids = sorted(allowed)[:allow_pad]
            allowed_arr[i, :len(ids)] = ids
        out_tokens = np.full((b, hist_out if do_penalties else 8), vocab,
                             np.int32)
        prompt_tokens = np.full((b, hist_prompt if do_penalties else 8),
                                vocab, np.int32)
        banned = np.full((b, ban_pad), vocab, np.int32)
        bias_pad = max(8, next_power_of_2(max_bias))
        bias_tokens = np.full((b, bias_pad), vocab, np.int32)
        bias_values = np.zeros((b, bias_pad), np.float32)
        if do_logit_bias:
            for i, (meta, seq_id) in zip(idx, rows):
                sp = meta.sampling_params or SamplingParams()
                if sp.logit_bias:
                    items = list(sp.logit_bias.items())[:bias_pad]
                    for r2, (tid, val) in enumerate(items):
                        bias_tokens[i, r2] = tid
                        bias_values[i, r2] = val

        for i, (meta, seq_id) in zip(idx, rows):
            sp = meta.sampling_params or SamplingParams()
            data = meta.seq_data[seq_id]
            temperature[i] = sp.temperature
            top_k[i] = sp.top_k if sp.top_k > 0 else 0
            top_p[i] = sp.top_p
            min_p[i] = sp.min_p
            pres[i] = sp.presence_penalty
            freq[i] = sp.frequency_penalty
            rep[i] = sp.repetition_penalty
            if sp.sampling_type == SamplingType.RANDOM_SEED:
                base_seed = int(sp.seed)
            else:
                base_seed = self.model_config.seed * 1000003 + (
                    meta.state_seed if meta.state_seed is not None
                    else abs(hash(meta.request_id)) % (2**31))
            from nmvllm_tpu.layers.sampler import make_key_data
            # Fold the sibling INDEX within the group (not the global
            # seq_id) so user-seeded requests reproduce across engine runs.
            sibling = sorted(meta.seq_data.keys()).index(seq_id)
            key_data[i] = make_key_data(
                base_seed, data.get_output_len() * 1009 + sibling)
            if do_penalties:
                out_ids = data.output_token_ids[-hist_out:]
                out_tokens[i, :len(out_ids)] = out_ids
                p_ids = data.prompt_token_ids[:hist_prompt]
                prompt_tokens[i, :len(p_ids)] = p_ids
            if (sp.min_tokens > 0
                    and data.get_output_len() < sp.min_tokens):
                ids = list(sp.all_stop_token_ids)[:ban_pad]
                banned[i, :len(ids)] = ids

        tensors = SamplingTensors(
            temperature=jnp.asarray(temperature),
            top_k=jnp.asarray(top_k), top_p=jnp.asarray(top_p),
            min_p=jnp.asarray(min_p),
            presence_penalty=jnp.asarray(pres),
            frequency_penalty=jnp.asarray(freq),
            repetition_penalty=jnp.asarray(rep),
            key_data=jnp.asarray(key_data),
            output_tokens=jnp.asarray(out_tokens),
            prompt_tokens=jnp.asarray(prompt_tokens),
            banned_tokens=jnp.asarray(banned),
            allowed_tokens=jnp.asarray(allowed_arr),
            bias_tokens=jnp.asarray(bias_tokens),
            bias_values=jnp.asarray(bias_values))
        flags = dict(do_penalties=do_penalties, do_min_tokens=do_min_tokens,
                     do_top_k_top_p=do_top_k_top_p, do_min_p=do_min_p,
                     do_guided=do_guided, do_logit_bias=do_logit_bias,
                     num_logprobs=num_logprobs)
        return tensors, flags

    # -------------------------------------------------------- compiled steps
    def _specs_tuple(self):
        if hasattr(self.model, "cache_pspecs"):
            # Heterogeneous caches (Jamba: paged KV + recurrent state).
            return self._param_specs, self.model.cache_pspecs(self._kv_spec)
        kv_specs = [self._kv_spec for _ in range(len(self.model.layers))]
        return self._param_specs, kv_specs

    # -------------------------------------------- host logits processors
    def _rows_with_processors(self, rows):
        """{batch-list index: [callable, ...]} for rows carrying plain
        (non-guided) logits processors — those cannot run in-graph, so
        their sampling reroutes through the host (reference applies the
        callables on the logits tensor per row, sampler.py
        _apply_logits_processors)."""
        out = {}
        for i, (meta, seq_id) in enumerate(rows):
            sp = meta.sampling_params
            if sp is None or sp.use_beam_search:
                continue
            procs = [p for p in sp.logits_processors
                     if not getattr(p, "is_guided", False)]
            if procs:
                out[i] = procs
        return out

    def _host_process_sample(self, logits_row, sp, procs, prev_tokens,
                             prompt_tokens=(), salt=0):
        """Apply per-request logits processors host-side and sample one
        token, mirroring the in-graph sampler's full pipeline for this
        row: processors -> logit_bias -> penalties -> min-tokens stop
        ban -> guided mask -> temperature + top-k/top-p/min_p.
        Returns (token, logprob, processed_scaled_logits)."""
        arr = np.array(np.asarray(logits_row)[:self.vocab_size],
                       np.float32)
        for proc in procs:
            arr = np.asarray(proc(list(prev_tokens), arr), np.float32)
        if sp.logit_bias:
            for tid, bias in sp.logit_bias.items():
                t = int(tid)
                if 0 <= t < arr.size:
                    arr[t] += float(bias)
        out_ids = np.asarray(list(prev_tokens), np.int64)
        if (sp.presence_penalty or sp.frequency_penalty
                or sp.repetition_penalty != 1.0):
            counts = np.bincount(out_ids[(out_ids >= 0) &
                                         (out_ids < arr.size)],
                                 minlength=arr.size)
            if sp.repetition_penalty != 1.0:
                seen = counts > 0
                pids = np.asarray(list(prompt_tokens), np.int64)
                seen[pids[(pids >= 0) & (pids < arr.size)]] = True
                rp = sp.repetition_penalty
                arr[seen] = np.where(arr[seen] > 0, arr[seen] / rp,
                                     arr[seen] * rp)
            arr -= sp.frequency_penalty * counts
            arr -= sp.presence_penalty * (counts > 0)
        if sp.min_tokens > 0 and len(prev_tokens) < sp.min_tokens:
            for t in sp.all_stop_token_ids:
                if t is not None and 0 <= int(t) < arr.size:
                    arr[int(t)] = -np.inf
        for proc in sp.logits_processors:
            if getattr(proc, "is_guided", False):
                allowed = proc.allowed_token_ids(list(prev_tokens))
                if allowed is not None:
                    mask = np.full_like(arr, -np.inf)
                    ids = [int(t) for t in allowed
                           if t is not None and 0 <= int(t) < arr.size]
                    mask[ids] = 0.0
                    arr = arr + mask
        if sp.temperature == 0.0:
            scaled = arr
            tok = int(arr.argmax())
        else:
            scaled = arr / max(sp.temperature, 1e-5)
            masked = scaled.copy()
            if sp.top_k and 0 < sp.top_k < masked.size:
                thr = np.partition(masked, -sp.top_k)[-sp.top_k]
                masked[masked < thr] = -np.inf
            if sp.top_p < 1.0:
                order = np.argsort(-masked)
                s = masked[order]
                p = np.exp(s - s.max())
                p = p / p.sum()
                keep_n = max(1, int(np.searchsorted(
                    np.cumsum(p), sp.top_p) + 1))
                cut = np.full_like(masked, -np.inf)
                cut[order[:keep_n]] = masked[order[:keep_n]]
                masked = cut
            if sp.min_p > 0.0:
                pm = np.exp(masked - np.nanmax(masked))
                pm[~np.isfinite(pm)] = 0.0
                pm /= max(pm.sum(), 1e-20)
                masked[pm < sp.min_p * pm.max()] = -np.inf
            p = np.exp(masked - np.nanmax(masked))
            p[~np.isfinite(p)] = 0.0
            p = p / p.sum()
            # Seeded rows fold the step (output length) and sibling salt
            # into the stream so each step advances (the in-graph
            # sampler folds output_len into its key the same way).
            rng = (np.random.default_rng(
                (sp.seed, len(prev_tokens), salt))
                if sp.seed is not None else self._host_sample_rng)
            tok = int(rng.choice(p.size, p=p))
        lse = float(np.logaddexp.reduce(scaled.astype(np.float64)))
        return tok, float(scaled[tok]) - lse, scaled

    def _patch_processor_rows(self, out, proc_rows, logits_np, rows,
                              row_idx=None):
        """Replace in-graph samples of processor rows with host samples
        computed from the processed logits; returns a patched
        SamplerOutputArrays-compatible object (numpy fields)."""
        from nmvllm_tpu.layers.sampler import SamplerOutputArrays
        next_tokens = np.array(np.asarray(out.next_tokens))
        chosen_lp = np.array(np.asarray(out.logprob))
        topk_ids = (np.array(np.asarray(out.topk_ids))
                    if out.topk_ids is not None else None)
        topk_lp = (np.array(np.asarray(out.topk_logprobs))
                   if out.topk_logprobs is not None else None)
        pos = list(row_idx) if row_idx is not None else \
            list(range(len(rows)))
        for li, procs in proc_rows.items():
            meta, seq_id = rows[li]
            bi = pos[li]
            sp = meta.sampling_params
            data = meta.seq_data[seq_id]
            prev = data.output_token_ids
            # Sibling salt: the position WITHIN the group (stable across
            # requests, unlike the global seq_id) so best_of siblings
            # draw distinct seeded streams that stay reproducible.
            sibling = list(meta.seq_data).index(seq_id)
            tok, lp, scaled = self._host_process_sample(
                logits_np[bi], sp, procs, prev,
                prompt_tokens=data.prompt_token_ids, salt=sibling)
            next_tokens[bi] = tok
            chosen_lp[bi] = lp
            if topk_ids is not None and sp.logprobs:
                want = min(topk_ids.shape[1], scaled.size)
                top = np.argpartition(-scaled, want - 1)[:want]
                top = top[np.argsort(-scaled[top])]
                lse = float(np.logaddexp.reduce(
                    scaled.astype(np.float64)))
                topk_ids[bi, :want] = top
                topk_lp[bi, :want] = scaled[top] - lse
        return SamplerOutputArrays(next_tokens, chosen_lp, topk_ids,
                                   topk_lp)

    def _get_decode_fn(self, flags_key, use_lora: bool = False,
                       return_logits: bool = False):
        key = ("decode", flags_key, use_lora, return_logits)
        if key in self._step_fns:
            return self._step_fns[key]
        flags = dict(flags_key)
        model = self.model
        param_specs, kv_specs = self._specs_tuple()
        mesh = self.mesh
        vocab_size = self.vocab_size

        def fwd(params, kv_caches, tokens, positions, slots, block_tables,
                ctx, state_slots, lora_indices, lora_stacks):
            from nmvllm_tpu.lora.context import lora_scope
            meta = AttentionMetadata(
                slot_mapping=slots, block_tables=block_tables,
                context_lens=ctx, seq_lens=jnp.ones_like(ctx),
                prefix_lens=jnp.zeros_like(ctx),
                state_slots=state_slots)
            scope = (lora_scope(lora_indices, lora_stacks) if use_lora
                     else contextlib.nullcontext())
            with scope:
                x, kv_caches = model.forward(params, tokens, positions,
                                             kv_caches, meta,
                                             is_prefill=False)
            logits = model.compute_logits(params, x[:, 0, :])
            if capture_hidden:
                return logits, kv_caches, x[:, 0, :]
            return logits, kv_caches

        capture_hidden = self.capture_hidden
        lora_specs = (P(), self._lora_spec_tree())
        bspec = self._batch_spec
        hid_spec = ((bspec,) if capture_hidden else ())
        sharded_fwd = shard_map_fn(
            fwd, mesh,
            in_specs=(param_specs, kv_specs, bspec, bspec, bspec, bspec,
                      bspec, P(), *lora_specs),
            out_specs=(bspec, kv_specs) + hid_spec)

        # Multi-host pods: row-sharded (data-axis) outputs span
        # non-addressable devices, so the host could not np.asarray
        # them — replicate everything the host reads in-graph (one
        # all-gather over dp; single-host keeps the sharded fast path).
        import jax as _jax
        replicate_out = self.dp > 1 and _jax.process_count() > 1

        def _host_visible(tree):
            if not replicate_out:
                return tree
            from jax.sharding import NamedSharding
            rep = NamedSharding(mesh, P())
            return jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, rep), tree)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, kv_caches, tokens, positions, slots, block_tables,
                 ctx, state_slots, sampling_tensors, lora_indices,
                 lora_stacks):
            res = sharded_fwd(params, kv_caches, tokens,
                              positions, slots, block_tables,
                              ctx, state_slots, lora_indices,
                              lora_stacks)
            logits, kv_caches = res[0], res[1]
            out = sample(logits, sampling_tensors, vocab_size=vocab_size,
                         **flags)
            rets = [kv_caches, _host_visible(out)]
            if capture_hidden:
                rets.append(_host_visible(res[2]))
            if return_logits:
                # Host-side logits-processor rows re-sample on the host.
                rets.append(_host_visible(logits))
            return tuple(rets)

        self._step_fns[key] = step
        return step

    def _lora_stack_template(self):
        return (self.lora_state.stacks
                if getattr(self, "lora_state", None) else {})

    def _lora_spec_tree(self):
        if getattr(self, "lora_state", None) is None:
            return {}
        return self.lora_state.stack_specs()

    def _lora_args(self, rows, batch_pad: int, row_idx=None):
        if getattr(self, "lora_state", None) is None:
            return False, jnp.zeros((batch_pad,), jnp.int32), {}
        idx = np.zeros((batch_pad,), np.int32)
        pos = row_idx if row_idx is not None else np.arange(len(rows))
        idx[pos] = self.lora_state.slots_for_rows(rows)
        use = bool(idx.any())
        return use, jnp.asarray(idx), self.lora_state.stacks

    # -------------------------------------------------- recurrent state
    def _model_is_stateful(self) -> bool:
        return bool(getattr(self.model, "has_state_layers", False))

    def state_slot_for(self, seq_id: int, create: bool = False) -> int:
        if seq_id in self._state_slots:
            return self._state_slots[seq_id]
        if not create:
            raise KeyError(f"no state slot for seq {seq_id}")
        if not self._state_free:
            raise RuntimeError("recurrent-state slot pool exhausted")
        slot = self._state_free.pop()
        self._state_slots[seq_id] = slot
        return slot

    def free_state_slot(self, seq_id: int) -> None:
        slot = self._state_slots.pop(seq_id, None)
        if slot is not None:
            self._state_free.append(slot)

    def free_seq_hidden(self, seq_id: int) -> None:
        self.seq_hidden.pop(seq_id, None)

    def _state_slots_for_rows(self, rows, batch_pad: int,
                              create: bool = False,
                              row_idx=None) -> np.ndarray:
        out = np.full((batch_pad,), np.iinfo(np.int32).max, np.int32)
        if self._model_is_stateful():
            pos = row_idx if row_idx is not None else range(len(rows))
            for i, (meta, sid) in zip(pos, rows):
                out[i] = self.state_slot_for(sid, create=create)
        return out

    def _get_prefill_fn(self, flags_key, has_prefix: bool, do_sample: bool,
                        n_samples: int = 1, use_lora: bool = False,
                        num_prompt_logprobs: int = 0,
                        has_image: bool = False, image_key=None,
                        return_logits: bool = False):
        key = ("prefill", flags_key, has_prefix, do_sample, n_samples,
               use_lora, num_prompt_logprobs, has_image, image_key,
               return_logits)
        if key in self._step_fns:
            return self._step_fns[key]
        flags = dict(flags_key)
        model = self.model
        param_specs, kv_specs = self._specs_tuple()
        mesh = self.mesh
        vocab_size = self.vocab_size

        dp = self.dp
        sp = self.sp

        def fwd(params, kv_caches, tokens, positions, slots, block_tables,
                ctx, seq_lens, prefix_lens, state_slots, pixel_values,
                owner, lora_indices, lora_stacks):
            from nmvllm_tpu.lora.context import lora_scope
            meta = AttentionMetadata(
                slot_mapping=slots, block_tables=block_tables,
                context_lens=ctx, seq_lens=seq_lens,
                prefix_lens=prefix_lens, state_slots=state_slots)
            scope = (lora_scope(lora_indices, lora_stacks) if use_lora
                     else contextlib.nullcontext())
            if sp > 1:
                from nmvllm_tpu.parallel.ring_attention import (
                    sp_prefill_scope)
                from nmvllm_tpu.parallel.mesh import SP_AXIS
                sp_scope = sp_prefill_scope(SP_AXIS)
            else:
                sp_scope = contextlib.nullcontext()
            mm_kw = {"pixel_values": pixel_values} if has_image else {}
            if has_image and sp > 1:
                raise NotImplementedError(
                    "multimodal prefill is not supported with "
                    "sequence_parallel_size > 1 (the vision-token merge "
                    "indexes the full token axis)")
            if has_image and image_key is not None:
                # Static crop-grid metadata (phi3v HD transform).
                mm_kw["image_sizes"] = image_key
            with scope, sp_scope:
                x, kv_caches = model.forward(params, tokens, positions,
                                             kv_caches, meta,
                                             is_prefill=True,
                                             has_prefix=has_prefix,
                                             **mm_kw)
            if sp > 1:
                # Token shards computed independently; reassemble the
                # full chunk for last-token selection / prompt logprobs.
                from nmvllm_tpu.parallel.mesh import SP_AXIS
                x = jax.lax.all_gather(x, SP_AXIS, axis=1, tiled=True)
                tokens = jax.lax.all_gather(tokens, SP_AXIS, axis=1,
                                            tiled=True)
            if dp > 1:
                # The prompt computes on every data replica, but only the
                # owner (whose pool shard holds the sequence's pages and
                # took the KV writes; non-owners ran with slots=-1 and
                # zeroed tables) produced valid activations when the
                # chunk read paged prefix state. Select the owner's x.
                from nmvllm_tpu.parallel.mesh import DATA_AXIS
                x = jax.lax.psum(x * owner[0].astype(x.dtype), DATA_AXIS)
            hidden = model.select_last_token(x, seq_lens)
            hid0 = hidden
            if do_sample:
                if n_samples > 1:
                    # best_of siblings: same prompt logits, distinct keys.
                    hidden = jnp.tile(hidden, (n_samples, 1))
                logits = model.compute_logits(params, hidden)
            else:
                logits = jnp.zeros((tokens.shape[0], 8), jnp.float32)
            if num_prompt_logprobs > 0:
                # Per-position prompt logprobs (reference: prompt_logprobs
                # flowing through _process_sequence_group_outputs).
                t = x.shape[1]
                all_logits = model.compute_logits(
                    params, x.reshape(-1, x.shape[-1])).astype(jnp.float32)
                v_pad = all_logits.shape[-1]
                if v_pad > vocab_size:
                    all_logits = jnp.where(
                        jnp.arange(v_pad)[None, :] < vocab_size,
                        all_logits, float("-inf"))
                lp = jax.nn.log_softmax(all_logits, axis=-1)
                # Position j predicts token j+1 of the chunk.
                nxt = jnp.concatenate(
                    [tokens[0, 1:], jnp.zeros((1,), jnp.int32)])
                chosen = jnp.take_along_axis(
                    lp, nxt[:, None], axis=-1)[:, 0]
                topk_lp, topk_ids = jax.lax.top_k(lp, num_prompt_logprobs)
                prompt_lp = (chosen, topk_ids, topk_lp)
            else:
                prompt_lp = None
            if capture_hidden:
                return logits, prompt_lp, kv_caches, hid0
            return logits, prompt_lp, kv_caches

        capture_hidden = self.capture_hidden
        lora_specs = (P(), self._lora_spec_tree())
        prompt_lp_spec = ((P(), P(), P())
                          if num_prompt_logprobs > 0 else None)
        hid_spec = ((P(),) if capture_hidden else ())
        bspec = self._batch_spec
        if sp > 1:
            from nmvllm_tpu.parallel.mesh import SP_AXIS
            tok_spec = P(None, SP_AXIS)   # (B, T) sharded along tokens
        else:
            tok_spec = P()
        slot_spec = tok_spec if sp > 1 else bspec
        sharded_fwd = shard_map_fn(
            fwd, mesh,
            in_specs=(param_specs, kv_specs, tok_spec, tok_spec, slot_spec,
                      bspec, P(), P(), P(), P(), P(), bspec, *lora_specs),
            out_specs=(P(), prompt_lp_spec, kv_specs) + hid_spec)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, kv_caches, tokens, positions, slots, block_tables,
                 ctx, seq_lens, prefix_lens, state_slots, pixel_values,
                 owner, sampling_tensors, lora_indices, lora_stacks):
            res = sharded_fwd(
                params, kv_caches, tokens, positions, slots, block_tables,
                ctx, seq_lens, prefix_lens, state_slots, pixel_values,
                owner, lora_indices, lora_stacks)
            logits, prompt_lp, kv_caches = res[0], res[1], res[2]
            if do_sample:
                out = sample(logits, sampling_tensors,
                             vocab_size=vocab_size, **flags)
            else:
                out = None
            rets = [kv_caches, out, prompt_lp]
            if capture_hidden:
                rets.append(res[3])
            if return_logits:
                rets.append(logits)
            return tuple(rets)

        self._step_fns[key] = step
        return step

    def _get_spec_decode_fn(self, num_spec: int, flags_key,
                            use_lora: bool = False):
        """Verification step for speculative decoding.

        Reference: vllm/spec_decode/spec_decode_worker.py:73 (score + accept)
        rebuilt TPU-native: one compiled multi-query decode — each sequence
        feeds [last_token, draft_0..draft_{k-1}] through the chunked-prefill
        attention path (queries attend to the paged context plus each other
        causally), logits are computed at ALL k+1 positions, and greedy
        acceptance (rejection_sampler.py analogue) runs in-graph. Position 0
        runs the full sampler so non-greedy/penalized rows (draft_len=0)
        still sample correctly in the same step.
        """
        spec_cfg = self.config.speculative_config
        acc_method = (getattr(spec_cfg, "acceptance_method",
                              "rejection_sampler")
                      if spec_cfg else "rejection_sampler")
        typ_thr = float(getattr(
            spec_cfg, "typical_acceptance_sampler_posterior_threshold",
            0.09) if spec_cfg else 0.09)
        typ_alpha = float(getattr(
            spec_cfg, "typical_acceptance_sampler_posterior_alpha", 0.3)
            if spec_cfg else 0.3)
        key = ("spec", num_spec, flags_key, use_lora, acc_method)
        if key in self._step_fns:
            return self._step_fns[key]
        flags = dict(flags_key)
        model = self.model
        param_specs, kv_specs = self._specs_tuple()
        mesh = self.mesh
        vocab_size = self.vocab_size
        s = num_spec + 1

        def fwd(params, kv_caches, tokens, positions, slots, block_tables,
                ctx, seq_lens, prefix_lens, lora_indices, lora_stacks):
            from nmvllm_tpu.lora.context import lora_scope
            meta = AttentionMetadata(
                slot_mapping=slots, block_tables=block_tables,
                context_lens=ctx, seq_lens=seq_lens,
                prefix_lens=prefix_lens)
            scope = (lora_scope(lora_indices, lora_stacks) if use_lora
                     else contextlib.nullcontext())
            with scope:
                x, kv_caches = model.forward(params, tokens, positions,
                                             kv_caches, meta,
                                             is_prefill=True,
                                             has_prefix=True)
            b = x.shape[0]
            logits = model.compute_logits(
                params, x.reshape(b * s, x.shape[-1]))
            if capture_hidden:
                return logits.reshape(b, s, -1), kv_caches, x
            return logits.reshape(b, s, -1), kv_caches

        capture_hidden = self.capture_hidden
        lora_specs = (P(), self._lora_spec_tree())
        hid_spec = ((P(),) if capture_hidden else ())
        sharded_fwd = shard_map_fn(
            fwd, mesh,
            in_specs=(param_specs, kv_specs, P(), P(), P(), P(), P(), P(),
                      P(), *lora_specs),
            out_specs=(P(), kv_specs) + hid_spec)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, kv_caches, tokens, positions, slots, block_tables,
                 ctx, seq_lens, prefix_lens, drafts, draft_lens,
                 sampling_tensors, lora_indices, lora_stacks):
            from nmvllm_tpu.layers.sampler import (_EPS,
                                                   _apply_top_k_top_p)
            res_fwd = sharded_fwd(params, kv_caches, tokens,
                                  positions, slots, block_tables,
                                  ctx, seq_lens, prefix_lens,
                                  lora_indices, lora_stacks)
            logits, kv_caches = res_fwd[0], res_fwd[1]
            out_t = spec_accept_and_sample(
                logits.astype(jnp.float32), sampling_tensors, flags,
                drafts, draft_lens, vocab_size=vocab_size,
                num_spec=num_spec, acc_method=acc_method,
                typ_thr=typ_thr, typ_alpha=typ_alpha)
            if capture_hidden:
                return kv_caches, out_t, res_fwd[2]
            return kv_caches, out_t

        self._step_fns[key] = step
        return step

    def _get_propose_fn(self, k: int, catchup: bool = False):
        """Draft-model proposal: k greedy decode steps in ONE compiled
        lax.scan (reference MultiStepWorker, spec_decode/
        multi_step_worker.py:17 — k sequential draft forwards).

        ``catchup``: run one extra masked forward BEFORE the proposal
        chain to backfill the draft-KV hole a fully-accepted previous run
        leaves behind (the last accepted proposal is never fed back as a
        draft input when the bonus token advances the sequence past it —
        reference tracks the same staleness in multi_step_worker's
        previous_hidden_states handling). Rows without a hole carry
        slot=-1 so the pre-step writes nothing for them."""
        key = ("propose", k, catchup)
        if key in self._step_fns:
            return self._step_fns[key]
        model = self.model
        param_specs, kv_specs = self._specs_tuple()
        mesh = self.mesh
        block_size = self.block_size

        def fwd(params, kv_caches, tokens, positions, slots, block_tables,
                ctx):
            meta = AttentionMetadata(
                slot_mapping=slots, block_tables=block_tables,
                context_lens=ctx, seq_lens=jnp.ones_like(ctx),
                prefix_lens=jnp.zeros_like(ctx))
            x, kv_caches = model.forward(params, tokens, positions,
                                         kv_caches, meta, is_prefill=False)
            logits = model.compute_logits(params, x[:, 0, :])
            return jnp.argmax(logits, -1).astype(jnp.int32), kv_caches

        sharded = shard_map_fn(
            fwd, mesh,
            in_specs=(param_specs, kv_specs, P(), P(), P(), P(), P()),
            out_specs=(P(), kv_specs))

        @functools.partial(jax.jit, donate_argnums=(1,))
        def propose(params, kv_caches, tokens, positions, block_tables,
                    cu_tokens, cu_mask):
            if catchup:
                # Backfill position pos-1 for flagged rows (one masked
                # forward; output discarded, only the KV write matters).
                cu_pos = jnp.maximum(positions - 1, 0)
                p = cu_pos[:, 0]
                cu_slots = (jnp.take_along_axis(
                    block_tables, (p // block_size)[:, None],
                    axis=1)[:, 0] * block_size + p % block_size)
                cu_slots = jnp.where(cu_mask, cu_slots, -1)[:, None]
                _, kv_caches = sharded(params, kv_caches, cu_tokens,
                                       cu_pos, cu_slots, block_tables,
                                       jnp.maximum(p + 1, 1))

            def body(carry, _):
                kv_caches, tokens, positions = carry
                pos = positions[:, 0]
                slots = (jnp.take_along_axis(
                    block_tables, (pos // block_size)[:, None],
                    axis=1)[:, 0] * block_size + pos % block_size)[:, None]
                nxt, kv_caches = sharded(params, kv_caches, tokens,
                                         positions, slots, block_tables,
                                         pos + 1)
                return (kv_caches, nxt[:, None], positions + 1), nxt

            (kv_caches, _, _), toks = jax.lax.scan(
                body, (kv_caches, tokens, positions), None, length=k)
            return kv_caches, toks.T  # (B, k)

        self._step_fns[key] = propose
        return propose

    def propose_greedy(self, metas: List[SequenceGroupMetadata], kv_caches,
                       k: int, catchup_tokens=None):
        """Greedy k-token draft proposals for each decode row.

        ``catchup_tokens``: optional {row_index: token_at_pos-2} map; those
        rows get a masked KV-backfill forward before the proposal chain
        (draft-KV hole after a fully-accepted previous run)."""
        prep = self.prepare_decode(metas)
        b = prep.tokens.shape[0]
        catchup = bool(catchup_tokens)
        cu_tokens = np.zeros((b, 1), np.int32)
        cu_mask = np.zeros((b,), bool)
        if catchup:
            for i, tok in catchup_tokens.items():
                cu_tokens[i, 0] = tok
                cu_mask[i] = True
        fn = self._get_propose_fn(k, catchup)
        kv_caches, toks = fn(self.params, kv_caches,
                             jnp.asarray(prep.tokens),
                             jnp.asarray(prep.positions),
                             jnp.asarray(prep.block_tables),
                             jnp.asarray(cu_tokens),
                             jnp.asarray(cu_mask))
        return kv_caches, np.asarray(toks)[:len(prep.rows)]

    # ------------------------------------------------------------- execution
    def execute_decode(self, metas: List[SequenceGroupMetadata],
                       kv_caches) -> Tuple[Any, SamplerOutput]:
        prep = self.prepare_decode(metas)
        b = prep.tokens.shape[0]
        tensors, flags = self.build_sampling_tensors(prep.rows, b,
                                                     prep.row_idx)
        flags_key = tuple(sorted(flags.items()))
        use_lora, lora_idx, lora_stacks = self._lora_args(prep.rows, b,
                                                          prep.row_idx)
        proc_rows = self._rows_with_processors(prep.rows)
        step = self._get_decode_fn(flags_key, use_lora,
                                   return_logits=bool(proc_rows))
        logger.debug("decode step: B=%d rows=%d flags=%s lora=%s", b,
                     len(prep.rows), flags, use_lora)
        state_slots = self._state_slots_for_rows(prep.rows, b,
                                                 row_idx=prep.row_idx)
        res = step(self.params, kv_caches,
                   jnp.asarray(prep.tokens),
                   jnp.asarray(prep.positions),
                   jnp.asarray(prep.slot_mapping),
                   jnp.asarray(prep.block_tables),
                   jnp.asarray(prep.context_lens),
                   jnp.asarray(state_slots), tensors,
                   lora_idx, lora_stacks)
        kv_caches, out = res[0], res[1]
        if self.capture_hidden:
            hid = np.asarray(res[2])
            pos = (prep.row_idx if prep.row_idx is not None
                   else range(len(prep.rows)))
            for i, (_, sid) in zip(pos, prep.rows):
                self.seq_hidden[sid] = hid[i]
        if proc_rows:
            out = self._patch_processor_rows(out, proc_rows,
                                             np.asarray(res[-1]),
                                             prep.rows, prep.row_idx)
        sampler_output = self._to_sampler_output(out, prep.rows, metas,
                                                 prep.row_idx)
        return kv_caches, sampler_output

    def execute_spec_decode(
        self, metas: List[SequenceGroupMetadata], kv_caches,
        proposals: List[List[int]], num_spec: int,
    ) -> Tuple[Any, SamplerOutput]:
        """One spec-decode step over an all-decode batch.

        ``proposals[i]`` is the (possibly empty) draft-token list for the
        i-th sequence row. Emits 1..num_spec+1 tokens per row.
        """
        prep = self.prepare_decode(metas)
        b = prep.tokens.shape[0]
        s = num_spec + 1
        tokens = np.zeros((b, s), np.int32)
        positions = np.zeros((b, s), np.int32)
        slots = np.full((b, s), -1, np.int32)
        drafts = np.zeros((b, num_spec), np.int32)
        draft_lens = np.zeros((b,), np.int32)
        seq_lens = np.zeros((b,), np.int32)
        prefix_lens = np.zeros((b,), np.int32)
        ctx = np.zeros((b,), np.int32)
        for i, (meta, seq_id) in enumerate(prep.rows):
            data = meta.seq_data[seq_id]
            seq_len = data.get_len()
            prop = proposals[i]
            tokens[i, 0] = data.get_last_token_id()
            tokens[i, 1:1 + len(prop)] = prop
            drafts[i, :len(prop)] = prop
            draft_lens[i] = len(prop)
            table = meta.block_tables[seq_id]
            for j in range(s):
                pos = seq_len - 1 + j
                # Write KV only for real inputs (last token + proposals):
                # garbage-token tail writes would wrap onto LIVE slots
                # under sliding-window circular block tables.
                if j <= len(prop):
                    slots[i, j] = (table[pos // self.block_size] *
                                   self.block_size + pos % self.block_size)
                positions[i, j] = pos
            seq_lens[i] = s
            prefix_lens[i] = seq_len - 1
            ctx[i] = seq_len - 1 + s
        tensors, flags = self.build_sampling_tensors(prep.rows, b)
        flags_key = tuple(sorted(flags.items()))
        use_lora, lora_idx, lora_stacks = self._lora_args(prep.rows, b)
        step = self._get_spec_decode_fn(num_spec, flags_key, use_lora)
        res = step(
            self.params, kv_caches, jnp.asarray(tokens),
            jnp.asarray(positions), jnp.asarray(slots),
            jnp.asarray(prep.block_tables), jnp.asarray(ctx),
            jnp.asarray(seq_lens), jnp.asarray(prefix_lens),
            jnp.asarray(drafts), jnp.asarray(draft_lens), tensors,
            lora_idx, lora_stacks)
        kv_caches, (out_tokens, n_acc, lp, topk_ids, topk_lp) = \
            res[0], res[1]
        out_tokens = np.asarray(out_tokens)
        n_acc = np.asarray(n_acc)
        if self.capture_hidden:
            # Hidden of the position that produced the LAST emitted token
            # (index n_acc) — the speculator conditions on it next step.
            hid = np.asarray(res[2])
            for i, (_, sid) in enumerate(prep.rows):
                self.seq_hidden[sid] = hid[i, int(n_acc[i])]
        lp = np.asarray(lp)
        if topk_ids is not None:
            topk_ids = np.asarray(topk_ids)
            topk_lp = np.asarray(topk_lp)

        per_group: Dict[str, List[SequenceOutput]] = {}
        total_emitted = 0
        total_accepted = 0
        for i, (meta, seq_id) in enumerate(prep.rows):
            emitted = int(n_acc[i]) + 1
            total_emitted += emitted
            total_accepted += int(n_acc[i])
            outs = per_group.setdefault(meta.request_id, [])
            sp = meta.sampling_params
            for j in range(emitted):
                token = int(out_tokens[i, j])
                logprobs = {token: Logprob(float(lp[i, j]))}
                if (topk_ids is not None and sp is not None
                        and sp.logprobs is not None):
                    want = min(sp.logprobs, topk_ids.shape[2])
                    for r in range(want):
                        tid = int(topk_ids[i, j, r])
                        logprobs.setdefault(
                            tid, Logprob(float(topk_lp[i, j, r]),
                                         rank=r + 1))
                    if token in logprobs and logprobs[token].rank is None:
                        ranks = np.where(topk_ids[i, j] == token)[0]
                        logprobs[token].rank = (int(ranks[0]) + 1
                                                if len(ranks) else None)
                outs.append(SequenceOutput(
                    parent_seq_id=seq_id, output_token=token,
                    logprobs=logprobs))
        outputs = [CompletionSequenceGroupOutput(
            samples=per_group.get(m.request_id, [])) for m in metas]
        metrics = dict(num_spec_tokens=num_spec,
                       num_drafted=int(draft_lens[:len(prep.rows)].sum()),
                       num_accepted=total_accepted,
                       num_emitted=total_emitted)
        return kv_caches, SamplerOutput(
            outputs=outputs, spec_decode_worker_metrics=metrics)

    def can_batch_prefill(self, meta: SequenceGroupMetadata) -> bool:
        """Eligibility for the multi-prompt batched prefill dispatch
        (reference pads+batches prompts into one forward,
        vllm/worker/tpu_model_runner.py:199-247, model_runner.py:332).
        Feature-carrying groups fall back to the single-group path."""
        if len(meta.seq_data) != 1:
            return False          # best_of siblings sample over tiled rows
        sp = meta.sampling_params
        if sp is not None and sp.prompt_logprobs is not None:
            return False          # per-position logprobs index row 0
        if sp is not None and sp.logits_processors:
            return False          # host resampling patches single rows
        if meta.multi_modal_data:
            return False          # vision towers take one image tensor
        if meta.lora_request is not None:
            return False
        if self.dp > 1 or self.sp > 1:
            return False          # owner masks / ring shards are per-call
        if self._model_is_stateful() or self.capture_hidden:
            return False
        return True

    def execute_prefill_batch(self, metas: List[SequenceGroupMetadata],
                              kv_caches
                              ) -> Tuple[Any, Optional[SamplerOutput]]:
        """Run SEVERAL prompt groups in one compiled dispatch: rows padded
        to a (batch bucket, token bucket) grid, per-row seq/prefix lens.
        All metas must be can_batch_prefill-eligible and share do_sample;
        mixed prefix/no-prefix rows ride the paged-prefix step with
        prefix_len 0. One dispatch replaces N (reference
        tpu_model_runner.py:199-247 batches prompts the same way)."""
        do_sample = metas[0].do_sample
        assert all(m.do_sample == do_sample for m in metas)
        rows = []
        chunks = []
        computed = []
        for meta in metas:
            (seq_id, data), = meta.seq_data.items()
            rows.append((meta, seq_id))
            computed.append(data.get_num_computed_tokens())
            chunks.append(meta.token_chunk_size)
        b = len(metas)
        b_pad = max(1, next_power_of_2(b))
        t = self.pad_prefill_len(max(chunks))
        has_prefix = any(c > 0 for c in computed)

        tokens = np.zeros((b_pad, t), np.int32)
        positions = np.zeros((b_pad, t), np.int32)
        slots = np.full((b_pad, t), -1, np.int32)
        block_tables = np.zeros((b_pad, self.max_blocks_per_seq), np.int32)
        ctx = np.ones((b_pad,), np.int32)
        seq_lens = np.ones((b_pad,), np.int32)
        prefix_lens = np.zeros((b_pad,), np.int32)
        for i, (meta, seq_id) in enumerate(rows):
            data = meta.seq_data[seq_id]
            nc, chunk = computed[i], chunks[i]
            ids = data.get_token_ids()[nc:nc + chunk]
            tokens[i, :chunk] = ids
            positions[i, :chunk] = np.arange(nc, nc + chunk)
            table = meta.block_tables[seq_id]
            block_tables[i, :len(table)] = table
            for j in range(chunk):
                pos = nc + j
                slots[i, j] = (table[pos // self.block_size] *
                               self.block_size + pos % self.block_size)
            ctx[i] = nc + chunk
            seq_lens[i] = chunk
            prefix_lens[i] = nc

        tensors, flags = self.build_sampling_tensors(rows, b_pad)
        flags_key = tuple(sorted(flags.items()))
        use_lora, lora_idx, lora_stacks = self._lora_args(rows, b_pad)
        step = self._get_prefill_fn(flags_key, has_prefix, do_sample,
                                    n_samples=1, use_lora=use_lora)
        logger.debug("batched prefill step: B=%d/%d T=%d prefix=%s "
                     "flags=%s", b, b_pad, t, has_prefix, flags)
        state_slots = self._state_slots_for_rows(rows, b_pad, create=True)
        pv = jnp.zeros((1, 1), jnp.float32)
        owner = np.ones((b_pad,), np.float32)
        res = step(
            self.params, kv_caches, jnp.asarray(tokens),
            jnp.asarray(positions), jnp.asarray(slots),
            jnp.asarray(block_tables), jnp.asarray(ctx),
            jnp.asarray(seq_lens), jnp.asarray(prefix_lens),
            jnp.asarray(state_slots), pv, jnp.asarray(owner), tensors,
            lora_idx, lora_stacks)
        kv_caches, out = res[0], res[1]
        if out is None:
            return kv_caches, None
        return kv_caches, self._to_sampler_output(out, rows, metas)

    def execute_prefill(self, meta: SequenceGroupMetadata,
                        kv_caches) -> Tuple[Any, Optional[SamplerOutput]]:
        """Run one prompt (or prompt chunk): batch dim 1, padded length.

        best_of>1 groups prefill once over shared pages; the sampler runs
        over best_of replicated logit rows with per-sibling keys so every
        branch draws its own first token."""
        seq_ids = sorted(meta.seq_data.keys())
        seq_id = seq_ids[0]
        data = meta.seq_data[seq_id]
        num_computed = data.get_num_computed_tokens()
        chunk = meta.token_chunk_size
        full_ids = data.get_token_ids()
        token_ids = full_ids[num_computed:num_computed + chunk]
        sp0 = meta.sampling_params
        want_plp = sp0 is not None and sp0.prompt_logprobs is not None
        # Prompt-logprob chunks need one pad slot to plant the next
        # chunk's first token (position chunk-1 predicts it).
        t = self.pad_prefill_len(chunk + 1 if want_plp else chunk)
        tokens = np.zeros((1, t), np.int32)
        tokens[0, :chunk] = token_ids
        if want_plp and num_computed + chunk < len(full_ids):
            tokens[0, chunk] = full_ids[num_computed + chunk]
        positions = np.zeros((1, t), np.int32)
        positions[0, :chunk] = np.arange(num_computed, num_computed + chunk)
        table = meta.block_tables[seq_id]
        block_tables = np.zeros((1, self.max_blocks_per_seq), np.int32)
        block_tables[0, :len(table)] = table
        slots = np.full((1, t), -1, np.int32)
        for j in range(chunk):
            pos = num_computed + j
            slots[0, j] = table[pos // self.block_size] * self.block_size + \
                pos % self.block_size
        ctx = np.asarray([num_computed + chunk], np.int32)
        seq_lens = np.asarray([chunk], np.int32)
        prefix_lens = np.asarray([num_computed], np.int32)
        has_prefix = num_computed > 0

        rows = [(meta, sid) for sid in seq_ids]
        tensors, flags = self.build_sampling_tensors(rows, len(rows))
        flags_key = tuple(sorted(flags.items()))
        use_lora, lora_idx, lora_stacks = self._lora_args([rows[0]], 1)
        sp = meta.sampling_params
        num_plp = 0
        if sp is not None and sp.prompt_logprobs is not None:
            num_plp = min(max(sp.prompt_logprobs, 1), _MAX_NUM_LOGPROBS)
        mm = meta.multi_modal_data or {}
        pixel_values = mm.get("pixel_values") if isinstance(mm, dict) \
            else None
        has_image = pixel_values is not None
        if has_image and chunk < len(full_ids):
            raise ValueError(
                "Vision prompts must prefill in a single chunk; disable "
                "chunked prefill or raise max_num_batched_tokens.")
        img_sizes = mm.get("image_sizes") if isinstance(mm, dict) else None
        image_key = (tuple(int(v) for v in np.asarray(img_sizes).reshape(-1))
                     if img_sizes is not None else None)
        proc_rows = (self._rows_with_processors(rows)
                     if meta.do_sample else {})
        step = self._get_prefill_fn(flags_key, has_prefix, meta.do_sample,
                                    n_samples=len(rows), use_lora=use_lora,
                                    num_prompt_logprobs=num_plp,
                                    has_image=has_image,
                                    image_key=image_key,
                                    return_logits=bool(proc_rows))
        logger.debug("prefill step: T=%d chunk=%d prefix=%s flags=%s "
                     "lora=%s image=%s", t, chunk, has_prefix, flags,
                     use_lora, has_image)
        pv = (jnp.asarray(pixel_values) if has_image
              else jnp.zeros((1, 1), jnp.float32))
        if self._model_is_stateful() and len(seq_ids) > 1:
            raise ValueError(
                "best_of/beam groups are not supported for stateful "
                "(Mamba) models: sibling sequences would need "
                "copy-on-fork of the recurrent state.")
        state_slots = self._state_slots_for_rows([(meta, seq_id)], 1,
                                                 create=True)
        owner = np.ones((1,), np.float32)
        if self.dp > 1:
            # The prompt computes on all data replicas; only the owner
            # (whose pool shard holds the pages) gets real local slots /
            # tables — others run masked and their x is discarded by the
            # in-graph owner selection (_get_prefill_fn).
            r = self._dp_replica_of(meta, seq_id)
            bpr = self.blocks_per_replica
            slots_dp = np.full((self.dp, t), -1, np.int32)
            slots_dp[r] = np.where(
                slots[0] >= 0, slots[0] - r * bpr * self.block_size, -1)
            slots = slots_dp
            bt_dp = np.zeros((self.dp, self.max_blocks_per_seq), np.int32)
            bt_dp[r] = np.maximum(block_tables[0] - r * bpr, 0)
            block_tables = bt_dp
            owner = np.zeros((self.dp,), np.float32)
            owner[r] = 1.0
        res = step(
            self.params, kv_caches, jnp.asarray(tokens),
            jnp.asarray(positions), jnp.asarray(slots),
            jnp.asarray(block_tables), jnp.asarray(ctx),
            jnp.asarray(seq_lens), jnp.asarray(prefix_lens),
            jnp.asarray(state_slots), pv, jnp.asarray(owner), tensors,
            lora_idx, lora_stacks)
        kv_caches, out, prompt_lp = res[0], res[1], res[2]
        if self.capture_hidden:
            hid = np.asarray(res[3])
            for sid in seq_ids:
                self.seq_hidden[sid] = hid[0]
        if proc_rows and out is not None:
            # best_of siblings: in-graph tiles the shared prompt logits
            # to n_samples rows; row i of the logits output is row 0.
            logits_np = np.asarray(res[-1])
            if logits_np.shape[0] < len(rows):
                logits_np = np.broadcast_to(
                    logits_np[:1], (len(rows),) + logits_np.shape[1:])
            out = self._patch_processor_rows(out, proc_rows, logits_np,
                                             rows)
        plp_list = None
        if prompt_lp is not None:
            # Chunk position j's logits predict chunk token j+1; entry i of
            # prompt_logprobs describes prompt token i given its prefix
            # (reference sequence/prompt_logprobs semantics).
            chosen, topk_ids, topk_lp = (np.asarray(a) for a in prompt_lp)
            plp_list = []
            for j in range(chunk):
                nxt_global = num_computed + j + 1
                if nxt_global >= len(full_ids):
                    break  # position chunk-1 of the final chunk predicts
                           # the first sampled token, not a prompt token
                target = int(full_ids[nxt_global])
                d = {target: Logprob(float(chosen[j]))}
                for r in range(topk_ids.shape[1]):
                    tid = int(topk_ids[j, r])
                    d.setdefault(tid, Logprob(float(topk_lp[j, r]),
                                              rank=r + 1))
                plp_list.append(d)
        if out is None:
            if plp_list is None:
                return kv_caches, None
            so = SamplerOutput(outputs=[
                CompletionSequenceGroupOutput(samples=[])])
        else:
            so = self._to_sampler_output(out, rows, [meta])
        if plp_list is not None:
            so.outputs[0].prompt_logprobs = plp_list
        return kv_caches, so

    def execute_embedding(self, meta: SequenceGroupMetadata, kv_caches):
        """Pooled-embedding forward for embedding models: prefill the
        prompt, pool hidden states (reference llama_embedding.py +
        pooler.py); KV writes land in scratch blocks."""
        seq_id = next(iter(meta.seq_data.keys()))
        data = meta.seq_data[seq_id]
        token_ids = data.get_token_ids()
        chunk = len(token_ids)
        t = self.pad_prefill_len(chunk)
        tokens = np.zeros((1, t), np.int32)
        tokens[0, :chunk] = token_ids
        positions = np.zeros((1, t), np.int32)
        positions[0, :chunk] = np.arange(chunk)
        table = meta.block_tables[seq_id]
        block_tables = np.zeros((1, self.max_blocks_per_seq), np.int32)
        block_tables[0, :len(table)] = table
        slots = np.full((1, t), -1, np.int32)
        for j in range(chunk):
            slots[0, j] = table[j // self.block_size] * self.block_size + \
                j % self.block_size
        key = ("embed", t)
        if key not in self._step_fns:
            model = self.model
            param_specs, kv_specs = self._specs_tuple()

            def fwd(params, kv_caches, tokens, positions, slots,
                    block_tables, ctx, seq_lens):
                meta_d = AttentionMetadata(
                    slot_mapping=slots, block_tables=block_tables,
                    context_lens=ctx, seq_lens=seq_lens,
                    prefix_lens=jnp.zeros_like(ctx))
                x, kv_caches = model.forward(params, tokens, positions,
                                             kv_caches, meta_d,
                                             is_prefill=True)
                pooled = model.pool(x, seq_lens)
                return pooled, kv_caches

            sharded = shard_map_fn(
                fwd, self.mesh,
                in_specs=(param_specs, kv_specs, P(), P(), P(), P(), P(),
                          P()),
                out_specs=(P(), kv_specs))
            self._step_fns[key] = jax.jit(sharded, donate_argnums=(1,))
        step = self._step_fns[key]
        pooled, kv_caches = step(
            self.params, kv_caches, jnp.asarray(tokens),
            jnp.asarray(positions), jnp.asarray(slots),
            jnp.asarray(block_tables),
            jnp.asarray([chunk], np.int32), jnp.asarray([chunk], np.int32))
        return kv_caches, np.asarray(pooled[0])

    def _to_sampler_output(self, out: SamplerOutputArrays,
                           rows: List[Tuple[SequenceGroupMetadata, int]],
                           metas: List[SequenceGroupMetadata],
                           row_idx: Optional[np.ndarray] = None
                           ) -> SamplerOutput:
        next_tokens = np.asarray(out.next_tokens)
        chosen_lp = np.asarray(out.logprob)
        topk_ids = (np.asarray(out.topk_ids)
                    if out.topk_ids is not None else None)
        topk_lp = (np.asarray(out.topk_logprobs)
                   if out.topk_logprobs is not None else None)
        per_group: Dict[str, List[SequenceOutput]] = {}
        group_rows: Dict[str, List[Tuple[int, Any, int]]] = {}
        pos = row_idx if row_idx is not None else range(len(rows))
        for i, (meta, seq_id) in zip(pos, rows):
            sp = meta.sampling_params
            if sp is not None and sp.use_beam_search:
                # Beam candidates are selected host-side from the in-graph
                # top-k capture (reference sampler.py _beam_search_sample):
                # collected per group below, not per row.
                group_rows.setdefault(meta.request_id, []).append(
                    (i, meta, seq_id))
                per_group.setdefault(meta.request_id, [])
                continue
            token = int(next_tokens[i])
            lp = float(chosen_lp[i])
            logprobs = {token: Logprob(lp)}
            if (topk_ids is not None and sp is not None
                    and sp.logprobs is not None):
                want = min(sp.logprobs, topk_ids.shape[1])
                for r in range(want):
                    tid = int(topk_ids[i, r])
                    logprobs.setdefault(
                        tid, Logprob(float(topk_lp[i, r]), rank=r + 1))
                if token in logprobs and logprobs[token].rank is None:
                    ranks = np.where(topk_ids[i] == token)[0]
                    logprobs[token].rank = (int(ranks[0]) + 1
                                            if len(ranks) else None)
            per_group.setdefault(meta.request_id, []).append(
                SequenceOutput(parent_seq_id=seq_id, output_token=token,
                               logprobs=logprobs))
        for request_id, rws in group_rows.items():
            meta = rws[0][1]
            sp = meta.sampling_params
            num_cand = 2 * sp.best_of
            is_prompt = meta.is_prompt
            # (cum_logprob, parent_seq_id, token, token_logprob) candidates
            # across all parent rows; prompt groups have a single parent.
            cands = []
            for (i, _, seq_id) in rws:
                base = (0.0 if is_prompt else
                        meta.seq_data[seq_id].cumulative_logprob)
                for r in range(topk_ids.shape[1]):
                    lp = float(topk_lp[i, r])
                    cands.append((base + lp, seq_id, int(topk_ids[i, r]),
                                  lp))
            cands.sort(key=lambda c: c[0], reverse=True)
            for cum, seq_id, token, lp in cands[:num_cand]:
                per_group[request_id].append(
                    SequenceOutput(parent_seq_id=seq_id,
                                   output_token=token,
                                   logprobs={token: Logprob(lp)}))
        outputs = []
        for meta in metas:
            outputs.append(
                CompletionSequenceGroupOutput(
                    samples=per_group.get(meta.request_id, [])))
        return SamplerOutput(outputs=outputs, sampled_token_ids=next_tokens)
