"""Model building + weight loading.

Reference: vllm/model_executor/model_loader/loader.py (DefaultModelLoader:149,
DummyModelLoader:309, ShardedStateLoader:446) and weight_utils.py. TPU-native:
params are a pytree initialized directly into their mesh shardings
(jit(init, out_shardings=...)); checkpoint ingestion is a pure transform on
host numpy tensors (transpose to K-major, quant repack) streamed per-tensor
into the sharded buffers.
"""
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding

from nmvllm_tpu.config import EngineConfig
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.models import resolve_model_cls
from nmvllm_tpu.utils import STR_DTYPE_TO_JNP

logger = init_logger(__name__)


def _get_quant_method_factory(engine_config: EngineConfig):
    """Resolve the per-layer LinearMethod factory from model config
    (reference model_loader/loader.py _get_quantization_config:46)."""
    model_config = engine_config.model_config
    quant = model_config.quantization
    sparsity = model_config.sparsity
    if quant is None and sparsity is None:
        return None, None
    if sparsity is not None:
        from nmvllm_tpu.sparsity import get_sparsity_config
        cfg_cls = get_sparsity_config(sparsity)
        cfg = cfg_cls.from_config(_hf_quant_dict(model_config) or {})
        return cfg, cfg.get_linear_method
    from nmvllm_tpu.quantization import get_quantization_config
    cfg_cls = get_quantization_config(quant)
    cfg = cfg_cls.from_config(_hf_quant_dict(model_config) or {})
    return cfg, cfg.get_linear_method


def _hf_quant_dict(model_config) -> Optional[Dict[str, Any]]:
    q = getattr(model_config.hf_config, "quantization_config", None)
    if isinstance(q, dict):
        return q
    if q is not None and hasattr(q, "to_dict"):
        return q.to_dict()
    return None


def build_model(engine_config: EngineConfig):
    model_config = engine_config.model_config
    parallel = engine_config.parallel_config
    from nmvllm_tpu.parallel.mesh import set_expert_parallel
    set_expert_parallel(parallel.expert_parallel_size)
    from nmvllm_tpu.layers.fused import set_fusion_enabled
    # Multi-LoRA keys adapter stacks on the individual projection names.
    set_fusion_enabled(engine_config.lora_config is None)
    arch_cls = resolve_model_cls(model_config.architectures)
    quant_cfg, method_factory = _get_quant_method_factory(engine_config)
    dtype = jnp.dtype(STR_DTYPE_TO_JNP[model_config.dtype])
    kwargs = dict(tp_size=parallel.tensor_parallel_size, dtype=dtype,
                  kv_cache_dtype=engine_config.cache_config.cache_dtype)
    if method_factory is not None:
        kwargs["method_factory"] = method_factory
    kv_scales = _load_kv_scales(model_config)
    if kv_scales is not None:
        kwargs["kv_scales"] = kv_scales
    model = arch_cls(model_config.hf_config, **kwargs)
    return model


def _load_kv_scales(model_config):
    """KV-cache scaling factors from quantization_param_path (reference
    vllm/model_executor/layers/quantization/schema.py)."""
    path = model_config.quantization_param_path
    if not path or not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    layers = data.get("kv_cache", {}).get("scaling_factor", {})
    num_layers = model_config.hf_config.num_hidden_layers
    # Schema: {"kv_cache": {"scaling_factor": {"0": {"0": s, "1": s...}}}}
    rank_scales = layers.get("0", layers)
    out = []
    for i in range(num_layers):
        s = float(rank_scales.get(str(i), 1.0))
        out.append((s, s))
    return out


def init_params_on_mesh(model, mesh, seed: int):
    specs = model.specs()
    from jax.sharding import PartitionSpec
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, PartitionSpec))
    key = jax.random.PRNGKey(seed)
    with mesh:
        init_fn = jax.jit(model.init, out_shardings=shardings)
        return init_fn(key)


def _set_in(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


_QUANT_SUFFIXES = (".qweight", ".qzeros", ".scales", ".g_idx",
                   ".weight_scale", ".input_scale", ".lookup_table",
                   ".codes", ".codebooks",
                   # compressed-tensors wNa16 wire format
                   ".weight_packed", ".weight_zero_point",
                   ".weight_shape")


def load_safetensors_weights(model, params, model_dir: str, mesh,
                             dtype, quant_name: Optional[str] = None) -> Any:
    """Stream a local safetensors checkpoint into the params tree.

    Handles: plain weights (transposed to K-major), vocab padding, fused
    qkv/gate_up splits (Phi-3), Mixtral per-expert w1/w2/w3 stacking, and
    GPTQ/AWQ quantized tensor groups (repacked eagerly to the canonical
    Pallas layout — the reference repacks lazily, gptq_marlin.py:374).
    """
    from safetensors import safe_open
    name_map = model.hf_name_map()
    files = sorted(f for f in os.listdir(model_dir)
                   if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"No safetensors files in {model_dir}")
    loaded = 0
    quant_groups: Dict[str, Dict[str, np.ndarray]] = {}
    expert_groups: Dict[str, Dict[str, np.ndarray]] = {}

    def put(path, arr, cast=True):
        nonlocal loaded
        parent = _get_in(params, path[:-1]) if len(path) > 1 else params
        if (path[-1] == "weight" and isinstance(parent, dict)
                and "weight" not in parent and "v0" in parent):
            # 2:4 sparse serving of a dense (pruned) checkpoint: the
            # param tree holds the compressed (v0, v1, meta) layout —
            # compress on the way in (the reference's magic_wand
            # LazyCompressedParameter post-load compression,
            # sparse_w16a16_linear_method.py:61-109).
            from nmvllm_tpu.ops.sparse_gemm import compress_24
            v0, v1, meta = compress_24(jnp.asarray(arr, jnp.float32))
            for key, val in (("v0", v0), ("v1", v1), ("meta", meta)):
                tgt = parent[key]
                parent[key] = jax.device_put(val.astype(tgt.dtype),
                                             tgt.sharding)
            loaded += 1
            return
        target = _get_in(params, path)
        arr = jnp.asarray(arr)
        if cast:
            arr = arr.astype(target.dtype)
        arr = jax.device_put(arr, target.sharding)
        _set_in(params, path, arr)
        loaded += 1

    pt_handles: Dict[str, Any] = {}

    def get_np(f, fpath, name):
        """framework="np" get_tensor with an FP8 fallback: numpy has no
        float8 dtypes, so FP8-serialized checkpoints (reference
        fp8.py:92-108 ingests these directly) are read through the torch
        frontend (one lazily-opened handle per shard file) and viewed as
        the matching ml_dtypes float8."""
        try:
            return f.get_tensor(name)
        except (TypeError, AttributeError, ValueError, KeyError):
            dtype = f.get_slice(name).get_dtype()
            if dtype not in ("F8_E4M3", "F8_E5M2"):
                raise
            import ml_dtypes
            import torch
            if fpath not in pt_handles:
                pt_handles[fpath] = safe_open(fpath, framework="pt")
            t = pt_handles[fpath].get_tensor(name)
            np_dt = (ml_dtypes.float8_e4m3fn if dtype == "F8_E4M3"
                     else ml_dtypes.float8_e5m2)
            return t.view(torch.uint8).numpy().view(np_dt)

    for fname in files:
        fpath = os.path.join(model_dir, fname)
        with safe_open(fpath, framework="np") as f:
            for tensor_name in f.keys():
                # Mixtral experts: model.layers.N...experts.E.w{1,2,3}...
                # (checked BEFORE the quant suffixes so per-expert GPTQ
                # tensors stack into expert stacks instead of being
                # dropped as unknown quantized layers).
                if ".experts." in tensor_name:
                    layer_prefix, rest = tensor_name.split(".experts.", 1)
                    expert_groups.setdefault(layer_prefix, {})[rest] = \
                        get_np(f, fpath, tensor_name)
                    continue
                # Quantized-layer tensors: buffer by layer prefix.
                if tensor_name.endswith(_QUANT_SUFFIXES):
                    prefix, suffix = tensor_name.rsplit(".", 1)
                    quant_groups.setdefault(prefix, {})[suffix] = \
                        get_np(f, fpath, tensor_name)
                    continue
                if tensor_name not in name_map:
                    continue
                path, transform = name_map[tensor_name]
                arr = get_np(f, fpath, tensor_name)
                head = getattr(model, "lm_head", None)
                if (len(path) >= 2 and path[-2] == "lm_head"
                        and path[-1] == "weight" and head is not None
                        and getattr(head, "quant_method", None)
                        is not None):
                    # NMVLLM_QUANT_LM_HEAD: the param tree holds the
                    # quantized layout (qweight/scales/zeros), not a
                    # dense weight — pad the vocab and quantize on the
                    # way in (embedding.py quantize_loaded).
                    parent = _get_in(params, path[:-1])
                    pad = head.padded_vocab - arr.shape[0]
                    if pad > 0:
                        arr = np.pad(arr, ((0, pad), (0, 0)))
                    qparams = head.quantize_loaded(
                        {"weight": jnp.asarray(arr, jnp.float32)})
                    for qk, qv in qparams.items():
                        if qk in parent:
                            put(path[:-1] + (qk,), qv, cast=True)
                    continue
                if transform == "transpose":
                    arr = np.ascontiguousarray(arr.T)
                elif transform == "pad_vocab":
                    target = _get_in(params, path)
                    pad = target.shape[0] - arr.shape[0]
                    if pad > 0:
                        arr = np.pad(arr, ((0, pad), (0, 0)))
                elif transform == "split_qkv":
                    _load_split_qkv(model, params, path, arr, put)
                    continue
                elif transform == "split_wqkv_interleaved":
                    _load_split_wqkv_interleaved(model, params, path, arr,
                                                 put)
                    continue
                elif transform == "split_wqkv_interleaved_bias":
                    _load_split_wqkv_interleaved(model, params, path, arr,
                                                 put, is_bias=True)
                    continue
                elif transform == "split_qkv_bias":
                    _load_split_qkv(model, params, path, arr, put,
                                    is_bias=True)
                    continue
                elif transform == "split_qkv_conv1d":
                    # Conv1D fused qkv: (in, q|k|v columns).
                    _load_split_qkv(model, params, path,
                                    np.ascontiguousarray(arr.T), put)
                    continue
                elif transform == "squeeze0":
                    arr = arr[0]
                elif transform == "conv1d_dwt":
                    # HF depthwise Conv1d weight (D, 1, W) -> ours (W, D).
                    arr = np.ascontiguousarray(arr[:, 0, :].T)
                elif transform == "pad_vocab_1d":
                    target = _get_in(params, path)
                    pad = target.shape[0] - arr.shape[0]
                    if pad > 0:
                        arr = np.pad(arr, (0, pad))
                elif transform == "repeat_kv":
                    # DeciLM variable GQA: repeat KV heads up to the
                    # uniform max (reference decilm.py _degroup_weight).
                    target = _get_in(params, path)
                    src = np.ascontiguousarray(arr.T)  # (K, heads*hd)
                    out_dim = target.shape[-1]
                    if src.shape[1] != out_dim:
                        hd = model.head_dim
                        n_rep = out_dim // src.shape[1]
                        src = src.reshape(src.shape[0], -1, hd)
                        src = np.repeat(src, n_rep, axis=1)
                        src = src.reshape(src.shape[0], out_dim)
                    arr = src
                elif transform == "split_gate_up":
                    a, b = np.split(arr, 2, axis=0)
                    put(path + ("gate_proj", "weight"),
                        np.ascontiguousarray(a.T))
                    put(path + ("up_proj", "weight"),
                        np.ascontiguousarray(b.T))
                    continue
                elif transform == "split_gegelu":
                    # Phi-3-Small up_proj: interleaved (gelu, linear)
                    # output pairs (reference phi3_small.py:59 gegelu
                    # reads [..., ::2]/[..., 1::2]) -> contiguous halves.
                    put(path + ("gate_proj", "weight"),
                        np.ascontiguousarray(arr[0::2].T))
                    put(path + ("up_proj", "weight"),
                        np.ascontiguousarray(arr[1::2].T))
                    continue
                elif transform == "split_gegelu_bias":
                    put(path + ("gate_proj", "bias"),
                        np.ascontiguousarray(arr[0::2]))
                    put(path + ("up_proj", "bias"),
                        np.ascontiguousarray(arr[1::2]))
                    continue
                put(path, arr)

    _load_quant_groups(model, params, name_map, quant_groups, quant_name,
                       put)
    _load_expert_groups(model, params, expert_groups, put)
    logger.info("Loaded %d tensors from %s", loaded, model_dir)
    return params


def _load_split_qkv(model, params, path, arr, put, is_bias=False):
    """Fused qkv stacked as (q | k | v) rows -> separate projections
    (Phi-3 qkv_proj, Baichuan W_pack, MPT Wqkv, BigCode c_attn)."""
    attn = model.layers[path[1]].self_attn
    qd = attn.total_heads * attn.head_dim
    kvd = attn.total_kv_heads * attn.head_dim
    q, k, v = np.split(arr, [qd, qd + kvd], axis=0)
    if is_bias:
        put(path + ("q_proj", "bias"), q)
        put(path + ("k_proj", "bias"), k)
        put(path + ("v_proj", "bias"), v)
        return
    put(path + ("q_proj", "weight"), np.ascontiguousarray(q.T))
    put(path + ("k_proj", "weight"), np.ascontiguousarray(k.T))
    put(path + ("v_proj", "weight"), np.ascontiguousarray(v.T))


def _load_split_wqkv_interleaved(model, params, path, arr, put,
                                 is_bias=False):
    """Fused wqkv with rows grouped per kv head as [q_0..q_{g-1}, k, v]
    (InternLM2 wqkv, GPT-NeoX/BLOOM/Falcon query_key_value)."""
    attn = model.layers[path[1]].self_attn
    kv_heads = attn.total_kv_heads
    group = attn.total_heads // kv_heads
    hd = attn.head_dim
    if is_bias:
        w = arr.reshape(kv_heads, group + 2, hd)
        put(path + ("q_proj", "bias"),
            w[:, :group].reshape(kv_heads * group * hd))
        put(path + ("k_proj", "bias"), w[:, group].reshape(kv_heads * hd))
        put(path + ("v_proj", "bias"),
            w[:, group + 1].reshape(kv_heads * hd))
        return
    hidden = arr.shape[1]
    w = arr.reshape(kv_heads, group + 2, hd, hidden)
    q = w[:, :group].reshape(kv_heads * group * hd, hidden)
    k = w[:, group].reshape(kv_heads * hd, hidden)
    v = w[:, group + 1].reshape(kv_heads * hd, hidden)
    put(path + ("q_proj", "weight"), np.ascontiguousarray(q.T))
    put(path + ("k_proj", "weight"), np.ascontiguousarray(k.T))
    put(path + ("v_proj", "weight"), np.ascontiguousarray(v.T))


def _load_quant_groups(model, params, name_map, quant_groups, quant_name,
                       put):
    """Repack buffered GPTQ/AWQ/FP8 layer tensors into canonical layout."""
    if not quant_groups:
        return
    from nmvllm_tpu.quantization.awq import awq_to_canonical
    from nmvllm_tpu.quantization.gptq import gptq_to_canonical
    hf_quant = getattr(model.cfg, "quantization_config", None) or {}
    if hasattr(hf_quant, "to_dict"):
        hf_quant = hf_quant.to_dict()
    bits = int(hf_quant.get("bits", hf_quant.get("w_bit", 4)))
    group_size = int(hf_quant.get("group_size",
                                  hf_quant.get("q_group_size", 128)))
    for prefix, tensors in quant_groups.items():
        weight_key = prefix + ".weight"
        if weight_key not in name_map:
            logger.warning("Skipping unknown quantized layer %s", prefix)
            continue
        path, _ = name_map[weight_key]
        layer_path = path[:-1]
        if "weight_packed" in tensors:
            # compressed-tensors wNa16 (the reference's certified W4A16
            # checkpoints ship this schema): (N, K/pack) packed weights
            # + (N, K/g) scales, symmetric biased-unsigned values.
            from nmvllm_tpu.quantization.compressed_tensors import (
                CompressedTensorsConfig, wNa16_wire_to_canonical)
            cc = CompressedTensorsConfig.from_config(hf_quant)
            ga = None
            for gdef in cc.groups:
                if gdef.matches(prefix) and gdef.weights is not None:
                    ga = gdef.weights
                    break
            nb = ga.num_bits if ga else 4
            # Pass group_size through unchanged: -1/None means
            # per-channel ("channel" strategy) and the converter +
            # serving method both resolve it to g = K with (1, N)
            # scales/zeros — coercing to 128 here would mismatch the
            # method's layout.
            gs = ga.group_size if ga else 128
            sym = ga.symmetric if ga else True
            qw, scales, zeros = wNa16_wire_to_canonical(
                tensors["weight_packed"], tensors["weight_scale"],
                tensors.get("weight_zero_point"), nb, gs, symmetric=sym)
            tl = _get_in(params, layer_path)
            if nb == 4 and isinstance(tl, dict) and "mult" in tl:
                from nmvllm_tpu.ops.quant_matmul import (
                    requantize_grouped_to_a8p)
                k = np.asarray(qw).shape[0] * 8
                g_eff = k // np.asarray(scales).shape[0]
                aqw, mult, s_chan, zms = requantize_grouped_to_a8p(
                    jnp.asarray(qw), jnp.asarray(scales),
                    jnp.asarray(zeros), group_size=g_eff, k=k)
                put(layer_path + ("qweight",), np.asarray(aqw),
                    cast=False)
                put(layer_path + ("mult",), np.asarray(mult), cast=False)
                put(layer_path + ("scales",), np.asarray(s_chan))
                put(layer_path + ("zeros",), np.asarray(zms), cast=False)
                continue
            put(layer_path + ("qweight",), qw, cast=False)
            put(layer_path + ("scales",), scales)
            put(layer_path + ("zeros",), zeros, cast=False)
            continue
        if "weight_scale" in tensors:  # FP8- or INT8-serialized weights
            # The weight itself is not a quant-suffixed tensor: it
            # landed through the regular name_map path (with its
            # transpose transform) — only the scale arrives here.
            # compressed-tensors channel strategy stores (N, 1) scales;
            # reshape to the serving param's shape ((N,) here).
            if "weight" in tensors:
                put(layer_path + ("weight",), tensors["weight"], cast=True)
            ws = np.asarray(tensors["weight_scale"])
            target = _get_in(params, layer_path + ("weight_scale",))
            put(layer_path + ("weight_scale",), ws.reshape(target.shape))
            continue
        if quant_name == "squeezellm":
            # LUT-decode to dense (reference squeezellm.py; extra_formats).
            from nmvllm_tpu.quantization.extra_formats import (
                squeezellm_decode)
            dense = squeezellm_decode(tensors["qweight"],
                                      tensors["lookup_table"])
            put(layer_path + ("weight",), dense, cast=True)
            continue
        if quant_name == "aqlm":
            from nmvllm_tpu.quantization.extra_formats import aqlm_decode
            dense = aqlm_decode(tensors["codes"], tensors["codebooks"],
                                tensors["scales"])
            put(layer_path + ("weight",), dense, cast=True)
            continue
        if quant_name == "awq":
            qw, scales, zeros = awq_to_canonical(
                tensors["qweight"], tensors["qzeros"], tensors["scales"],
                bits, group_size)
        else:
            qw, scales, zeros = gptq_to_canonical(
                tensors["qweight"], tensors["qzeros"], tensors["scales"],
                tensors.get("g_idx"), bits, group_size)
        target = _get_in(params, layer_path + ("qweight",))
        target_layer = _get_in(params, layer_path)
        if bits == 4 and isinstance(target_layer, dict) \
                and "mult" in target_layer:
            # W4A8 "packed" mode: requantize group scales into integer
            # multipliers + per-channel scale, re-round values, repack
            # to the group-half byte-lane layout (quant_matmul_a8p).
            from nmvllm_tpu.ops.quant_matmul import (
                requantize_grouped_to_a8p)
            k = qw.shape[0] * 8
            g_eff = k // np.asarray(scales).shape[0]
            aqw, mult, s_chan, zms = requantize_grouped_to_a8p(
                jnp.asarray(qw), jnp.asarray(scales),
                jnp.asarray(zeros), group_size=g_eff, k=k)
            put(layer_path + ("qweight",), np.asarray(aqw), cast=False)
            put(layer_path + ("mult",), np.asarray(mult), cast=False)
            put(layer_path + ("scales",), np.asarray(s_chan))
            put(layer_path + ("zeros",), np.asarray(zms), cast=False)
            continue
        if (bits == 4 and target.dtype == jnp.int8
                and target.shape[0] == qw.shape[0] * 8):
            k = qw.shape[0] * 8
            target_scales = _get_in(params, layer_path + ("scales",))
            if target_scales.shape[0] == 1:
                # W4A8 "channel" mode: requantize the group-scaled INT4
                # layer to per-channel signed int8 (single-dot path).
                from nmvllm_tpu.ops.quant_matmul import (
                    requantize_grouped_to_int8_channel)
                g_eff = k // np.asarray(scales).shape[0]
                w8, ch = requantize_grouped_to_int8_channel(
                    jnp.asarray(qw), jnp.asarray(scales),
                    jnp.asarray(zeros), bits=4, group_size=g_eff, k=k)
                qw = np.asarray(w8)
                scales = np.asarray(ch).reshape(1, -1)
            else:
                # W4A8 "grouped" mode: expand packed int4 to signed int8
                # (ops/quant_matmul.py int8_grouped_matmul path).
                from nmvllm_tpu.ops.quant_matmul import unpack_weights
                w_u = np.asarray(unpack_weights(jnp.asarray(qw), 4,
                                                group_size, k))
                qw = (w_u - 8).astype(np.int8)
        put(layer_path + ("qweight",), qw, cast=False)
        put(layer_path + ("scales",), scales)
        put(layer_path + ("zeros",), zeros, cast=False)


def _stack_quant_experts(model, moe, layer_idx, attr, tensors, put):
    """Per-expert GPTQ/AWQ expert weights -> stacked A8P arrays (when
    the MoE block runs quantized experts) or dense f32 (fallback).

    tensors keys: "{eid}.{w1|w2|w3|gate_proj|up_proj|down_proj}.{qweight
    |qzeros|scales|g_idx}" (reference per-expert checkpoint schema)."""
    from nmvllm_tpu.quantization.gptq import gptq_to_canonical
    kind_map = {"w1": "gate", "gate_proj": "gate", "w3": "up",
                "up_proj": "up", "w2": "down", "down_proj": "down"}
    e, h, i = moe.num_experts, moe.hidden_size, moe.intermediate_size
    hf_quant = getattr(model.cfg, "quantization_config", None) or {}
    if hasattr(hf_quant, "to_dict"):
        hf_quant = hf_quant.to_dict()
    bits = int(hf_quant.get("bits", hf_quant.get("w_bit", 4)))
    group_size = int(hf_quant.get("group_size",
                                  hf_quant.get("q_group_size", 128)))
    per = {}
    for name, arr in tensors.items():
        eid_s, kind, suffix = name.split(".", 2)
        per.setdefault((int(eid_s), kind_map[kind]), {})[suffix] = arr

    def canonical(eid, role):
        t = per[(eid, role)]
        return gptq_to_canonical(t["qweight"], t["qzeros"], t["scales"],
                                 t.get("g_idx"), bits, group_size)

    quant = getattr(moe, "quant_experts", False)
    import jax.numpy as _jnp
    if quant:
        from nmvllm_tpu.ops.quant_matmul import requantize_grouped_to_a8p
        s1 = {k: [] for k in ("qweight", "mult", "scales", "zeros")}
        s2 = {k: [] for k in ("qweight", "mult", "scales", "zeros")}
        for eid in range(e):
            g_qw, g_s, g_z = canonical(eid, "gate")
            u_qw, u_s, u_z = canonical(eid, "up")
            qw = _jnp.concatenate([_jnp.asarray(g_qw),
                                   _jnp.asarray(u_qw)], axis=1)
            s = _jnp.concatenate([_jnp.asarray(g_s), _jnp.asarray(u_s)],
                                 axis=1)
            z = _jnp.concatenate([_jnp.asarray(g_z), _jnp.asarray(u_z)],
                                 axis=1)
            for k, v in zip(s1, requantize_grouped_to_a8p(
                    qw, s, z, group_size=group_size, k=h)):
                s1[k].append(np.asarray(v))
            d_qw, d_s, d_z = canonical(eid, "down")
            for k, v in zip(s2, requantize_grouped_to_a8p(
                    _jnp.asarray(d_qw), _jnp.asarray(d_s),
                    _jnp.asarray(d_z), group_size=group_size, k=i)):
                s2[k].append(np.asarray(v))
        w1 = {k: np.stack(v) for k, v in s1.items()}
        w2 = {k: np.stack(v) for k, v in s2.items()}
    else:
        # Dequantize to dense f32 (bf16-expert serving).
        from nmvllm_tpu.ops.quant_matmul import unpack_weights
        def dense(eid, role, k):
            qw, s, z = canonical(eid, role)
            v = np.asarray(unpack_weights(_jnp.asarray(qw), bits,
                                          group_size, k), np.float32)
            g = group_size if group_size > 0 else k
            sr = np.repeat(np.asarray(s, np.float32), g, axis=0)
            zr = np.repeat(np.asarray(z, np.float32), g, axis=0)
            return (v - zr) * sr
        w1 = np.zeros((e, h, 2 * i), np.float32)
        w2 = np.zeros((e, i, h), np.float32)
        for eid in range(e):
            w1[eid, :, :i] = dense(eid, "gate", h)
            w1[eid, :, i:] = dense(eid, "up", h)
            w2[eid] = dense(eid, "down", i)
    if not getattr(moe, "ep", False):
        from nmvllm_tpu.ops.moe import interleave_w1_for_tp
        tp = getattr(moe, "tp_size", getattr(model, "tp_size", 1))
        w1 = interleave_w1_for_tp(w1, tp)
    path = ("layers", layer_idx, attr)
    if quant:
        for k in w1:
            put(path + ("w1", k), w1[k], cast=False)
            put(path + ("w2", k), w2[k], cast=False)
    else:
        put(path + ("w1",), w1)
        put(path + ("w2",), w2)


def _load_expert_groups(model, params, expert_groups, put):
    """Stack per-expert tensors into (E, ...) arrays. Handles Mixtral
    (block_sparse_moe.experts.E.w{1,3,2}) and Qwen2-MoE / DeepSeek
    (mlp.experts.E.{gate,up,down}_proj) naming."""
    kind_map = {"w1": "gate", "gate_proj": "gate",
                "w3": "up", "up_proj": "up",
                "w2": "down", "down_proj": "down"}
    for layer_prefix, tensors in expert_groups.items():
        # layer_prefix like "model.layers.3.block_sparse_moe" or
        # "model.layers.3.mlp".
        parts = layer_prefix.split(".")
        layer_idx = int(parts[2])
        attr = parts[3]
        moe = getattr(model.layers[layer_idx], attr)
        e, h, i = moe.num_experts, moe.hidden_size, moe.intermediate_size
        if any(n.endswith(".qweight") for n in tensors):
            _stack_quant_experts(model, moe, layer_idx, attr, tensors,
                                 put)
            continue
        w1 = np.zeros((e, h, 2 * i), np.float32)
        w2 = np.zeros((e, i, h), np.float32)
        for name, arr in tensors.items():
            head = name.split(".", 1)[0]
            if not head.isdigit():
                # DBRX-style fused stacks: experts.mlp.{w1,v1,w2} hold all
                # experts in one (E*I, H) tensor (reference dbrx.py).
                kind = name.rsplit(".", 1)[-1]
                if kind == "w1":      # gate stack
                    w1[:, :, :i] = arr.reshape(e, i, h).transpose(0, 2, 1)
                elif kind == "v1":    # up stack
                    w1[:, :, i:] = arr.reshape(e, i, h).transpose(0, 2, 1)
                elif kind == "w2":    # down stack (already (E*I, H))
                    w2[:] = arr.reshape(e, i, h)
                continue
            eid_s, kind, _ = name.split(".", 2)
            eid = int(eid_s)
            role = kind_map.get(kind)
            if role == "gate":    # (I, H)
                w1[eid, :, :i] = arr.T
            elif role == "up":    # (I, H)
                w1[eid, :, i:] = arr.T
            elif role == "down":  # (H, I)
                w2[eid] = arr.T
        # TP-sharded experts need the shard-interleaved gate|up layout so
        # each rank's slice is [gate_r | up_r] (EP shards experts whole
        # and keeps the plain layout).
        if not getattr(moe, "ep", False):
            from nmvllm_tpu.ops.moe import interleave_w1_for_tp
            tp = getattr(moe, "tp_size",
                         getattr(model, "tp_size", 1))
            w1 = interleave_w1_for_tp(w1, tp)
        path = ("layers", layer_idx, attr)
        put(path + ("w1",), w1)
        put(path + ("w2",), w2)


def _get_in(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def save_sharded_state(params, path: str) -> None:
    """Persist the (sharded) params pytree for fast restart.

    Reference: ShardedStateLoader / Worker.save_sharded_state
    (model_loader/loader.py:446, worker.py:135) — pre-sharded per-rank
    checkpoints. TPU-native: one orbax checkpoint of the global pytree;
    restore re-shards onto whatever mesh is active.
    """
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_sharded_state(model, mesh, path: str):
    """Restore params saved by save_sharded_state onto `mesh`."""
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec
    specs = model.specs()
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, PartitionSpec))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    target = jax.tree.map(
        lambda sd, sh: jax.ShapeDtypeStruct(sd.shape, sd.dtype, sharding=sh),
        shapes, shardings)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def load_tensorizer_weights(model, params, uri: str,
                            extra_config: Dict[str, Any]):
    """Stream a tensorizer-serialized checkpoint into the params tree
    (reference: model_loader/tensorizer.py TensorizerLoader:336 —
    streamed, optionally encrypted tensors). Requires the optional
    ``tensorizer`` package; tensor names map through the same
    hf_name_map as safetensors loading."""
    try:
        from tensorizer import TensorDeserializer
        from tensorizer.stream_io import open_stream
    except ImportError as e:
        raise ImportError(
            "load_format='tensorizer' requires the optional `tensorizer` "
            "package (reference model_loader/tensorizer.py). It is not "
            "installed in this environment; use safetensors / "
            "sharded_state (orbax) loading instead.") from e
    name_map = model.hf_name_map()
    stream = open_stream(uri, mode="rb",
                         **(extra_config.get("stream_params") or {}))
    with TensorDeserializer(stream, lazy_load=True,
                            **(extra_config.get("deserializer_params")
                               or {})) as des:
        for name, arr in des.items():
            if name not in name_map:
                continue
            path, transform = name_map[name]
            np_arr = np.asarray(arr)
            if transform == "transpose":
                np_arr = np.ascontiguousarray(np_arr.T)
            target = _get_in(params, path)
            a = jnp.asarray(np_arr).astype(target.dtype)
            _set_in(params, path, jax.device_put(a, target.sharding))
    return params


def _finalize(model, params):
    """Serving-time param-tree transforms (projection fusion, optional
    LM-head quantization)."""
    if hasattr(model, "finalize_for_serving"):
        params = model.finalize_for_serving(params)
    head = getattr(model, "lm_head", None)
    if head is not None and getattr(head, "quant_method", None) is not None \
            and isinstance(params.get("lm_head"), dict):
        params["lm_head"] = head.quantize_loaded(params["lm_head"])
    return params


def get_model(engine_config: EngineConfig, mesh):
    """Build the model and its (sharded) params per LoadConfig."""
    model = build_model(engine_config)
    model_config = engine_config.model_config
    load_config = engine_config.load_config
    fmt = load_config.load_format if load_config else "auto"
    if fmt == "orbax" or (os.path.isdir(model_config.model) and os.path.
                          exists(os.path.join(model_config.model,
                                              "_CHECKPOINT_METADATA"))):
        params = load_sharded_state(model, mesh, model_config.model)
        if hasattr(model, "post_process_weights"):
            params = model.post_process_weights(params)
        return model, _finalize(model, params)
    if fmt == "tensorizer":
        params = init_params_on_mesh(model, mesh, model_config.seed)
        params = load_tensorizer_weights(
            model, params, model_config.model,
            (load_config.model_loader_extra_config or {}))
        if hasattr(model, "post_process_weights"):
            params = model.post_process_weights(params)
        return model, _finalize(model, params)
    params = init_params_on_mesh(model, mesh, model_config.seed)
    is_local_ckpt = os.path.isdir(model_config.model)
    if fmt == "dummy" or (fmt == "auto" and not is_local_ckpt):
        # Presets / benchmarks: random weights (DummyModelLoader:309).
        if hasattr(model, "post_process_weights"):
            params = model.post_process_weights(params)
        return model, _finalize(model, params)
    if is_local_ckpt:
        params = load_safetensors_weights(model, params, model_config.model,
                                          mesh, model_config.dtype,
                                          quant_name=model_config.
                                          quantization)
        if hasattr(model, "post_process_weights"):
            params = model.post_process_weights(params)
        return model, _finalize(model, params)
    raise ValueError(
        f"Cannot load weights for {model_config.model} with format {fmt}")
