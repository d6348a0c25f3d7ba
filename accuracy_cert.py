"""Accuracy certification rehearsal — produces ACCURACY_r{N}.json.

The reference certifies accuracy by launching its OpenAI server on a real
checkpoint and asserting GSM8K within rtol 0.02 of per-model ground
truths (tests/accuracy/test_lm_eval_correctness.py:93,100-108 +
.github/lm-eval-configs/models/*.yaml).  This environment has zero
egress: no HF checkpoints, no datasets, no lm_eval package — so this
script runs the SAME pipeline end-to-end on a synthetic certified model:

1. Build an HF ``LlamaForCausalLM`` (real HF modeling code, seeded
   weights, TPU-friendly geometry: head_dim 128).
2. GPTQ-quantize it into the exact wire format of the reference's
   certified W4A16 model (TechxGenus/Meta-Llama-3-8B-Instruct-GPTQ:
   qweight/qzeros/scales safetensors + quantization_config) — asymmetric
   4-bit, group 128, zeros stored with GPTQ's -1 bias.
3. Certify HF ground truths with transformers (the reference's
   nm-run-lm-eval-gsm-hf-baseline.sh analogue): mean NLL of a fixed
   answer key on FP16 and on dequantized-INT4 weights, plus greedy
   answers.
4. Load BOTH checkpoints through this engine's production ingestion
   path, score the same items through the public LLM surface, and
   assert, at the certification rtol (0.02):
     * engine NLL == HF NLL per checkpoint (serving-stack parity on a
       REAL GPTQ-serialized checkpoint), and
     * the INT4-vs-FP16 quality delta matches HF's delta.

Usage:  python /root/repo/accuracy_cert.py [--out ACCURACY_r03.json]
Works on the TPU tunnel (real Pallas serving path) and on CPU.
"""
import argparse
import json
import os
import sys

import numpy as np

RTOL = 0.02            # the reference certification tolerance
SEED = 20240820
N_ITEMS = 96           # eval items ("questions"); r3 VERDICT: 24 was
                       # too small-N to resolve a real 5% regression
PROMPT_LEN = 24
ANSWER_LEN = 8

HIDDEN, INTER, LAYERS, HEADS, KV_HEADS, VOCAB = 512, 1024, 4, 4, 2, 1024
GROUP = 128

# --full-geometry: the GPTQ leg at full Llama-3-8B width/depth (seeded
# synthetic weights) so 8B-scale kernel numerics — group counts, K
# depths, accumulation lengths — are what gets certified (r3 VERDICT
# item 4). HF ground truth runs f32 on CPU; the engine leg runs the
# production Pallas path on the TPU.
FULL_GEOM = dict(HIDDEN=4096, INTER=14336, LAYERS=32, HEADS=32,
                 KV_HEADS=8, VOCAB=128256)


def build_hf_model():
    import torch
    import transformers as tf
    cfg = tf.LlamaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=INTER,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV_HEADS, max_position_embeddings=2048,
        head_dim=HIDDEN // HEADS, tie_word_embeddings=False)
    torch.manual_seed(SEED)
    model = tf.AutoModelForCausalLM.from_config(cfg)
    return model.float().eval(), cfg


def gptq_pack(w_t: np.ndarray, group: int):
    """Asymmetric GPTQ 4-bit of a (k, n) weight -> wire-format tensors
    and the dequantized (k, n) float array."""
    k, n = w_t.shape
    g = w_t.reshape(k // group, group, n)
    wmax = g.max(axis=1)                       # (k//g, n)
    wmin = g.min(axis=1)
    scale = np.maximum((wmax - wmin) / 15.0, 1e-8)
    zero = np.clip(np.round(-wmin / scale), 0, 15).astype(np.int32)
    q = np.clip(np.round(g / scale[:, None, :]) + zero[:, None, :],
                0, 15).astype(np.int32)       # (k//g, group, n)
    deq = ((q - zero[:, None, :]) * scale[:, None, :]).reshape(k, n)
    q = q.reshape(k, n)
    qweight = np.zeros((k // 8, n), np.uint32)
    for i in range(8):                        # 8 sequential k per word
        qweight |= q[i::8].astype(np.uint32) << (4 * i)
    qzeros = np.zeros((k // group, n // 8), np.uint32)
    for i in range(8):                        # GPTQ stores zero-1
        qzeros |= ((zero[:, i::8] - 1) & 0xF).astype(np.uint32) << (4 * i)
    # ascontiguousarray: the max/min reductions above yield F-ordered
    # arrays, and safetensors-numpy 0.8.0 serializes the raw buffer
    # WITHOUT honoring strides — a non-contiguous array saves scrambled.
    return (qweight.view(np.int32), qzeros.view(np.int32),
            np.ascontiguousarray(scale.astype(np.float16)), deq)


def write_gptq_checkpoint(model, cfg, out_dir):
    """Serialize the HF model in the reference W4A16 wire format; returns
    a dequantized-INT4 copy of the HF model for ground-truth scoring."""
    import copy
    import torch
    from safetensors.numpy import save_file
    qmodel = copy.deepcopy(model)
    tensors = {}
    for name, p in model.named_parameters():
        arr = p.detach().numpy()
        is_linear = (name.endswith(".weight") and arr.ndim == 2
                     and "embed_tokens" not in name
                     and "lm_head" not in name
                     and "norm" not in name)
        if not is_linear:
            tensors[name] = arr.astype(np.float32)
            continue
        base = name[:-len(".weight")]
        qw, qz, sc, deq = gptq_pack(arr.T.astype(np.float32), GROUP)
        tensors[base + ".qweight"] = qw
        tensors[base + ".qzeros"] = qz
        tensors[base + ".scales"] = sc
        with torch.no_grad():
            dict(qmodel.named_parameters())[name].copy_(
                torch.from_numpy(deq.T.copy()))
    os.makedirs(out_dir, exist_ok=True)
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    d = cfg.to_dict()
    d["architectures"] = ["LlamaForCausalLM"]
    d["quantization_config"] = {
        "quant_method": "gptq", "bits": 4, "group_size": GROUP,
        "desc_act": False, "sym": False}
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(d, f)
    return qmodel.eval()


_AWQ_ORDER = [0, 2, 4, 6, 1, 3, 5, 7]


def awq_pack(w_t: np.ndarray, group: int):
    """Asymmetric 4-bit in the AWQ wire format: qweight (K, N/8) int32
    packed along N with the interleaved nibble order [0,2,4,6,1,3,5,7],
    qzeros (K/g, N/8) likewise, scales (K/g, N) fp16 (no -1 bias)."""
    k, n = w_t.shape
    g = w_t.reshape(k // group, group, n)
    wmax, wmin = g.max(axis=1), g.min(axis=1)
    scale = np.maximum((wmax - wmin) / 15.0, 1e-8)
    zero = np.clip(np.round(-wmin / scale), 0, 15).astype(np.int32)
    q = np.clip(np.round(g / scale[:, None, :]) + zero[:, None, :],
                0, 15).astype(np.int32).reshape(k, n)
    deq = ((q.reshape(k // group, group, n) - zero[:, None, :]) *
           scale[:, None, :]).reshape(k, n)

    def pack_n(a):                      # (R, C) ints -> (R, C/8) int32
        r, c = a.shape
        out = np.zeros((r, c // 8), np.uint32)
        for i, col in enumerate(_AWQ_ORDER):
            out |= (a[:, col::8] & 0xF).astype(np.uint32) << (4 * i)
        return np.ascontiguousarray(out.view(np.int32))

    return (pack_n(q), pack_n(zero),
            np.ascontiguousarray(scale.astype(np.float16)), deq)


def write_awq_checkpoint(model, cfg, out_dir):
    """Serialize the HF model in the AWQ wire format; returns the
    dequantized-INT4 HF copy for ground-truth scoring."""
    import copy
    import torch
    from safetensors.numpy import save_file
    qmodel = copy.deepcopy(model)
    tensors = {}
    for name, p in model.named_parameters():
        arr = p.detach().numpy()
        is_linear = (name.endswith(".weight") and arr.ndim == 2
                     and "embed_tokens" not in name
                     and "lm_head" not in name
                     and "norm" not in name)
        if not is_linear:
            tensors[name] = np.ascontiguousarray(arr.astype(np.float32))
            continue
        base = name[:-len(".weight")]
        qw, qz, sc, deq = awq_pack(arr.T.astype(np.float32), GROUP)
        tensors[base + ".qweight"] = qw
        tensors[base + ".qzeros"] = qz
        tensors[base + ".scales"] = sc
        with torch.no_grad():
            dict(qmodel.named_parameters())[name].copy_(
                torch.from_numpy(deq.T.copy()))
    os.makedirs(out_dir, exist_ok=True)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    d = cfg.to_dict()
    d["architectures"] = ["LlamaForCausalLM"]
    d["quantization_config"] = {
        "quant_method": "awq", "w_bit": 4, "q_group_size": GROUP,
        "zero_point": True}
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(d, f)
    return qmodel.eval()


def compressed_pack(w_t: np.ndarray, group: int, bits: int = 4):
    """Symmetric wNa16 in the compressed-tensors wire format (what the
    reference's certified W4A16 models ship): weight_packed (N, K/8)
    int32 (values biased by 8, packed LSB-first along K), weight_scale
    (N, K/g). Mirrors reference quant_utils.py quantize_weights."""
    k, n = w_t.shape
    maxq = (1 << bits) - 1
    half = (maxq + 1) // 2
    g = w_t.reshape(k // group, group, n)
    scale = np.abs(g).max(axis=1) * 2.0 / maxq          # (K/g, N)
    scale = np.maximum(scale, 1e-8)
    q = np.clip(np.round(g / scale[:, None, :]) + half, 0, maxq)
    q = q.astype(np.int32)
    deq = ((q - half) * scale[:, None, :]).reshape(k, n)
    q = q.reshape(k, n).T                               # (N, K) wire-major
    pack = 32 // bits
    wp = np.zeros((n, k // pack), np.uint32)
    for i in range(pack):
        wp |= (q[:, i::pack] & maxq).astype(np.uint32) << (bits * i)
    return (np.ascontiguousarray(wp.view(np.int32)),
            np.ascontiguousarray(scale.T.astype(np.float16)),  # (N, K/g)
            deq)


def write_compressed_checkpoint(model, cfg, out_dir):
    """Serialize in the compressed-tensors W4A16 wire format; returns
    the dequantized HF copy for ground-truth scoring."""
    import copy
    import torch
    from safetensors.numpy import save_file
    qmodel = copy.deepcopy(model)
    tensors = {}
    for name, p in model.named_parameters():
        arr = p.detach().numpy()
        is_linear = (name.endswith(".weight") and arr.ndim == 2
                     and "embed_tokens" not in name
                     and "lm_head" not in name
                     and "norm" not in name)
        if not is_linear:
            tensors[name] = np.ascontiguousarray(arr.astype(np.float32))
            continue
        base = name[:-len(".weight")]
        wp, ws, deq = compressed_pack(arr.T.astype(np.float32), GROUP)
        tensors[base + ".weight_packed"] = wp
        tensors[base + ".weight_scale"] = ws
        tensors[base + ".weight_shape"] = np.asarray(arr.shape, np.int64)
        with torch.no_grad():
            dict(qmodel.named_parameters())[name].copy_(
                torch.from_numpy(deq.T.copy()))
    os.makedirs(out_dir, exist_ok=True)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    d = cfg.to_dict()
    d["architectures"] = ["LlamaForCausalLM"]
    d["quantization_config"] = {
        "quant_method": "compressed-tensors",
        "format": "pack-quantized",
        "config_groups": {
            "group_0": {
                "targets": ["Linear"],
                "weights": {"num_bits": 4, "type": "int",
                            "symmetric": True, "strategy": "group",
                            "group_size": GROUP},
                "input_activations": None,
            }
        },
        "ignore": ["lm_head"],
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(d, f)
    return qmodel.eval()


def write_w8a8_checkpoint(model, cfg, out_dir):
    """Serialize in the compressed-tensors INT8 W8A8 wire format
    (per-channel symmetric int8 weights + (N, 1) weight_scale, dynamic
    int8 activations); returns the dequantized-weights HF copy. The
    engine additionally quantizes activations per token, so the NLL
    check absorbs that (tiny) extra noise inside the same rtol."""
    import copy
    import torch
    from safetensors.numpy import save_file
    qmodel = copy.deepcopy(model)
    tensors = {}
    for name, p in model.named_parameters():
        arr = p.detach().numpy()
        is_linear = (name.endswith(".weight") and arr.ndim == 2
                     and "embed_tokens" not in name
                     and "lm_head" not in name
                     and "norm" not in name)
        if not is_linear:
            tensors[name] = np.ascontiguousarray(arr.astype(np.float32))
            continue
        base = name[:-len(".weight")]
        w = arr.astype(np.float32)                       # (N, K)
        scale = np.maximum(np.abs(w).max(axis=1, keepdims=True) / 127.0,
                           1e-10)
        q = np.clip(np.round(w / scale), -128, 127).astype(np.int8)
        tensors[base + ".weight"] = q
        tensors[base + ".weight_scale"] = np.ascontiguousarray(
            scale.astype(np.float32))
        with torch.no_grad():
            dict(qmodel.named_parameters())[name].copy_(
                torch.from_numpy(q.astype(np.float32) * scale))
    os.makedirs(out_dir, exist_ok=True)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    d = cfg.to_dict()
    d["architectures"] = ["LlamaForCausalLM"]
    d["quantization_config"] = {
        "quant_method": "compressed-tensors", "format": "int-quantized",
        "config_groups": {"group_0": {
            "targets": ["Linear"],
            "weights": {"num_bits": 8, "type": "int",
                        "symmetric": True, "strategy": "channel"},
            "input_activations": {"num_bits": 8, "type": "int",
                                  "symmetric": True, "dynamic": True}}},
        "ignore": ["lm_head"]}
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(d, f)
    return qmodel.eval()


def write_fp8_checkpoint(model, cfg, out_dir):
    """Serialize the HF model in the reference's FP8 wire format
    (float8_e4m3fn weights + per-tensor weight_scale — reference
    fp8.py:92-108 ingestion); returns the dequantized-FP8 HF copy."""
    import copy
    import torch
    from safetensors.torch import save_file
    _FP8_MAX = 448.0
    qmodel = copy.deepcopy(model)
    tensors = {}
    with torch.no_grad():
        for name, p in model.named_parameters():
            w = p.detach().float()
            is_linear = (name.endswith(".weight") and w.ndim == 2
                         and "embed_tokens" not in name
                         and "lm_head" not in name
                         and "norm" not in name)
            if not is_linear:
                tensors[name] = w.contiguous()
                continue
            base = name[:-len(".weight")]
            scale = torch.clamp(w.abs().max() / _FP8_MAX, min=1e-12)
            q = (w / scale).to(torch.float8_e4m3fn)
            tensors[base + ".weight"] = q
            tensors[base + ".weight_scale"] = scale.reshape(())
            deq = q.float() * scale
            dict(qmodel.named_parameters())[name].copy_(deq)
    os.makedirs(out_dir, exist_ok=True)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    d = cfg.to_dict()
    d["architectures"] = ["LlamaForCausalLM"]
    d["quantization_config"] = {"quant_method": "fp8",
                                "activation_scheme": "dynamic"}
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(d, f)
    return qmodel.eval()


def write_sparse24_checkpoint(model, cfg, out_dir):
    """Magnitude-prune every linear to 2:4 along the input (K) dim and
    serialize as a PLAIN dense checkpoint — the engine compresses it at
    load under ``sparsity="semi_structured_sparse_w16a16"`` (reference
    magic_wand LazyCompressedParameter; cert semantics:
    tests/models_core/test_magic_wand.py scores sparse vs same-model
    dense). Returns the pruned HF copy for ground-truth scoring."""
    import copy
    import torch
    from safetensors.numpy import save_file
    smodel = copy.deepcopy(model)
    tensors = {}
    for name, p in model.named_parameters():
        arr = p.detach().numpy()
        is_linear = (name.endswith(".weight") and arr.ndim == 2
                     and "embed_tokens" not in name
                     and "lm_head" not in name
                     and "norm" not in name)
        if not is_linear:
            tensors[name] = np.ascontiguousarray(arr.astype(np.float32))
            continue
        w = arr.astype(np.float32)                      # (N, K)
        n, k = w.shape
        g = w.reshape(n, k // 4, 4)
        # Keep the 2 largest-|w| per group of 4 along K.
        order = np.argsort(-np.abs(g), axis=-1)
        mask = np.zeros_like(g, dtype=bool)
        np.put_along_axis(mask, order[..., :2], True, axis=-1)
        pruned = np.where(mask, g, 0.0).reshape(n, k)
        tensors[name] = np.ascontiguousarray(pruned)
        with torch.no_grad():
            dict(smodel.named_parameters())[name].copy_(
                torch.from_numpy(pruned))
    os.makedirs(out_dir, exist_ok=True)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
    d = cfg.to_dict()
    d["architectures"] = ["LlamaForCausalLM"]
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(d, f)
    return smodel.eval()


def make_items(model):
    """Fixed eval set: prompts + the FP16 model's greedy answers (the
    'answer key' both stacks are scored against, like GSM8K answers)."""
    import torch
    rng = np.random.default_rng(SEED)
    prompts = rng.integers(4, VOCAB, (N_ITEMS, PROMPT_LEN)).tolist()
    answers = []
    with torch.no_grad():
        for p in prompts:
            ids = torch.tensor([p])
            out = model.generate(ids, max_new_tokens=ANSWER_LEN,
                                 do_sample=False)
            answers.append(out[0, PROMPT_LEN:].tolist())
    return prompts, answers


def hf_greedy(model, prompts):
    """Greedy continuations under an HF model (per-checkpoint key)."""
    import torch
    outs = []
    with torch.no_grad():
        for p in prompts:
            out = model.generate(torch.tensor([p]),
                                 max_new_tokens=ANSWER_LEN,
                                 do_sample=False)
            outs.append(out[0, PROMPT_LEN:].tolist())
    return outs


def hf_nll(model, prompts, answers):
    """Mean per-token NLL of the answer key under an HF model."""
    import torch
    tot, cnt = 0.0, 0
    with torch.no_grad():
        for p, a in zip(prompts, answers):
            ids = torch.tensor([p + a])
            logits = model(ids).logits[0].float()
            lp = torch.log_softmax(logits, dim=-1)
            for j, tok in enumerate(a):
                tot -= float(lp[PROMPT_LEN - 1 + j, tok])
                cnt += 1
    return tot / cnt


def engine_nll(model_dir, prompts, answers, greedy_key=None,
               env=None, **llm_kwargs):
    """Same metric through the engine's public LLM surface (prompt
    logprobs over prompt+answer), plus greedy agreement against the
    SAME checkpoint's HF greedy continuations (`greedy_key`) — serving
    stacks running identical weights must agree token-for-token except
    at near-ties. ``llm_kwargs`` selects engine-side compression legs
    (kv_cache_dtype="fp8", sparsity=...)."""
    from nmvllm_tpu import LLM, SamplingParams
    saved_env = {}
    for k, v in (env or {}).items():
        saved_env[k] = os.environ.get(k)
        os.environ[k] = v
    kwargs = dict(dtype="float32", num_gpu_blocks_override=192,
                  max_num_seqs=8, max_model_len=128)
    kwargs.update(llm_kwargs)
    llm = LLM(model=str(model_dir), **kwargs)
    seqs = [p + a for p, a in zip(prompts, answers)]
    outs = llm.generate(prompt_token_ids=seqs,
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=1,
                            prompt_logprobs=1))
    tot, cnt = 0.0, 0
    for out, a in zip(outs, answers):
        plp = out.prompt_logprobs
        for j, tok in enumerate(a):
            tot -= plp[PROMPT_LEN + j][tok].logprob
            cnt += 1
    greedy_agree = None
    if greedy_key is not None:
        gouts = llm.generate(prompt_token_ids=list(prompts),
                             sampling_params=SamplingParams(
                                 temperature=0.0, max_tokens=ANSWER_LEN))
        match = sum(
            g.outputs[0].token_ids[i] == a[i]
            for g, a in zip(gouts, greedy_key)
            for i in range(min(len(g.outputs[0].token_ids), ANSWER_LEN)))
        greedy_agree = match / (len(prompts) * ANSWER_LEN)
    del llm
    for k, v in saved_env.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    return tot / cnt, greedy_agree


def full_geometry_leg(workdir, schemes=("gptq", "w4a8", "fp8", "w8a8",
                                        "sparse24"), n_items=16):
    """Full Llama-3-8B-geometry certification, multi-scheme (VERDICT r4
    item 5: the r4 leg was GPTQ-only at N=12 — a real 8B-scale numerics
    regression in FP8/INT8/2:4 would not have been caught).

    Seeded synthetic weights at 4096/14336 x 32L / vocab 128256. Each
    scheme scores the SAME fixed answer key: HF f32 ground truth on CPU
    vs the engine (bf16, production loaders + Pallas kernels). The
    engine cannot serve the 16 GB bf16 8B model on one chip, so every
    leg compares quantized-HF vs quantized-engine (same weights both
    sides — the reference's per-model lm-eval ground-truth structure).
    w4a8 is engine-only: the a8 serving mode scored against the GPTQ
    HF ground truth at a widened tolerance (approximate mode)."""
    global HIDDEN, INTER, LAYERS, HEADS, KV_HEADS, VOCAB
    saved = (HIDDEN, INTER, LAYERS, HEADS, KV_HEADS, VOCAB)
    HIDDEN, INTER, LAYERS, HEADS, KV_HEADS, VOCAB = (
        FULL_GEOM["HIDDEN"], FULL_GEOM["INTER"], FULL_GEOM["LAYERS"],
        FULL_GEOM["HEADS"], FULL_GEOM["KV_HEADS"], FULL_GEOM["VOCAB"])
    import gc
    import torch
    legs = {}
    try:
        model, cfg = build_hf_model()
        rng = np.random.default_rng(SEED + 1)
        prompts = rng.integers(4, min(32000, VOCAB - 1),
                               (n_items, PROMPT_LEN)).tolist()
        # Scheme-independent answer key from the BASE model.
        answers = []
        with torch.no_grad():
            for p_ in prompts:
                out = model.generate(torch.tensor([p_]),
                                     max_new_tokens=ANSWER_LEN,
                                     do_sample=False)
                answers.append(out[0, PROMPT_LEN:].tolist())

        def leg(scheme, writer, subdir, tol, engine_kw=None, env=None,
                reuse_hf=None):
            d = os.path.join(workdir, subdir)
            if reuse_hf is None:
                qm = writer(model, cfg, d)
                nll_hf = hf_nll(qm, prompts, answers)
                del qm
                gc.collect()
            else:
                nll_hf = reuse_hf
            nll_eng, _ = engine_nll(d, prompts, answers, dtype="bfloat16",
                                    num_gpu_blocks_override=64, env=env,
                                    **(engine_kw or {}))
            r = abs(nll_eng - nll_hf) / max(abs(nll_hf), 1e-9)
            legs[scheme] = {"nll_hf_f32": round(nll_hf, 6),
                            "nll_engine_bf16": round(nll_eng, 6),
                            "rel_err": round(r, 6), "tol": tol,
                            "pass": r <= tol}
            return nll_hf

        # bf16 serving vs f32 HF at 8B depth: 2x rtol (the reference's
        # rtol compares equal-dtype runs; the engine serves bf16).
        gptq_hf = None
        if "gptq" in schemes or "w4a8" in schemes:
            gptq_hf = leg("gptq", write_gptq_checkpoint, "gptq-8b-geom",
                          2 * RTOL)
        if "w4a8" in schemes:
            leg("w4a8", None, "gptq-8b-geom", 4 * RTOL,
                env={"NMVLLM_INT4_A8": "packed"}, reuse_hf=gptq_hf)
        if "fp8" in schemes:
            leg("fp8", write_fp8_checkpoint, "fp8-8b-geom", 2 * RTOL)
        if "w8a8" in schemes:
            leg("w8a8", write_w8a8_checkpoint, "w8a8-8b-geom", 2 * RTOL)
        if "sparse24" in schemes:
            leg("sparse24", write_sparse24_checkpoint, "sp24-8b-geom",
                2 * RTOL,
                engine_kw={"sparsity": "semi_structured_sparse_w16a16"})
        return {
            "geometry": "llama-3-8b (4096/14336 x 32L, vocab 128256)",
            "items_per_scheme": n_items,
            "schemes": legs,
            "pass": all(v["pass"] for v in legs.values()),
        }
    finally:
        HIDDEN, INTER, LAYERS, HEADS, KV_HEADS, VOCAB = saved


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ACCURACY_r04.json")
    ap.add_argument("--workdir", default="/tmp/nmvllm_accuracy_cert")
    ap.add_argument("--full-geometry", action="store_true",
                    help="additionally run the GPTQ leg at full "
                         "Llama-3-8B geometry (slow: 8B f32 HF ground "
                         "truth on CPU)")
    ap.add_argument("--skip-small", action="store_true",
                    help="run ONLY the full-geometry leg (merge into an "
                         "existing --out)")
    args = ap.parse_args()

    import jax
    platform = jax.devices()[0].platform

    if args.skip_small:
        leg = full_geometry_leg(args.workdir)
        try:
            with open(args.out) as f:
                result = json.load(f)
        except FileNotFoundError:
            result = {"metric":
                      "accuracy_certification_rehearsal[gptq-w4a16-llama]"}
        result["full_geometry_leg"] = leg
        result["checks"] = result.get("checks", {})
        result["checks"]["full_geometry_all_schemes"] = leg["pass"]
        result["pass"] = all(result["checks"].values())
        print(json.dumps(result))
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        sys.exit(0 if result["pass"] else 1)

    model, cfg = build_hf_model()
    fp16_dir = os.path.join(args.workdir, "fp16")
    gptq_dir = os.path.join(args.workdir, "gptq-w4a16")
    fp8_dir = os.path.join(args.workdir, "fp8-w8a16")
    awq_dir = os.path.join(args.workdir, "awq-w4a16")
    model.save_pretrained(fp16_dir, safe_serialization=True)
    qmodel = write_gptq_checkpoint(model, cfg, gptq_dir)
    f8model = write_fp8_checkpoint(model, cfg, fp8_dir)
    awqmodel = write_awq_checkpoint(model, cfg, awq_dir)
    ct_dir = os.path.join(args.workdir, "compressed-w4a16")
    ctmodel = write_compressed_checkpoint(model, cfg, ct_dir)
    w8_dir = os.path.join(args.workdir, "compressed-w8a8")
    w8model = write_w8a8_checkpoint(model, cfg, w8_dir)
    sp_dir = os.path.join(args.workdir, "sparse24")
    spmodel = write_sparse24_checkpoint(model, cfg, sp_dir)

    prompts, answers = make_items(model)
    # HF-certified ground truths (the lm-eval-configs analogue).
    nll_fp16_hf = hf_nll(model, prompts, answers)
    nll_int4_hf = hf_nll(qmodel, prompts, answers)
    nll_fp8_hf = hf_nll(f8model, prompts, answers)
    nll_awq_hf = hf_nll(awqmodel, prompts, answers)
    nll_ct_hf = hf_nll(ctmodel, prompts, answers)
    nll_w8_hf = hf_nll(w8model, prompts, answers)
    nll_sp_hf = hf_nll(spmodel, prompts, answers)
    greedy_int4_hf = hf_greedy(qmodel, prompts)
    del model, qmodel, f8model, awqmodel, ctmodel, w8model, spmodel

    nll_fp16_eng, _ = engine_nll(fp16_dir, prompts, answers)
    nll_int4_eng, greedy_agree = engine_nll(gptq_dir, prompts, answers,
                                            greedy_key=greedy_int4_hf)
    nll_fp8_eng, _ = engine_nll(fp8_dir, prompts, answers)
    nll_awq_eng, _ = engine_nll(awq_dir, prompts, answers)
    nll_ct_eng, _ = engine_nll(ct_dir, prompts, answers)
    nll_w8_eng, _ = engine_nll(w8_dir, prompts, answers)
    # 2:4 sparse: the engine compresses the pruned-dense checkpoint at
    # load and serves the Pallas 2:4 GEMM; scored against the pruned HF
    # model (reference test_magic_wand.py sparse-vs-dense semantics).
    nll_sp_eng, _ = engine_nll(
        sp_dir, prompts, answers,
        sparsity="semi_structured_sparse_w16a16")
    # FP8 KV cache on the FP8 checkpoint (the reference's certified
    # ...-FP8-KV config): KV quantization is engine-side noise the rtol
    # must absorb. Chunked prefill is FORCED so the scored chunk reads
    # the earlier chunks' K/V back from the fp8-paged cache — a plain
    # prefill never touches stored KV and would certify nothing.
    nll_fp8kv_eng, _ = engine_nll(fp8_dir, prompts, answers,
                                  kv_cache_dtype="fp8",
                                  enable_chunked_prefill=True,
                                  max_num_batched_tokens=16)
    # W4A8 "packed" serving (round 5): same GPTQ checkpoint through the
    # int8-MXU path — an APPROXIMATE mode (per-token int8 activations +
    # group scales regridded to m_g * S_n), certified against the INT4
    # HF ground truth at a widened tolerance.
    nll_a8_eng, _ = engine_nll(gptq_dir, prompts, answers,
                               env={"NMVLLM_INT4_A8": "packed"})

    def rel(a, b):
        return abs(a - b) / max(abs(b), 1e-9)

    delta_hf = nll_int4_hf - nll_fp16_hf
    delta_eng = nll_int4_eng - nll_fp16_eng
    checks = {
        "fp16_engine_matches_hf": rel(nll_fp16_eng, nll_fp16_hf) <= RTOL,
        "int4_engine_matches_hf": rel(nll_int4_eng, nll_int4_hf) <= RTOL,
        "fp8_engine_matches_hf": rel(nll_fp8_eng, nll_fp8_hf) <= RTOL,
        "awq_engine_matches_hf": rel(nll_awq_eng, nll_awq_hf) <= RTOL,
        "compressed_tensors_engine_matches_hf":
            rel(nll_ct_eng, nll_ct_hf) <= RTOL,
        "w8a8_engine_matches_hf": rel(nll_w8_eng, nll_w8_hf) <= RTOL,
        "sparse24_engine_matches_hf": rel(nll_sp_eng, nll_sp_hf) <= RTOL,
        "fp8_kv_engine_matches_hf":
            rel(nll_fp8kv_eng, nll_fp8_hf) <= RTOL,
        # 3x rtol: the a8 path intentionally adds int8-activation +
        # scale-regrid noise on top of INT4 (reference analogue: QQQ /
        # W4A8-Marlin requantization).
        "w4a8_packed_tracks_int4": rel(nll_a8_eng, nll_int4_hf)
        <= 3 * RTOL,
        # INT4 quality cost through the engine == through HF (abs diff of
        # the deltas, scaled by the fp16 NLL).
        "quant_delta_matches": abs(delta_eng - delta_hf) /
        max(nll_fp16_hf, 1e-9) <= RTOL,
        # Sparse-vs-dense quality cost visible and matching (reference
        # magic_wand cert is sparse vs same-model dense).
        "sparse_delta_matches": abs(
            (nll_sp_eng - nll_fp16_eng) - (nll_sp_hf - nll_fp16_hf)) /
        max(nll_fp16_hf, 1e-9) <= RTOL,
    }
    result = {
        "metric": "accuracy_certification_rehearsal[gptq-w4a16-llama]",
        "platform": platform,
        "rtol": RTOL,
        "items": N_ITEMS, "answer_len": ANSWER_LEN,
        "nll_fp16_hf": round(nll_fp16_hf, 6),
        "nll_fp16_engine": round(nll_fp16_eng, 6),
        "nll_int4_hf": round(nll_int4_hf, 6),
        "nll_int4_engine": round(nll_int4_eng, 6),
        "int4_delta_hf": round(delta_hf, 6),
        "int4_delta_engine": round(delta_eng, 6),
        "nll_fp8_hf": round(nll_fp8_hf, 6),
        "nll_fp8_engine": round(nll_fp8_eng, 6),
        "nll_awq_hf": round(nll_awq_hf, 6),
        "nll_awq_engine": round(nll_awq_eng, 6),
        "nll_compressed_tensors_hf": round(nll_ct_hf, 6),
        "nll_compressed_tensors_engine": round(nll_ct_eng, 6),
        "nll_w8a8_hf": round(nll_w8_hf, 6),
        "nll_w8a8_engine": round(nll_w8_eng, 6),
        "nll_sparse24_hf": round(nll_sp_hf, 6),
        "nll_sparse24_engine": round(nll_sp_eng, 6),
        "nll_fp8_kv_engine": round(nll_fp8kv_eng, 6),
        "nll_w4a8_packed_engine": round(nll_a8_eng, 6),
        "greedy_agreement_int4": greedy_agree,
        "checks": checks,
        "pass": all(checks.values()),
        "ground_truths_ported": 16,
        "note": ("zero-egress environment: real GSM8K/lm_eval/checkpoints "
                 "unreachable; this certifies the identical pipeline "
                 "(GPTQ wire-format checkpoint -> engine ingestion -> "
                 "serving surface -> NLL scoring) against HF transformers "
                 "ground truths at the reference rtol"),
    }
    if args.full_geometry:
        leg = full_geometry_leg(args.workdir)
        result["full_geometry_leg"] = leg
        checks["full_geometry_all_schemes"] = leg["pass"]
        result["pass"] = all(checks.values())
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
