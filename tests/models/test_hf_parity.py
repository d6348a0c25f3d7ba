"""HF-golden parity: per-position prompt logprobs from our engine vs the
same randomly-initialized checkpoint run through HuggingFace transformers
(torch CPU, float32). This is the rebuild's HfRunner analogue (reference
tests/conftest.py:162 HfRunner + tests/models per-architecture checks):
weight ingestion, layer math, rotary/alibi/parallel-residual variants and
the logits path are all validated numerically end-to-end.
"""
import numpy as np
import pytest

FAMILIES = ["llama", "gpt2", "gptj", "opt", "gptneox", "bloom", "falcon",
            "deepseek_v2",
            # round 3: rotary/MoE/softcap/logit-scale/GQA-variant coverage
            "mixtral", "qwen2", "qwen2_moe", "gemma", "gemma2", "phi3",
            "starcoder2", "stablelm", "cohere", "olmo", "dbrx",
            "phi", "mpt",
            # round 3 late: hybrid Mamba/attention/MoE recurrence,
            # sliding-window prefill, MQA bigcode
            "jamba", "mistral_swa", "gpt_bigcode"]

PROMPT = [11, 42, 7, 99, 23, 180, 301, 5, 64, 250, 17, 333]


def _hf_tiny_model(family):
    import transformers as tf
    common = dict(vocab_size=512)
    if family == "llama":
        cfg = tf.LlamaConfig(hidden_size=256, intermediate_size=512,
                             num_hidden_layers=2, num_attention_heads=2,
                             num_key_value_heads=1,
                             max_position_embeddings=2048, **common)
    elif family == "gpt2":
        cfg = tf.GPT2Config(n_embd=256, n_layer=2, n_head=2,
                            n_positions=1024, **common)
    elif family == "gptj":
        cfg = tf.GPTJConfig(n_embd=256, n_layer=2, n_head=2,
                            n_positions=1024, rotary_dim=64, **common)
    elif family == "opt":
        cfg = tf.OPTConfig(hidden_size=256, num_hidden_layers=2,
                           num_attention_heads=2, ffn_dim=512,
                           max_position_embeddings=1024,
                           word_embed_proj_dim=256, **common)
    elif family == "gptneox":
        cfg = tf.GPTNeoXConfig(hidden_size=256, num_hidden_layers=2,
                               num_attention_heads=2, intermediate_size=512,
                               max_position_embeddings=1024, rotary_pct=0.5,
                               use_parallel_residual=True, **common)
    elif family == "bloom":
        cfg = tf.BloomConfig(hidden_size=256, n_layer=2, n_head=2, **common)
    elif family == "falcon":
        cfg = tf.FalconConfig(hidden_size=256, num_hidden_layers=2,
                              num_attention_heads=2, multi_query=True,
                              parallel_attn=True, bias=False,
                              max_position_embeddings=1024, **common)
    elif family == "deepseek_v2":
        cfg = tf.DeepseekV2Config(
            hidden_size=256, intermediate_size=512,
            moe_intermediate_size=128, num_hidden_layers=3,
            num_attention_heads=2, num_key_value_heads=2,
            qk_nope_head_dim=64, qk_rope_head_dim=32, v_head_dim=64,
            q_lora_rank=None, kv_lora_rank=128, n_routed_experts=8,
            n_shared_experts=1, num_experts_per_tok=2,
            topk_method="group_limited_greedy", n_group=2, topk_group=1,
            routed_scaling_factor=1.0, norm_topk_prob=False,
            first_k_dense_replace=1, moe_layer_freq=1,
            max_position_embeddings=1024, **common)
    elif family == "mixtral":
        cfg = tf.MixtralConfig(hidden_size=256, intermediate_size=512,
                               num_hidden_layers=2, num_attention_heads=2,
                               num_key_value_heads=1, num_local_experts=4,
                               num_experts_per_tok=2,
                               max_position_embeddings=1024, **common)
    elif family == "qwen2":
        cfg = tf.Qwen2Config(hidden_size=256, intermediate_size=512,
                             num_hidden_layers=2, num_attention_heads=2,
                             num_key_value_heads=1,
                             max_position_embeddings=1024, **common)
    elif family == "qwen2_moe":
        cfg = tf.Qwen2MoeConfig(hidden_size=256, intermediate_size=512,
                                moe_intermediate_size=128,
                                shared_expert_intermediate_size=256,
                                num_hidden_layers=2, num_attention_heads=2,
                                num_key_value_heads=1, num_experts=4,
                                num_experts_per_tok=2,
                                decoder_sparse_step=1, norm_topk_prob=False,
                                max_position_embeddings=1024, **common)
    elif family == "gemma":
        cfg = tf.GemmaConfig(hidden_size=256, intermediate_size=512,
                             num_hidden_layers=2, num_attention_heads=2,
                             num_key_value_heads=1, head_dim=128,
                             max_position_embeddings=1024, **common)
    elif family == "gemma2":
        cfg = tf.Gemma2Config(hidden_size=256, intermediate_size=512,
                              num_hidden_layers=2, num_attention_heads=2,
                              num_key_value_heads=1, head_dim=128,
                              attn_logit_softcapping=50.0,
                              final_logit_softcapping=30.0,
                              sliding_window=8, query_pre_attn_scalar=128,
                              max_position_embeddings=1024, **common)
    elif family == "phi3":
        # HF default pad/eos ids (32000+) exceed the tiny vocab.
        cfg = tf.Phi3Config(hidden_size=256, intermediate_size=512,
                            num_hidden_layers=2, num_attention_heads=2,
                            num_key_value_heads=1, pad_token_id=0,
                            bos_token_id=1, eos_token_id=2,
                            max_position_embeddings=1024, **common)
    elif family == "starcoder2":
        cfg = tf.Starcoder2Config(hidden_size=256, intermediate_size=512,
                                  num_hidden_layers=2,
                                  num_attention_heads=2,
                                  num_key_value_heads=1, use_bias=True,
                                  max_position_embeddings=1024, **common)
    elif family == "stablelm":
        cfg = tf.StableLmConfig(hidden_size=256, intermediate_size=512,
                                num_hidden_layers=2, num_attention_heads=2,
                                num_key_value_heads=1,
                                max_position_embeddings=1024, **common)
    elif family == "cohere":
        cfg = tf.CohereConfig(hidden_size=256, intermediate_size=512,
                              num_hidden_layers=2, num_attention_heads=2,
                              num_key_value_heads=2, logit_scale=0.5,
                              use_qk_norm=False,
                              max_position_embeddings=1024, **common)
    elif family == "olmo":
        cfg = tf.OlmoConfig(hidden_size=256, intermediate_size=512,
                            num_hidden_layers=2, num_attention_heads=2,
                            num_key_value_heads=2, clip_qkv=8.0,
                            max_position_embeddings=1024, **common)
    elif family == "phi":
        cfg = tf.PhiConfig(hidden_size=256, intermediate_size=512,
                           num_hidden_layers=2, num_attention_heads=2,
                           partial_rotary_factor=0.5,
                           max_position_embeddings=1024, **common)
    elif family == "mpt":
        cfg = tf.MptConfig(
            d_model=256, n_heads=2, n_layers=2, max_seq_len=1024,
            attn_config=tf.models.mpt.configuration_mpt.MptAttentionConfig(
                alibi=True, qk_ln=False),
            **common)
    elif family == "dbrx":
        cfg = tf.DbrxConfig(
            d_model=256, n_heads=2, n_layers=2, max_seq_len=1024,
            attn_config=tf.models.dbrx.configuration_dbrx.DbrxAttentionConfig(
                kv_n_heads=1, rope_theta=10000.0),
            ffn_config=tf.models.dbrx.configuration_dbrx.DbrxFFNConfig(
                ffn_hidden_size=256, moe_num_experts=4, moe_top_k=2),
            **common)
    elif family == "jamba":
        # Layer 0: mamba + MoE; layer 1: attention + dense MLP — covers
        # the conv/selective-scan prefill path, the hybrid cache, and
        # the per-layer MoE/dense alternation in one 2-layer model.
        cfg = tf.JambaConfig(hidden_size=256, intermediate_size=512,
                             num_hidden_layers=2, num_attention_heads=2,
                             num_key_value_heads=1,
                             attn_layer_offset=1, attn_layer_period=2,
                             expert_layer_offset=0, expert_layer_period=2,
                             num_experts=4, num_experts_per_tok=2,
                             mamba_d_state=16, mamba_d_conv=4,
                             mamba_expand=2, mamba_dt_rank=8,
                             max_position_embeddings=1024,
                             use_mamba_kernels=False, **common)
    elif family == "mistral_swa":
        # Sliding window SHORTER than the prompt so windowed prefill
        # attention actually masks (HF applies it during prefill too).
        cfg = tf.MistralConfig(hidden_size=256, intermediate_size=512,
                               num_hidden_layers=2, num_attention_heads=2,
                               num_key_value_heads=1, sliding_window=8,
                               max_position_embeddings=1024, **common)
    elif family == "gpt_bigcode":
        cfg = tf.GPTBigCodeConfig(n_embd=256, n_layer=2, n_head=2,
                                  n_positions=1024, multi_query=True,
                                  **common)
    else:
        raise ValueError(family)
    import torch
    from transformers import AutoModelForCausalLM
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfg)
    return model.float().eval()


def _hf_prompt_logprobs(model, prompt):
    import torch
    ids = torch.tensor([prompt])
    with torch.no_grad():
        logits = model(ids).logits[0].float()  # (T, V)
    logprobs = torch.log_softmax(logits, dim=-1)
    # Entry i: logprob of prompt[i] given prompt[:i].
    return [float(logprobs[i - 1, prompt[i]]) for i in range(1, len(prompt))]


@pytest.mark.parametrize("family", FAMILIES)
def test_prompt_logprob_parity(family, tmp_path):
    hf_model = _hf_tiny_model(family)
    golden = _hf_prompt_logprobs(hf_model, PROMPT)
    model_dir = tmp_path / family
    hf_model.save_pretrained(model_dir, safe_serialization=True)
    del hf_model

    from nmvllm_tpu import LLM, SamplingParams
    llm = LLM(model=str(model_dir), dtype="float32",
              num_gpu_blocks_override=64, max_num_seqs=4, max_model_len=128)
    out = llm.generate(
        prompt_token_ids=[PROMPT],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=1,
                                       prompt_logprobs=1))
    plp = out[0].prompt_logprobs
    assert plp is not None and plp[0] is None
    assert len(plp) == len(PROMPT)
    ours = [plp[i][PROMPT[i]].logprob for i in range(1, len(PROMPT))]
    np.testing.assert_allclose(ours, golden, atol=1e-2, rtol=0,
                               err_msg=f"{family}: prompt logprobs diverge "
                                       f"from HF golden")
