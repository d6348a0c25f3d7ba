"""Model-config resolution (reference: vllm/transformers_utils/config.py).

Resolution order for ``get_hf_config(model)``:
  1. built-in presets (offline-friendly named architectures, incl. debug-sized
     models used by tests and benchmarks),
  2. a local directory containing ``config.json``,
  3. ``transformers.AutoConfig`` (hits the HF hub only if the environment
     allows network access).
"""
import json
import os
from typing import Any, Callable, Dict, Optional

_PRESETS: Dict[str, Callable[[], Any]] = {}


def register_preset(name: str):
    def deco(fn):
        _PRESETS[name.lower()] = fn
        return fn
    return deco


def _llama_config(**kw):
    from transformers import LlamaConfig
    defaults = dict(architectures=["LlamaForCausalLM"])
    defaults.update(kw)
    return LlamaConfig(**defaults)


@register_preset("debug-llama")
def _debug_llama():
    # Tiny model for tests: exercises GQA; head_dim=128 keeps the Pallas
    # paged-attention fast path (lane-aligned pages).
    return _llama_config(hidden_size=256, intermediate_size=512,
                         num_hidden_layers=2, num_attention_heads=2,
                         num_key_value_heads=1, vocab_size=512,
                         max_position_embeddings=2048, head_dim=128)


@register_preset("debug-llama-embed")
def _debug_llama_embed():
    cfg = _llama_config(hidden_size=256, intermediate_size=512,
                        num_hidden_layers=2, num_attention_heads=2,
                        num_key_value_heads=1, vocab_size=512,
                        max_position_embeddings=2048, head_dim=128)
    cfg.architectures = ["LlamaModel"]
    return cfg


@register_preset("debug-llama-tp")
def _debug_llama_tp():
    # Tiny model shaped for 8-way tensor parallel dry runs.
    return _llama_config(hidden_size=1024, intermediate_size=1024,
                         num_hidden_layers=2, num_attention_heads=8,
                         num_key_value_heads=8, vocab_size=512,
                         max_position_embeddings=2048, head_dim=128)


@register_preset("tinyllama-1.1b")
def _tinyllama():
    # TinyLlama/TinyLlama-1.1B-Chat-v1.0 geometry.
    return _llama_config(hidden_size=2048, intermediate_size=5632,
                         num_hidden_layers=22, num_attention_heads=32,
                         num_key_value_heads=4, vocab_size=32000,
                         max_position_embeddings=2048, rope_theta=10000.0)


@register_preset("llama-3-8b")
def _llama3_8b():
    # Meta-Llama-3-8B geometry (the BASELINE.json flagship config).
    return _llama_config(hidden_size=4096, intermediate_size=14336,
                         num_hidden_layers=32, num_attention_heads=32,
                         num_key_value_heads=8, vocab_size=128256,
                         max_position_embeddings=8192, rope_theta=500000.0)


@register_preset("llama-2-7b")
def _llama2_7b():
    return _llama_config(hidden_size=4096, intermediate_size=11008,
                         num_hidden_layers=32, num_attention_heads=32,
                         num_key_value_heads=32, vocab_size=32000,
                         max_position_embeddings=4096, rope_theta=10000.0)


@register_preset("llama-3-70b")
def _llama3_70b():
    return _llama_config(hidden_size=8192, intermediate_size=28672,
                         num_hidden_layers=80, num_attention_heads=64,
                         num_key_value_heads=8, vocab_size=128256,
                         max_position_embeddings=8192, rope_theta=500000.0)


@register_preset("debug-mixtral")
def _debug_mixtral():
    from transformers import MixtralConfig
    return MixtralConfig(architectures=["MixtralForCausalLM"],
                         hidden_size=256, intermediate_size=256,
                         num_hidden_layers=2, num_attention_heads=2,
                         num_key_value_heads=2, vocab_size=512,
                         num_local_experts=4, num_experts_per_tok=2,
                         max_position_embeddings=2048)


@register_preset("debug-phi3v")
def _debug_phi3v():
    from types import SimpleNamespace
    from transformers import Phi3Config
    cfg = Phi3Config(architectures=["Phi3VForCausalLM"],
                     hidden_size=256, intermediate_size=512,
                     num_hidden_layers=2, num_attention_heads=2,
                     num_key_value_heads=1, vocab_size=512,
                     max_position_embeddings=2048)
    cfg.image_token_id = 500
    cfg.num_crops = 4
    cfg.vision_config = SimpleNamespace(
        hidden_size=64, intermediate_size=128, num_attention_heads=2,
        num_hidden_layers=2, image_size=32, patch_size=8,
        layer_norm_eps=1e-5)
    return cfg


@register_preset("debug-jamba")
def _debug_jamba():
    from transformers import JambaConfig
    return JambaConfig(architectures=["JambaForCausalLM"],
                       hidden_size=128, intermediate_size=256,
                       num_hidden_layers=4, num_attention_heads=2,
                       num_key_value_heads=1, vocab_size=512,
                       attn_layer_offset=1, attn_layer_period=2,
                       expert_layer_offset=1, expert_layer_period=2,
                       num_experts=4, num_experts_per_tok=2,
                       mamba_d_state=16, mamba_d_conv=4, mamba_expand=2,
                       mamba_dt_rank=8, max_position_embeddings=2048,
                       use_mamba_kernels=False)


@register_preset("mixtral-8x7b")
def _mixtral_8x7b():
    from transformers import MixtralConfig
    return MixtralConfig(architectures=["MixtralForCausalLM"],
                         hidden_size=4096, intermediate_size=14336,
                         num_hidden_layers=32, num_attention_heads=32,
                         num_key_value_heads=8, vocab_size=32000,
                         num_local_experts=8, num_experts_per_tok=2,
                         max_position_embeddings=32768, rope_theta=1e6)


@register_preset("debug-qwen2")
def _debug_qwen2():
    from transformers import Qwen2Config
    return Qwen2Config(architectures=["Qwen2ForCausalLM"],
                       hidden_size=256, intermediate_size=256,
                       num_hidden_layers=2, num_attention_heads=2,
                       num_key_value_heads=1, vocab_size=512,
                       max_position_embeddings=2048)


@register_preset("qwen2-7b")
def _qwen2_7b():
    from transformers import Qwen2Config
    return Qwen2Config(architectures=["Qwen2ForCausalLM"],
                       hidden_size=3584, intermediate_size=18944,
                       num_hidden_layers=28, num_attention_heads=28,
                       num_key_value_heads=4, vocab_size=152064,
                       max_position_embeddings=32768, rope_theta=1e6)


@register_preset("debug-gemma")
def _debug_gemma():
    from transformers import GemmaConfig
    return GemmaConfig(architectures=["GemmaForCausalLM"],
                       hidden_size=256, intermediate_size=256,
                       num_hidden_layers=2, num_attention_heads=2,
                       num_key_value_heads=1, head_dim=128, vocab_size=512,
                       max_position_embeddings=2048)


@register_preset("gemma-7b")
def _gemma_7b():
    from transformers import GemmaConfig
    return GemmaConfig(architectures=["GemmaForCausalLM"],
                       hidden_size=3072, intermediate_size=24576,
                       num_hidden_layers=28, num_attention_heads=16,
                       num_key_value_heads=16, head_dim=256,
                       vocab_size=256000, max_position_embeddings=8192)


@register_preset("debug-mistral")
def _debug_mistral():
    from transformers import MistralConfig
    return MistralConfig(architectures=["MistralForCausalLM"],
                         hidden_size=256, intermediate_size=256,
                         num_hidden_layers=2, num_attention_heads=2,
                         num_key_value_heads=1, vocab_size=512,
                         sliding_window=64, max_position_embeddings=2048)


@register_preset("mistral-7b")
def _mistral_7b():
    from transformers import MistralConfig
    return MistralConfig(architectures=["MistralForCausalLM"],
                         hidden_size=4096, intermediate_size=14336,
                         num_hidden_layers=32, num_attention_heads=32,
                         num_key_value_heads=8, vocab_size=32768,
                         sliding_window=4096, max_position_embeddings=32768)


@register_preset("debug-gemma2")
def _debug_gemma2():
    from transformers import Gemma2Config
    return Gemma2Config(architectures=["Gemma2ForCausalLM"],
                        hidden_size=256, intermediate_size=256,
                        num_hidden_layers=2, num_attention_heads=2,
                        num_key_value_heads=1, head_dim=128, vocab_size=512,
                        max_position_embeddings=2048, sliding_window=64,
                        query_pre_attn_scalar=128,
                        attn_logit_softcapping=50.0,
                        final_logit_softcapping=30.0)


@register_preset("gemma-2-9b")
def _gemma2_9b():
    from transformers import Gemma2Config
    return Gemma2Config(architectures=["Gemma2ForCausalLM"],
                        hidden_size=3584, intermediate_size=14336,
                        num_hidden_layers=42, num_attention_heads=16,
                        num_key_value_heads=8, head_dim=256,
                        vocab_size=256000, max_position_embeddings=8192,
                        sliding_window=4096, query_pre_attn_scalar=256,
                        attn_logit_softcapping=50.0,
                        final_logit_softcapping=30.0)


@register_preset("debug-starcoder2")
def _debug_starcoder2():
    from transformers import Starcoder2Config
    return Starcoder2Config(architectures=["Starcoder2ForCausalLM"],
                            hidden_size=256, intermediate_size=256,
                            num_hidden_layers=2, num_attention_heads=2,
                            num_key_value_heads=1, vocab_size=512,
                            max_position_embeddings=2048, use_bias=True,
                            tie_word_embeddings=True)


@register_preset("debug-stablelm")
def _debug_stablelm():
    from transformers import StableLmConfig
    return StableLmConfig(architectures=["StableLmForCausalLM"],
                          hidden_size=256, intermediate_size=256,
                          num_hidden_layers=2, num_attention_heads=2,
                          num_key_value_heads=1, vocab_size=512,
                          max_position_embeddings=2048,
                          partial_rotary_factor=0.25, use_qkv_bias=True)


@register_preset("debug-olmo")
def _debug_olmo():
    from transformers import OlmoConfig
    return OlmoConfig(architectures=["OlmoForCausalLM"],
                      hidden_size=256, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=2,
                      num_key_value_heads=2, vocab_size=512,
                      max_position_embeddings=2048, clip_qkv=8.0)


@register_preset("debug-internlm2")
def _debug_internlm2():
    # InternLM2 configs need trust_remote_code on the hub; llama geometry
    # with the internlm2 architecture tag is enough for the offline preset.
    cfg = _llama_config(hidden_size=256, intermediate_size=256,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, vocab_size=512,
                        max_position_embeddings=2048)
    cfg.architectures = ["InternLM2ForCausalLM"]
    return cfg


@register_preset("debug-baichuan")
def _debug_baichuan():
    cfg = _llama_config(hidden_size=256, intermediate_size=256,
                        num_hidden_layers=2, num_attention_heads=2,
                        num_key_value_heads=2, vocab_size=512,
                        max_position_embeddings=2048)
    cfg.architectures = ["BaichuanForCausalLM"]
    return cfg


@register_preset("debug-cohere")
def _debug_cohere():
    from transformers import CohereConfig
    return CohereConfig(architectures=["CohereForCausalLM"],
                        hidden_size=256, intermediate_size=256,
                        num_hidden_layers=2, num_attention_heads=2,
                        num_key_value_heads=1, vocab_size=512,
                        max_position_embeddings=2048, logit_scale=0.0625)


@register_preset("debug-gpt2")
def _debug_gpt2():
    from transformers import GPT2Config
    return GPT2Config(architectures=["GPT2LMHeadModel"], n_embd=256,
                      n_layer=2, n_head=2, n_positions=1024,
                      vocab_size=512)


@register_preset("debug-opt")
def _debug_opt():
    from transformers import OPTConfig
    return OPTConfig(architectures=["OPTForCausalLM"], hidden_size=256,
                     num_hidden_layers=2, num_attention_heads=2,
                     ffn_dim=512, max_position_embeddings=1024,
                     vocab_size=512, word_embed_proj_dim=256)


@register_preset("debug-bigcode")
def _debug_bigcode():
    from transformers import GPTBigCodeConfig
    return GPTBigCodeConfig(architectures=["GPTBigCodeForCausalLM"],
                            n_embd=256, n_layer=2, n_head=2,
                            n_positions=1024, vocab_size=512,
                            multi_query=True)


@register_preset("debug-gptneox")
def _debug_gptneox():
    from transformers import GPTNeoXConfig
    return GPTNeoXConfig(architectures=["GPTNeoXForCausalLM"],
                         hidden_size=256, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=512,
                         max_position_embeddings=1024, vocab_size=512,
                         rotary_pct=0.5, use_parallel_residual=True)


@register_preset("debug-phi")
def _debug_phi():
    from transformers import PhiConfig
    return PhiConfig(architectures=["PhiForCausalLM"], hidden_size=256,
                     num_hidden_layers=2, num_attention_heads=2,
                     intermediate_size=512, max_position_embeddings=1024,
                     vocab_size=512, partial_rotary_factor=0.5)


@register_preset("debug-falcon")
def _debug_falcon():
    from transformers import FalconConfig
    return FalconConfig(architectures=["FalconForCausalLM"],
                        hidden_size=256, num_hidden_layers=2,
                        num_attention_heads=2, vocab_size=512,
                        multi_query=True, parallel_attn=True, bias=False,
                        max_position_embeddings=1024)


@register_preset("debug-bloom")
def _debug_bloom():
    from transformers import BloomConfig
    return BloomConfig(architectures=["BloomForCausalLM"], hidden_size=256,
                       n_layer=2, n_head=2, vocab_size=512)


@register_preset("debug-mpt")
def _debug_mpt():
    from transformers import MptConfig
    return MptConfig(architectures=["MptForCausalLM"], d_model=256,
                     n_layers=2, n_heads=2, max_seq_len=1024,
                     vocab_size=512, expansion_ratio=2)


@register_preset("debug-qwen2moe")
def _debug_qwen2moe():
    from transformers import Qwen2MoeConfig
    return Qwen2MoeConfig(architectures=["Qwen2MoeForCausalLM"],
                          hidden_size=256, intermediate_size=256,
                          moe_intermediate_size=128,
                          shared_expert_intermediate_size=256,
                          num_hidden_layers=2, num_attention_heads=2,
                          num_key_value_heads=1, vocab_size=512,
                          num_experts=4, num_experts_per_tok=2,
                          decoder_sparse_step=1,
                          max_position_embeddings=2048)


@register_preset("debug-deepseek")
def _debug_deepseek():
    cfg = _llama_config(hidden_size=256, intermediate_size=256,
                        num_hidden_layers=2, num_attention_heads=2,
                        num_key_value_heads=2, vocab_size=512,
                        max_position_embeddings=2048)
    cfg.architectures = ["DeepseekForCausalLM"]
    cfg.n_routed_experts = 4
    cfg.num_experts_per_tok = 2
    cfg.moe_intermediate_size = 128
    cfg.n_shared_experts = 2
    cfg.first_k_dense_replace = 1
    cfg.moe_layer_freq = 1
    cfg.norm_topk_prob = False
    return cfg


@register_preset("debug-chatglm")
def _debug_chatglm():
    cfg = _llama_config(hidden_size=256, num_hidden_layers=2,
                        num_attention_heads=2, vocab_size=512,
                        max_position_embeddings=2048)
    cfg.architectures = ["ChatGLMModel"]
    cfg.ffn_hidden_size = 256
    cfg.kv_channels = 128
    cfg.multi_query_attention = True
    cfg.multi_query_group_num = 1
    cfg.add_qkv_bias = True
    cfg.add_bias_linear = False
    cfg.layernorm_epsilon = 1e-5
    cfg.rope_ratio = 1.0
    return cfg


@register_preset("debug-dbrx")
def _debug_dbrx():
    from transformers import DbrxConfig
    return DbrxConfig(architectures=["DbrxForCausalLM"], d_model=256,
                      n_heads=2, n_layers=2, max_seq_len=2048,
                      vocab_size=512,
                      attn_config={"kv_n_heads": 1, "clip_qkv": 8.0,
                                   "rope_theta": 10000.0},
                      ffn_config={"ffn_hidden_size": 128,
                                  "moe_num_experts": 4, "moe_top_k": 2})


@register_preset("debug-llava")
def _debug_llava():
    from transformers import CLIPVisionConfig, LlavaConfig
    text = _llama_config(hidden_size=256, intermediate_size=512,
                         num_hidden_layers=2, num_attention_heads=2,
                         num_key_value_heads=1, vocab_size=512,
                         max_position_embeddings=2048, head_dim=128)
    vision = CLIPVisionConfig(hidden_size=64, intermediate_size=128,
                              num_hidden_layers=2, num_attention_heads=2,
                              image_size=64, patch_size=16)
    cfg = LlavaConfig(architectures=["LlavaForConditionalGeneration"],
                      text_config=text.to_dict(),
                      vision_config=vision.to_dict(),
                      image_token_index=500)
    return cfg


@register_preset("debug-llava-next")
def _debug_llava_next():
    from transformers import CLIPVisionConfig, LlavaNextConfig
    text = _llama_config(hidden_size=256, intermediate_size=512,
                         num_hidden_layers=2, num_attention_heads=2,
                         num_key_value_heads=1, vocab_size=512,
                         max_position_embeddings=2048, head_dim=128)
    vision = CLIPVisionConfig(hidden_size=64, intermediate_size=128,
                              num_hidden_layers=2, num_attention_heads=2,
                              image_size=64, patch_size=16)
    cfg = LlavaNextConfig(
        architectures=["LlavaNextForConditionalGeneration"],
        text_config=text.to_dict(), vision_config=vision.to_dict(),
        image_token_index=500,
        image_grid_pinpoints=[[64, 128], [128, 64], [128, 128]])
    return cfg


@register_preset("debug-mlp-speculator")
def _debug_mlp_speculator():
    from transformers import PretrainedConfig
    cfg = PretrainedConfig(
        architectures=["MLPSpeculatorPreTrainedModel"],
        model_type="mlp_speculator")
    cfg.emb_dim = 256            # target debug-llama hidden size
    cfg.inner_dim = 64
    cfg.vocab_size = 512
    cfg.n_predict = 3
    cfg.num_lookahead_tokens = 3
    cfg.tie_weights = False
    cfg.scale_input = True
    return cfg


@register_preset("debug-phi3-small")
def _debug_phi3_small():
    from transformers import PretrainedConfig
    cfg = PretrainedConfig(
        architectures=["Phi3SmallForCausalLM"], model_type="phi3small")
    cfg.hidden_size = 256
    cfg.intermediate_size = 512
    cfg.num_hidden_layers = 4
    cfg.num_attention_heads = 2
    cfg.num_key_value_heads = 1
    cfg.vocab_size = 512
    cfg.max_position_embeddings = 2048
    cfg.hidden_act = "gegelu"
    cfg.gegelu_limit = 20.0
    cfg.layer_norm_epsilon = 1e-5
    cfg.rope_embedding_base = 10000.0
    cfg.rope_position_scale = 1.0
    cfg.mup_use_scaling = True
    cfg.mup_attn_multiplier = 1.0
    cfg.mup_embedding_multiplier = 10.0
    cfg.mup_width_multiplier = 8.0
    cfg.blocksparse_block_size = 16
    cfg.blocksparse_num_local_blocks = 2
    cfg.blocksparse_vert_stride = 4
    cfg.blocksparse_homo_head_pattern = False
    cfg.dense_attention_every_n_layers = 2
    cfg.dummy_token_indices = [510, 511]
    cfg.tie_word_embeddings = True
    return cfg


@register_preset("debug-phi3")
def _debug_phi3():
    from transformers import Phi3Config
    return Phi3Config(architectures=["Phi3ForCausalLM"],
                      hidden_size=256, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=2,
                      num_key_value_heads=1, vocab_size=512,
                      max_position_embeddings=2048)


@register_preset("debug-gptj")
def _debug_gptj():
    from transformers import GPTJConfig
    return GPTJConfig(architectures=["GPTJForCausalLM"], n_embd=256,
                      n_layer=2, n_head=2, n_positions=1024,
                      rotary_dim=64, vocab_size=512)


@register_preset("debug-orion")
def _debug_orion():
    cfg = _llama_config(hidden_size=256, intermediate_size=512,
                        num_hidden_layers=2, num_attention_heads=2,
                        num_key_value_heads=2, vocab_size=512,
                        max_position_embeddings=1024)
    cfg.architectures = ["OrionForCausalLM"]
    return cfg


@register_preset("debug-decilm")
def _debug_decilm():
    cfg = _llama_config(hidden_size=256, intermediate_size=512,
                        num_hidden_layers=4, num_attention_heads=4,
                        vocab_size=512, max_position_embeddings=1024)
    cfg.num_key_value_heads_per_layer = [1, 2, 4, 2]
    cfg.architectures = ["DeciLMForCausalLM"]
    return cfg


@register_preset("debug-qwen")
def _debug_qwen():
    from transformers import PretrainedConfig
    return PretrainedConfig(architectures=["QWenLMHeadModel"],
                            hidden_size=256, intermediate_size=1024,
                            num_hidden_layers=2, num_attention_heads=2,
                            vocab_size=512, seq_length=1024,
                            layer_norm_epsilon=1e-6,
                            rotary_emb_base=10000)


@register_preset("debug-jais")
def _debug_jais():
    from transformers import PretrainedConfig
    return PretrainedConfig(architectures=["JAISLMHeadModel"],
                            hidden_size=256, n_inner=512, n_layer=2,
                            num_hidden_layers=2, num_attention_heads=2,
                            n_head=2, vocab_size=512, n_positions=1024,
                            layer_norm_epsilon=1e-5,
                            activation_function="swiglu",
                            position_embedding_type="alibi",
                            mup_embeddings_scale=9.17,
                            mup_output_alpha=1.09, mup_width_scale=0.25,
                            scale_qk_dot_by_d=True)


@register_preset("debug-minicpm")
def _debug_minicpm():
    cfg = _llama_config(hidden_size=256, intermediate_size=512,
                        num_hidden_layers=2, num_attention_heads=2,
                        num_key_value_heads=2, vocab_size=512,
                        max_position_embeddings=1024)
    cfg.architectures = ["MiniCPMForCausalLM"]
    cfg.scale_emb = 12.0
    cfg.scale_depth = 1.4
    cfg.dim_model_base = 256
    return cfg


@register_preset("debug-deepseek-v2")
def _debug_deepseek_v2():
    from transformers import PretrainedConfig
    return PretrainedConfig(
        architectures=["DeepseekV2ForCausalLM"],
        hidden_size=256, intermediate_size=512, moe_intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=2, vocab_size=512,
        max_position_embeddings=1024, rms_norm_eps=1e-6,
        qk_nope_head_dim=64, qk_rope_head_dim=32, v_head_dim=64,
        q_lora_rank=96, kv_lora_rank=128,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        n_group=2, topk_group=1, routed_scaling_factor=1.0,
        norm_topk_prob=False, first_k_dense_replace=1, moe_layer_freq=1,
        rope_scaling={"type": "yarn", "factor": 2.0,
                      "original_max_position_embeddings": 512,
                      "beta_fast": 32, "beta_slow": 1,
                      "mscale": 0.707, "mscale_all_dim": 0.707},
        hidden_act="silu")


@register_preset("debug-arctic")
def _debug_arctic():
    # Layer 0 dense, layer 1 MoE with parallel residual MLP
    # (moe_layer_frequency=2, use_residual — reference arctic.py:301-302).
    cfg = _llama_config(hidden_size=256, intermediate_size=512,
                        num_hidden_layers=2, num_attention_heads=2,
                        num_key_value_heads=1, vocab_size=512,
                        max_position_embeddings=2048, head_dim=128)
    cfg.architectures = ["ArcticForCausalLM"]
    cfg.num_local_experts = 4
    cfg.num_experts_per_tok = 2
    cfg.moe_layer_frequency = 2
    cfg.use_residual = True
    return cfg


def list_presets():
    return sorted(_PRESETS)


def get_hf_config(model: str, trust_remote_code: bool = False,
                  revision: Optional[str] = None) -> Any:
    key = model.lower()
    if key in _PRESETS:
        return _PRESETS[key]()
    if os.path.isdir(model) and os.path.exists(
            os.path.join(model, "config.json")):
        from transformers import AutoConfig
        return AutoConfig.from_pretrained(
            model, trust_remote_code=trust_remote_code)
    from transformers import AutoConfig
    return AutoConfig.from_pretrained(model,
                                      trust_remote_code=trust_remote_code,
                                      revision=revision)


def get_quantization_config_dict(model: str) -> Optional[Dict[str, Any]]:
    """Read quantization_config from a local checkpoint's config.json."""
    path = os.path.join(model, "config.json")
    if os.path.isdir(model) and os.path.exists(path):
        with open(path) as f:
            cfg = json.load(f)
        return cfg.get("quantization_config")
    return None
