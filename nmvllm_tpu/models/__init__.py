"""Model registry (reference: vllm/model_executor/models/__init__.py:94
ModelRegistry). Maps HF `architectures[0]` strings to model classes."""
from typing import Any, Dict, List, Optional, Type

_GENERATION_MODELS: Dict[str, str] = {
    "LlamaForCausalLM": "nmvllm_tpu.models.llama:LlamaForCausalLM",
    "LLaMAForCausalLM": "nmvllm_tpu.models.llama:LlamaForCausalLM",
    "MistralForCausalLM": "nmvllm_tpu.models.llama:LlamaForCausalLM",
    "AquilaModel": "nmvllm_tpu.models.llama:LlamaForCausalLM",
    "AquilaForCausalLM": "nmvllm_tpu.models.llama:LlamaForCausalLM",
    "InternLMForCausalLM": "nmvllm_tpu.models.llama:LlamaForCausalLM",
    "XverseForCausalLM": "nmvllm_tpu.models.llama:LlamaForCausalLM",
    "DeciLMForCausalLM": "nmvllm_tpu.models.decilm:DeciLMForCausalLM",
    "OrionForCausalLM": "nmvllm_tpu.models.orion:OrionForCausalLM",
    "MiniCPMForCausalLM": "nmvllm_tpu.models.minicpm:MiniCPMForCausalLM",
    "QWenLMHeadModel": "nmvllm_tpu.models.qwen:QWenLMHeadModel",
    "JAISLMHeadModel": "nmvllm_tpu.models.jais:JAISLMHeadModel",
    "GPTJForCausalLM": "nmvllm_tpu.models.gpt_family:GPTJForCausalLM",
    "Qwen2ForCausalLM": "nmvllm_tpu.models.qwen2:Qwen2ForCausalLM",
    "GemmaForCausalLM": "nmvllm_tpu.models.gemma:GemmaForCausalLM",
    "MixtralForCausalLM": "nmvllm_tpu.models.mixtral:MixtralForCausalLM",
    "Phi3ForCausalLM": "nmvllm_tpu.models.phi3:Phi3ForCausalLM",
    "Gemma2ForCausalLM": "nmvllm_tpu.models.gemma2:Gemma2ForCausalLM",
    "Starcoder2ForCausalLM":
        "nmvllm_tpu.models.starcoder2:Starcoder2ForCausalLM",
    "StableLmForCausalLM": "nmvllm_tpu.models.stablelm:StableLmForCausalLM",
    "StableLMEpochForCausalLM":
        "nmvllm_tpu.models.stablelm:StableLmForCausalLM",
    "OlmoForCausalLM": "nmvllm_tpu.models.olmo:OlmoForCausalLM",
    "InternLM2ForCausalLM":
        "nmvllm_tpu.models.internlm2:InternLM2ForCausalLM",
    "BaichuanForCausalLM": "nmvllm_tpu.models.baichuan:BaichuanForCausalLM",
    "BaiChuanForCausalLM": "nmvllm_tpu.models.baichuan:BaichuanForCausalLM",
    "CohereForCausalLM": "nmvllm_tpu.models.cohere:CohereForCausalLM",
    "GPT2LMHeadModel": "nmvllm_tpu.models.gpt_family:GPT2LMHeadModel",
    "OPTForCausalLM": "nmvllm_tpu.models.gpt_family:OPTForCausalLM",
    "GPTBigCodeForCausalLM":
        "nmvllm_tpu.models.gpt_family:GPTBigCodeForCausalLM",
    "GPTNeoXForCausalLM": "nmvllm_tpu.models.gpt_family:GPTNeoXForCausalLM",
    "PhiForCausalLM": "nmvllm_tpu.models.gpt_family:PhiForCausalLM",
    "FalconForCausalLM": "nmvllm_tpu.models.gpt_family:FalconForCausalLM",
    "RWForCausalLM": "nmvllm_tpu.models.gpt_family:FalconForCausalLM",
    "BloomForCausalLM": "nmvllm_tpu.models.gpt_family:BloomForCausalLM",
    "MPTForCausalLM": "nmvllm_tpu.models.gpt_family:MPTForCausalLM",
    "MptForCausalLM": "nmvllm_tpu.models.gpt_family:MPTForCausalLM",
    "Qwen2MoeForCausalLM":
        "nmvllm_tpu.models.qwen2_moe:Qwen2MoeForCausalLM",
    "DeepseekForCausalLM": "nmvllm_tpu.models.deepseek:DeepseekForCausalLM",
    "DeepseekV2ForCausalLM":
        "nmvllm_tpu.models.deepseek_v2:DeepseekV2ForCausalLM",
    "ChatGLMModel": "nmvllm_tpu.models.chatglm:ChatGLMForCausalLM",
    "DbrxForCausalLM": "nmvllm_tpu.models.dbrx:DbrxForCausalLM",
    "LlavaForConditionalGeneration":
        "nmvllm_tpu.models.llava:LlavaForConditionalGeneration",
    "LlavaNextForConditionalGeneration":
        "nmvllm_tpu.models.llava_next:LlavaNextForConditionalGeneration",
    "ChatGLMForConditionalGeneration":
        "nmvllm_tpu.models.chatglm:ChatGLMForCausalLM",
    "ChatGLMForCausalLM": "nmvllm_tpu.models.chatglm:ChatGLMForCausalLM",
    "StablelmForCausalLM": "nmvllm_tpu.models.stablelm:StableLmForCausalLM",
    "QuantMixtralForCausalLM":
        "nmvllm_tpu.models.mixtral:MixtralForCausalLM",
    "ArcticForCausalLM": "nmvllm_tpu.models.arctic:ArcticForCausalLM",
    "JambaForCausalLM": "nmvllm_tpu.models.jamba:JambaForCausalLM",
    "MLPSpeculatorPreTrainedModel":
        "nmvllm_tpu.models.mlp_speculator:MLPSpeculator",
    "Phi3SmallForCausalLM":
        "nmvllm_tpu.models.phi3_small:Phi3SmallForCausalLM",
    "Phi3VForCausalLM": "nmvllm_tpu.models.phi3v:Phi3VForCausalLM",
}

_EMBEDDING_MODELS: Dict[str, str] = {
    "LlamaModel": "nmvllm_tpu.models.llama_embedding:LlamaEmbeddingModel",
    "MistralModel": "nmvllm_tpu.models.llama_embedding:LlamaEmbeddingModel",
}

_OOT_MODELS: Dict[str, Type] = {}


class ModelRegistry:

    @staticmethod
    def load_model_cls(arch: str) -> Optional[Type]:
        if arch in _OOT_MODELS:
            return _OOT_MODELS[arch]
        table = (_GENERATION_MODELS if arch in _GENERATION_MODELS
                 else _EMBEDDING_MODELS)
        if arch not in table:
            return None
        module_name, cls_name = table[arch].split(":")
        import importlib
        mod = importlib.import_module(module_name)
        return getattr(mod, cls_name)

    @staticmethod
    def get_supported_archs() -> List[str]:
        return (list(_GENERATION_MODELS) + list(_EMBEDDING_MODELS) +
                list(_OOT_MODELS))

    @staticmethod
    def register_model(arch: str, model_cls: Type) -> None:
        _OOT_MODELS[arch] = model_cls


def resolve_model_cls(architectures: List[str]) -> Type:
    for arch in architectures:
        cls = ModelRegistry.load_model_cls(arch)
        if cls is not None:
            return cls
    raise ValueError(
        f"Model architectures {architectures} are not supported. "
        f"Supported: {ModelRegistry.get_supported_archs()}")
