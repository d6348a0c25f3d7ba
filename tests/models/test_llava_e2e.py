"""LLaVA vision-language e2e (reference tests/models/test_llava.py tier:
image-conditioned generation through the engine)."""
import numpy as np
import pytest

from nmvllm_tpu import LLM, SamplingParams

pytestmark = pytest.mark.e2e

IDS = [1, 2, 500, 3, 4]  # 500 = image_token_index in debug-llava


@pytest.fixture(scope="module")
def llm():
    return LLM(model="debug-llava", num_gpu_blocks_override=96,
               max_num_seqs=8, max_model_len=256)


def _gen(llm, img, max_tokens=6):
    return llm.generate(
        prompt_token_ids=[IDS],
        sampling_params=SamplingParams(temperature=0.0,
                                       max_tokens=max_tokens),
        multi_modal_data={"image": img})


def test_image_conditions_output(llm):
    img1 = np.zeros((64, 64, 3), np.uint8)
    img2 = np.full((64, 64, 3), 255, np.uint8)
    t1 = _gen(llm, img1)[0].outputs[0].token_ids
    t2 = _gen(llm, img2)[0].outputs[0].token_ids
    t1b = _gen(llm, img1)[0].outputs[0].token_ids
    assert t1 == t1b
    assert t1 != t2


def test_image_token_expansion(llm):
    out = _gen(llm, np.zeros((64, 64, 3), np.uint8))
    # 64px / 16px patches -> 4x4 = 16 image tokens replacing one.
    assert len(out[0].prompt_token_ids) == len(IDS) - 1 + 16


def test_text_only_model_rejects_images():
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256)
    with pytest.raises(ValueError):
        llm.generate(prompt_token_ids=[[1, 2, 3]],
                     sampling_params=SamplingParams(max_tokens=2),
                     multi_modal_data={"image": np.zeros((8, 8, 3))})
