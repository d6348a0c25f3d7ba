"""Phi-3-Vision e2e (reference tests/models/test_phi3v.py tier):
HD-transform image embedding through the engine."""
import numpy as np
import pytest

from nmvllm_tpu import LLM, SamplingParams
from nmvllm_tpu.models.phi3v import phi3v_feature_size

pytestmark = pytest.mark.e2e

IDS = [1, 2, 500, 3, 4]  # 500 = image_token_id in debug-phi3v


@pytest.fixture(scope="module")
def llm():
    return LLM(model="debug-phi3v", num_gpu_blocks_override=96,
               max_num_seqs=8, max_model_len=256)


def _gen(llm, img, max_tokens=5):
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


def test_hd_transform_token_expansion(llm):
    """Square image -> 2x2 crop grid at num_crops=4; the placeholder
    expands to the HD-transform feature size (reference
    get_phi3v_image_feature_size:314)."""
    out = _gen(llm, np.zeros((64, 64, 3), np.uint8))
    # debug tower: 32px crops, 8px patches -> ps_half=2; square -> hc=wc=2.
    expected = phi3v_feature_size(2, 2, 2)
    assert len(out[0].prompt_token_ids) == len(IDS) - 1 + expected


def test_wide_image_grid(llm):
    """A 2:1 aspect image maps to a wider crop grid with its own token
    count and compiled variant."""
    out = _gen(llm, np.zeros((32, 128, 3), np.uint8))
    assert len(out[0].outputs[0].token_ids) == 5
