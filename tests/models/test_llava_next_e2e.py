"""LLaVA-NeXT e2e (reference tests/models/test_llava_next.py tier):
anyres grid + unpad + image_newline through the engine."""
import numpy as np
import pytest

from nmvllm_tpu import LLM, SamplingParams
from nmvllm_tpu.models.llava_next import (_unpad_amounts,
                                          llava_next_feature_size,
                                          select_best_resolution)

pytestmark = pytest.mark.e2e

IDS = [1, 2, 500, 3, 4]  # 500 = image_token_index in debug-llava-next


@pytest.fixture(scope="module")
def llm():
    return LLM(model="debug-llava-next", num_gpu_blocks_override=96,
               max_num_seqs=8, max_model_len=512)


def _gen(llm, img, max_tokens=5):
    return llm.generate(
        prompt_token_ids=[IDS],
        sampling_params=SamplingParams(temperature=0.0,
                                       max_tokens=max_tokens),
        multi_modal_data={"image": img})


def test_select_best_resolution():
    pins = [(64, 128), (128, 64), (128, 128)]
    assert select_best_resolution((64, 128), pins) == (64, 128)
    assert select_best_resolution((128, 64), pins) == (128, 64)
    assert select_best_resolution((100, 100), pins) == (128, 128)


def test_unpad_amounts():
    # Wide original in a square grid: rows cropped top/bottom.
    pad_h, pad_w = _unpad_amounts(64, 128, 8, 8)
    assert pad_h == 2 and pad_w == 0
    # Square original in a square grid: no crop.
    assert _unpad_amounts(100, 100, 8, 8) == (0, 0)


def test_image_conditions_output(llm):
    img1 = np.zeros((128, 128, 3), np.uint8)
    img2 = np.full((128, 128, 3), 255, np.uint8)
    t1 = _gen(llm, img1)[0].outputs[0].token_ids
    t2 = _gen(llm, img2)[0].outputs[0].token_ids
    t1b = _gen(llm, img1)[0].outputs[0].token_ids
    assert t1 == t1b
    assert t1 != t2


def test_anyres_token_expansion(llm):
    """Square 128px image -> (128,128) pinpoint -> 2x2 grid, no unpad;
    placeholder expands to base + grid + one newline per row
    (reference get_llava_next_image_feature_size:96)."""
    out = _gen(llm, np.zeros((128, 128, 3), np.uint8))
    # debug tower: 64px crops, 16px patches -> ps=4; hc=wc=2, pad=0.
    expected = llava_next_feature_size(4, 2, 2, 0, 0)
    assert expected == 16 + 8 * 9
    assert len(out[0].prompt_token_ids) == len(IDS) - 1 + expected


def test_wide_image_unpads(llm):
    """2:1 image -> (64,128) pinpoint -> 1x2 grid, zero unpad (aspect
    matches); its own compiled variant."""
    out = _gen(llm, np.zeros((64, 128, 3), np.uint8))
    expected = llava_next_feature_size(4, 1, 2, 0, 0)
    assert len(out[0].prompt_token_ids) == len(IDS) - 1 + expected
    assert len(out[0].outputs[0].token_ids) == 5


def test_nonmatching_aspect_unpads(llm):
    """4:1 image in the (64,128) grid: feature rows are cropped."""
    pad_h, pad_w = _unpad_amounts(32, 128, 4, 8)
    assert (pad_h, pad_w) == (1, 0)
    out = _gen(llm, np.zeros((32, 128, 3), np.uint8))
    expected = llava_next_feature_size(4, 1, 2, pad_h, pad_w)
    assert len(out[0].prompt_token_ids) == len(IDS) - 1 + expected
