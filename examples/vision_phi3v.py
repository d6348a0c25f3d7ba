"""Phi-3-Vision offline inference: image-conditioned generation.

The HD transform (global crop + sub-crop grid + learnable separators)
runs in the image mapper + model (models/phi3v.py); the placeholder token
expands to the per-image feature count at admission. Swap `debug-phi3v`
for a local `microsoft/Phi-3-vision-128k-instruct` checkpoint directory
(the placeholder id is the checkpoint's image token).
"""
import numpy as np

from nmvllm_tpu import LLM, SamplingParams

llm = LLM(model="debug-phi3v", max_model_len=512, max_num_seqs=4,
          num_gpu_blocks_override=128)

image = np.zeros((224, 336, 3), np.uint8)
image[:, :168] = (255, 0, 0)   # left half red
image[:, 168:] = (0, 0, 255)   # right half blue

# 500 = image placeholder id in the debug preset.
prompt_ids = [1, 2, 500, 3, 4]
out = llm.generate(prompt_token_ids=[prompt_ids],
                   sampling_params=SamplingParams(temperature=0.0,
                                                  max_tokens=16),
                   multi_modal_data={"image": image})
print("expanded prompt len:", len(out[0].prompt_token_ids))
print("generated:", out[0].outputs[0].token_ids)
