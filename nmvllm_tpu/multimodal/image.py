"""Image modality plugin (reference: vllm/multimodal/image.py).

Default mapper: PIL image / numpy array -> normalized CHW pixel_values
using the model's HF image-processor geometry when available, else a
plain resize+scale. VLM model classes override via
``@MULTIMODAL_REGISTRY.register_image_input_mapper()``.
"""
from typing import Any

import numpy as np

from nmvllm_tpu.multimodal.base import (MultiModalInputs, MultiModalPlugin)


def _to_numpy_image(data: Any) -> np.ndarray:
    """Accept PIL.Image / numpy HWC uint8 / CHW float arrays."""
    if hasattr(data, "convert"):  # PIL
        data = np.asarray(data.convert("RGB"))
    arr = np.asarray(data)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3:
        raise ValueError(f"Unsupported image shape {arr.shape}")
    if arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = np.moveaxis(arr, 0, -1)  # CHW -> HWC
    return arr


def _resize_nearest(img: np.ndarray, size: int) -> np.ndarray:
    h, w, _ = img.shape
    ys = (np.arange(size) * h // size).clip(0, h - 1)
    xs = (np.arange(size) * w // size).clip(0, w - 1)
    return img[ys][:, xs]


class ImagePlugin(MultiModalPlugin):

    def get_data_key(self) -> str:
        return "image"

    def _default_input_mapper(self, model_config,
                              data: Any) -> MultiModalInputs:
        img = _to_numpy_image(data)
        size = 336
        hf_cfg = getattr(model_config, "hf_config", None)
        vis = getattr(hf_cfg, "vision_config", None)
        if vis is not None and getattr(vis, "image_size", None):
            size = int(vis.image_size)
        img = _resize_nearest(img, size).astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
        img = (img - mean) / std
        pixel_values = np.moveaxis(img, -1, 0)[None]  # (1, C, H, W)
        return {"pixel_values": pixel_values}
