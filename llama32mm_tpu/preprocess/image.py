"""Image preprocessing pipeline.

Parity target: reference ``Model/processing_mllama.py:5-43``:
PIL bicubic resize to (size, size) → fp32 ×1/255 rescale → per-channel
(x - mean)/std normalize → HWC→CHW transpose. The normalization constants are
named ``IMAGENET_STANDARD_*`` in the reference but are actually the CLIP
mean/std (SURVEY §2.4) — values preserved exactly.

TPU-first addition: ``preprocess_image_device`` fuses rescale/normalize/CHW
(and optional resize) as jnp ops so the whole pipeline jit-compiles into the
prefill program — raw uint8 pixels are the only host→device transfer on the
TTFT path.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_STANDARD_MEAN = [0.48145466, 0.4578275, 0.40821073]
IMAGENET_STANDARD_STD = [0.26862954, 0.26130258, 0.27577711]


def resize(image, size: Tuple[int, int], resample=None, reducing_gap=None):
    """PIL resize; ``size`` is (height, width) like the reference."""
    height, width = size
    return image.resize((width, height), resample=resample, reducing_gap=reducing_gap)


def rescale(image: np.ndarray, scale: float, dtype=np.float32) -> np.ndarray:
    return (image * scale).astype(dtype)


def normalize(image: np.ndarray, mean, std) -> np.ndarray:
    mean = np.array(mean, dtype=image.dtype)
    std = np.array(std, dtype=image.dtype)
    return (image - mean) / std


def process_images(
    images: Sequence,
    size: Optional[Tuple[int, int]] = None,
    resample=None,
    rescale_factor: Optional[float] = None,
    image_mean=None,
    image_std=None,
) -> List[np.ndarray]:
    """Host-side pipeline (reference ``process_images``): returns a list of
    CHW fp32 arrays."""
    height, width = size[0], size[1]
    images = [resize(im, (height, width), resample=resample) for im in images]
    images = [np.array(im) for im in images]
    images = [rescale(im, scale=rescale_factor) for im in images]
    images = [normalize(im, mean=image_mean, std=image_std) for im in images]
    return [im.transpose(2, 0, 1) for im in images]


def preprocess_image_device(
    raw_uint8: jax.Array,  # [B, H, W, C] uint8
    image_size: int,
    dtype=jnp.float32,
) -> jax.Array:
    """On-device fused preprocess: uint8 HWC → resized, rescaled, normalized
    CHW in one jit program. Bicubic resize via ``jax.image.resize`` when the
    input size differs from ``image_size``.

    Returns ``[B, C, image_size, image_size]``.
    """
    x = raw_uint8.astype(jnp.float32)
    if x.shape[1] != image_size or x.shape[2] != image_size:
        x = jax.image.resize(
            x, (x.shape[0], image_size, image_size, x.shape[3]), method="cubic"
        )
    x = x * (1.0 / 255.0)
    mean = jnp.asarray(IMAGENET_STANDARD_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STANDARD_STD, jnp.float32)
    x = (x - mean) / std
    return x.transpose(0, 3, 1, 2).astype(dtype)
