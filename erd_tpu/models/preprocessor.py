"""On-device batch preprocessing.

TPU analogue of DetDataPreprocessor
(/root/reference/mmdet/models/data_preprocessors/data_preprocessor.py:110-149):
the host pipeline already decodes/resizes/pads to a static bucket shape and
emits RGB uint8; normalization (and optional bf16 cast) happens inside the
jitted step so the host->device transfer moves 1 byte/px instead of 4.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# ImageNet RGB stats used by every reference config (configs/gfl_increment/*).
IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


@dataclass(frozen=True)
class Preprocessor:
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD
    compute_dtype: jnp.dtype = jnp.float32

    def __call__(self, images):
        """(B, H, W, 3) uint8 RGB -> normalized compute_dtype.

        The arithmetic runs directly in compute_dtype: for bf16 that halves
        the stem's input bandwidth (uint8 values up to 255 and the ImageNet
        stats are exactly representable enough — max quantization error
        ~0.004 of a std, far below augmentation noise).
        """
        mean = jnp.asarray(self.mean, self.compute_dtype)
        inv_std = jnp.asarray(1.0 / np.asarray(self.std),
                              self.compute_dtype)
        return (images.astype(self.compute_dtype) - mean) * inv_std
