"""ImageNet (de)normalization, NHWC.

Capability parity with the reference's ``data/utils.py:28-66``
(imagenet_preprocess / imagenet_deprocess_batch): normalize with ImageNet
mean/std, and the inverse plus a per-image min-max rescale to [0, 255] uint8
used for all saved/visualized images.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def imagenet_preprocess(images):
    """[0, 1] float NHWC -> ImageNet-normalized. Works on jnp or np arrays."""
    xp = jnp if isinstance(images, jnp.ndarray) else np
    mean = xp.asarray(IMAGENET_MEAN, dtype=images.dtype)
    std = xp.asarray(IMAGENET_STD, dtype=images.dtype)
    return (images - mean) / std


def imagenet_deprocess(images, rescale: bool = True):
    """Inverse-normalize; optionally min-max rescale per image to [0, 1]."""
    x = images * jnp.asarray(IMAGENET_STD) + jnp.asarray(IMAGENET_MEAN)
    if rescale:
        axes = tuple(range(1, x.ndim))
        lo = jnp.min(x, axis=axes, keepdims=True)
        hi = jnp.max(x, axis=axes, keepdims=True)
        x = (x - lo) / (hi - lo)
    return x


def imagenet_deprocess_batch(images, rescale: bool = True):
    """NHWC normalized batch -> uint8 [0, 255], matching
    data/utils.py:47-66 (per-image rescale then mul(255).clamp)."""
    x = imagenet_deprocess(images, rescale=rescale)
    return jnp.clip(x * 255.0, 0, 255).astype(jnp.uint8)
