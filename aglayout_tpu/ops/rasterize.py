"""On-device layout mask rasterization and shift augmentation.

The reference rasterizes binary layout masks on the host inside the
DataLoader (``data/vg_custom_mask.py:136``:
``masks[i, :, round(y0*H):round(y1*H), round(x0*W):round(x1*W)] = 1``) and
computes the horizontal "shift" augmentation per object in Python
(``data/vg_custom_mask.py:139-158``). Here both are pure vectorized array ops
so they can run on device (or in the numpy input pipeline) with identical
semantics: Python's ``round`` is round-half-to-even, as is ``jnp.round``.
"""

from __future__ import annotations

import jax.numpy as jnp


def rasterize_boxes(boxes, height: int, width: int):
    """Rasterize normalized [x0, y0, x1, y1] boxes to binary masks.

    boxes: (..., 4) in [0, 1]. Returns float32 (..., height, width) with
    mask[y, x] = 1 iff round(y0*H) <= y < round(y1*H) and
    round(x0*W) <= x < round(x1*W) — exactly the half-open integer box the
    reference assigns with slicing.
    """
    x0, y0, x1, y1 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    c0 = jnp.round(x0 * width)
    c1 = jnp.round(x1 * width)
    r0 = jnp.round(y0 * height)
    r1 = jnp.round(y1 * height)
    rows = jnp.arange(height, dtype=boxes.dtype)
    cols = jnp.arange(width, dtype=boxes.dtype)
    row_in = (rows >= r0[..., None]) & (rows < r1[..., None])  # (..., H)
    col_in = (cols >= c0[..., None]) & (cols < c1[..., None])  # (..., W)
    return (row_in[..., :, None] & col_in[..., None, :]).astype(jnp.float32)


def shift_boxes(boxes):
    """Horizontal shift augmentation for position-consistency training.

    Mirrors data/vg_custom_mask.py:139-158: objects with normalized width
    < 0.5 are translated horizontally by 0.8x the larger border distance
    (toward the farther border); wide objects and perfectly centered ones
    stay put. boxes: (..., 4) -> shifted boxes (..., 4).
    """
    x0, y0, x1, y1 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    width = x1 - x0
    left = x0
    right = 1.0 - x1
    shift_left = -left * 0.8
    shift_right = right * 0.8
    delta = jnp.where(left > right, shift_left, jnp.where(right > left, shift_right, 0.0))
    delta = jnp.where(width < 0.5, delta, 0.0)
    return jnp.stack([x0 + delta, y0, x1 + delta, y1], axis=-1)
