"""Differentiable bilinear ROI crop, TPU-native.

Capability parity with the reference's ``models/bilinear.py`` (crop_bbox_batch /
crop_bbox / bilinear_sample / tensor_linspace, reference lines 26-281), whose
executed backend is ``F.grid_sample`` on a grid built from per-box linspaces
with PyTorch-1.1 ``align_corners=True`` semantics and zero padding.

TPU-first design: instead of 4-corner gathers (scatter/gather is the slow path
on TPU), each crop is expressed as two small interpolation matrices applied by
einsum — ``crop = R_y @ img @ R_x^T`` — which XLA maps straight onto the MXU.
Each row of R has at most two non-zeros (the bilinear corner weights), built
from one-hot comparisons, so the result is bit-for-bit the same bilinear
sample while running as dense matmuls.

Sampling semantics (must match torch.nn.functional.grid_sample with
align_corners=True, padding_mode='zeros'):
  * box (x0, y0, x1, y1) in [0, 1] image coordinates
  * sample positions: linspace(x0, x1, WW) * (W - 1)  (same for y/H)
  * out-of-range corner pixels contribute zero
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def tensor_linspace(start: jax.Array, end: jax.Array, steps: int) -> jax.Array:
    """Vectorized linspace: out[..., i] interpolates start..end inclusive.

    Mirrors the reference's ``tensor_linspace`` (bilinear.py:252-281): the
    endpoints are exact and interior points are the convex combination
    ``start * (1 - t) + end * t`` with t = linspace(0, 1, steps).
    """
    t = jnp.linspace(0.0, 1.0, steps, dtype=jnp.float32)
    return start[..., None] * (1.0 - t) + end[..., None] * t


def interp_matrix(lo: jax.Array, hi: jax.Array, steps: int, size: int) -> jax.Array:
    """Build the (steps, size) bilinear interpolation matrix for one axis.

    Row i holds the bilinear weights for sample position
    ``linspace(lo, hi, steps)[i] * (size - 1)``; out-of-bounds corners get
    weight zero (grid_sample zero padding).

    ``lo``/``hi`` may have leading batch dims; output is (..., steps, size).
    """
    coord = tensor_linspace(lo, hi, steps) * (size - 1)  # (..., steps)
    i0 = jnp.floor(coord)
    w1 = coord - i0
    w0 = 1.0 - w1
    i1 = i0 + 1.0
    in0 = (i0 >= 0) & (i0 <= size - 1)
    in1 = (i1 >= 0) & (i1 <= size - 1)
    i0c = jnp.clip(i0, 0, size - 1).astype(jnp.int32)
    i1c = jnp.clip(i1, 0, size - 1).astype(jnp.int32)
    eye0 = jax.nn.one_hot(i0c, size, dtype=coord.dtype)  # (..., steps, size)
    eye1 = jax.nn.one_hot(i1c, size, dtype=coord.dtype)
    r = (w0 * in0)[..., None] * eye0 + (w1 * in1)[..., None] * eye1
    return r


def crop_bbox(feats: jax.Array, boxes: jax.Array, out_h: int, out_w: int | None = None) -> jax.Array:
    """Crop one box per feature map.

    feats: (N, H, W, C); boxes: (N, 4) as [x0, y0, x1, y1] in [0, 1].
    Returns (N, out_h, out_w, C). Equivalent to the reference's
    ``crop_bbox(..., backend='cudnn')`` (bilinear.py:107-136) in NHWC.
    """
    if out_w is None:
        out_w = out_h
    _, h, w, _ = feats.shape
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    ry = interp_matrix(y0, y1, out_h, h)  # (N, out_h, H)
    rx = interp_matrix(x0, x1, out_w, w)  # (N, out_w, W)
    # full-precision MXU passes: the interp matrices are tiny, and bf16
    # default precision would break bit parity with the reference sampler
    tmp = jnp.einsum("nyh,nhwc->nywc", ry, feats, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("nywc,nxw->nyxc", tmp, rx, precision=jax.lax.Precision.HIGHEST)


def crop_bbox_dense(
    feats: jax.Array,
    boxes: jax.Array,
    out_h: int,
    out_w: int | None = None,
) -> jax.Array:
    """Crop O boxes from each of B feature maps (the dense layout contract).

    feats: (B, H, W, C); boxes: (B, O, 4). Returns (B, O, out_h, out_w, C).

    This is the TPU-native replacement for the reference's
    ``crop_bbox_batch`` (bilinear.py:26-104): instead of grouping a ragged
    flat box list by ``obj_to_img`` with host-side index juggling, every
    image carries a static O_max box slots (padded slots produce garbage
    crops that downstream consumers mask out).
    """
    if out_w is None:
        out_w = out_h
    _, h, w, _ = feats.shape
    x0, y0, x1, y1 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    ry = interp_matrix(y0, y1, out_h, h)  # (B, O, out_h, H)
    rx = interp_matrix(x0, x1, out_w, w)  # (B, O, out_w, W)
    tmp = jnp.einsum("boyh,bhwc->boywc", ry, feats, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("boywc,boxw->boyxc", tmp, rx, precision=jax.lax.Precision.HIGHEST)


def uncrop_bbox(feats, boxes, out_h: int, out_w: int | None = None, fill_value: float = 0.0):
    """Inverse of crop_bbox: paste each crop into its box on a canvas.

    feats: (N, hh, ww, C) crops; boxes: (N, 4) normalized [x0, y0, x1, y1].
    Returns (N, out_h, out_w, C) canvases where the region given by box[i]
    contains feats[i] bilinearly resampled; outside-box pixels take
    fill_value. Mirrors the reference's uncrop_bbox (bilinear.py:139-191):
    canvas pixel (y, x) samples the crop at ((x/W - x0)/w, (y/H - y0)/h).
    """
    if out_w is None:
        out_w = out_h
    n, hh, ww, _ = feats.shape
    x0, y0 = boxes[:, 0], boxes[:, 1]
    bw = boxes[:, 2] - x0
    bh = boxes[:, 3] - y0
    xs = jnp.linspace(0.0, 1.0, out_w)
    ys = jnp.linspace(0.0, 1.0, out_h)
    u = (xs[None, :] - x0[:, None]) / jnp.where(bw == 0, 1.0, bw)[:, None]  # (N, W)
    v = (ys[None, :] - y0[:, None]) / jnp.where(bh == 0, 1.0, bh)[:, None]  # (N, H)

    def axis_matrix(t, size):
        # rows: output positions; cols: crop pixels (coord t*size, reference
        # 'jj' backend convention with clamped corners)
        coord = t * size
        i0 = jnp.clip(jnp.floor(coord), 0, size - 1)
        i1 = jnp.clip(i0 + 1, 0, size - 1)
        w1 = coord - jnp.floor(coord)
        eye0 = jax.nn.one_hot(i0.astype(jnp.int32), size, dtype=feats.dtype)
        eye1 = jax.nn.one_hot(i1.astype(jnp.int32), size, dtype=feats.dtype)
        return (1.0 - w1)[..., None] * eye0 + w1[..., None] * eye1

    ry = axis_matrix(v, hh)  # (N, out_h, hh)
    rx = axis_matrix(u, ww)  # (N, out_w, ww)
    out = jnp.einsum("nyh,nhwc->nywc", ry, feats, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("nywc,nxw->nyxc", out, rx, precision=jax.lax.Precision.HIGHEST)
    inside = (
        ((u >= 0) & (u <= 1))[:, None, :, None] & ((v >= 0) & (v <= 1))[:, :, None, None]
    )
    return jnp.where(inside, out, fill_value)


@functools.partial(jax.jit, static_argnums=(3, 4))
def crop_bbox_flat(
    feats: jax.Array,
    boxes: jax.Array,
    box_to_feat: jax.Array,
    out_h: int,
    out_w: int | None = None,
) -> jax.Array:
    """Flat-list interface for compatibility with the reference call shape.

    feats: (N, H, W, C); boxes: (M, 4); box_to_feat: (M,) int mapping each
    box to its source map. Returns (M, out_h, out_w, C). Matches the
    reference ``crop_bbox_batch(feats, bbox, bbox_to_feats, HH)``
    (bilinear.py:26-57) output order without the inverse-permutation dance.
    """
    gathered = jnp.take(feats, box_to_feat, axis=0)
    return crop_bbox(gathered, boxes, out_h, out_w)
