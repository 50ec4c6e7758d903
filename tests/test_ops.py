"""Golden-value tests for core tensor ops.

The ROI crop is validated against torch.nn.functional.grid_sample with
align_corners=True — the exact public API the reference's executed backend
calls — and the rasterizer against the reference's slicing semantics
recomputed independently in numpy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aglayout_tpu.ops import (
    crop_bbox,
    crop_bbox_dense,
    crop_bbox_flat,
    imagenet_deprocess_batch,
    imagenet_preprocess,
    rasterize_boxes,
    shift_boxes,
    tensor_linspace,
)

pytestmark = pytest.mark.quick


def torch_crop(feats_nchw, boxes, hh, ww):
    """Reference semantics via the public torch API (grid_sample path)."""
    n = feats_nchw.shape[0]
    b = torch.as_tensor(2.0 * boxes - 1.0, dtype=torch.float32)
    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    t = torch.linspace(0, 1, ww)
    X = (x0[:, None] * (1 - t) + x1[:, None] * t).view(n, 1, ww).expand(n, hh, ww)
    t = torch.linspace(0, 1, hh)
    Y = (y0[:, None] * (1 - t) + y1[:, None] * t).view(n, hh, 1).expand(n, hh, ww)
    grid = torch.stack([X, Y], dim=3)
    out = F.grid_sample(torch.as_tensor(feats_nchw), grid, align_corners=True)
    return out.numpy()


def test_tensor_linspace_endpoints():
    start = jnp.array([0.0, 0.25])
    end = jnp.array([1.0, 0.75])
    out = tensor_linspace(start, end, 5)
    np.testing.assert_allclose(out[:, 0], start, atol=1e-6)
    np.testing.assert_allclose(out[:, -1], end, atol=1e-6)
    np.testing.assert_allclose(out[0], np.linspace(0, 1, 5), atol=1e-6)


@pytest.mark.parametrize("hh", [8, 32])
def test_crop_bbox_matches_grid_sample(hh):
    rng = np.random.RandomState(0)
    feats = rng.randn(4, 16, 20, 3).astype(np.float32)
    boxes = np.stack(
        [
            rng.uniform(0, 0.5, 4).astype(np.float32),
            rng.uniform(0, 0.5, 4).astype(np.float32),
            rng.uniform(0.5, 1.0, 4).astype(np.float32),
            rng.uniform(0.5, 1.0, 4).astype(np.float32),
        ],
        axis=1,
    )
    ours = crop_bbox(jnp.asarray(feats), jnp.asarray(boxes), hh)
    ref = torch_crop(feats.transpose(0, 3, 1, 2), boxes, hh, hh)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_crop_bbox_out_of_range_zero_padding():
    feats = np.ones((1, 8, 8, 1), dtype=np.float32)
    boxes = np.array([[-0.5, -0.5, 1.5, 1.5]], dtype=np.float32)
    ours = np.asarray(crop_bbox(jnp.asarray(feats), jnp.asarray(boxes), 16))
    ref = torch_crop(feats.transpose(0, 3, 1, 2), boxes, 16, 16)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-4)
    assert ours[0, 0, 0, 0] == 0.0  # corner outside image samples zero


def test_crop_bbox_dense_matches_flat():
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 12, 12, 3).astype(np.float32)
    boxes = rng.uniform(0.1, 0.9, (2, 5, 4)).astype(np.float32)
    boxes[..., 2:] = np.maximum(boxes[..., 2:], boxes[..., :2] + 0.05)
    dense = crop_bbox_dense(jnp.asarray(feats), jnp.asarray(boxes), 8)
    flat_boxes = boxes.reshape(-1, 4)
    box_to_feat = np.repeat(np.arange(2), 5)
    flat = crop_bbox_flat(jnp.asarray(feats), jnp.asarray(flat_boxes), jnp.asarray(box_to_feat), 8)
    np.testing.assert_allclose(np.asarray(dense).reshape(-1, 8, 8, 3), np.asarray(flat), atol=1e-5)


def test_crop_bbox_gradients_flow():
    feats = jnp.ones((1, 8, 8, 1))
    boxes = jnp.array([[0.25, 0.25, 0.75, 0.75]])

    def loss(f):
        return jnp.sum(crop_bbox(f, boxes, 4) ** 2)

    g = jax.grad(loss)(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_rasterize_matches_reference_slicing():
    H = W = 64
    rng = np.random.RandomState(2)
    boxes = rng.uniform(0, 1, (10, 4)).astype(np.float32)
    boxes[:, 2:] = np.minimum(boxes[:, :2] + rng.uniform(0.05, 0.5, (10, 2)), 1.0).astype(np.float32)
    ours = np.asarray(rasterize_boxes(jnp.asarray(boxes), H, W))
    for i, (x0, y0, x1, y1) in enumerate(boxes):
        ref = np.zeros((H, W), np.float32)
        # reference: masks[i, :, round(y0*H):round(y1*H), round(x0*W):round(x1*W)] = 1
        ref[
            int(np.round(float(y0) * H)) : int(np.round(float(y1) * H)),
            int(np.round(float(x0) * W)) : int(np.round(float(x1) * W)),
        ] = 1
        np.testing.assert_array_equal(ours[i], ref)


def test_shift_boxes_semantics():
    boxes = jnp.array(
        [
            [0.6, 0.1, 0.9, 0.5],  # narrow, left border farther -> shift left 0.8*0.6
            [0.1, 0.1, 0.4, 0.5],  # narrow, right border farther -> shift right 0.8*0.6
            [0.1, 0.1, 0.8, 0.5],  # wide (>=0.5): unchanged
        ]
    )
    out = np.asarray(shift_boxes(boxes))
    np.testing.assert_allclose(out[0], [0.6 - 0.48, 0.1, 0.9 - 0.48, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.1 + 0.48, 0.1, 0.4 + 0.48, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[2], np.asarray(boxes[2]), atol=1e-6)
    # y coordinates never move
    np.testing.assert_allclose(out[:, 1], np.asarray(boxes[:, 1]))


def test_imagenet_roundtrip():
    rng = np.random.RandomState(3)
    imgs = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    norm = imagenet_preprocess(jnp.asarray(imgs))
    t = torch.as_tensor(imgs.transpose(0, 3, 1, 2))
    ref = (t - torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)) / torch.tensor(
        [0.229, 0.224, 0.225]
    ).view(1, 3, 1, 1)
    np.testing.assert_allclose(np.asarray(norm).transpose(0, 3, 1, 2), ref.numpy(), atol=1e-6)
    dep = imagenet_deprocess_batch(norm)
    assert dep.dtype == jnp.uint8
    assert int(jnp.max(dep)) == 255 and int(jnp.min(dep)) == 0  # per-image rescale


def test_uncrop_bbox_roundtrip():
    """Pasting a full-image 'crop' back with box [0,0,1,1] is ~identity in
    the interior, and outside-box pixels take the fill value."""
    from aglayout_tpu.ops import uncrop_bbox

    rng = np.random.RandomState(5)
    feats = rng.randn(2, 8, 8, 3).astype(np.float32)
    boxes = np.array([[0.25, 0.25, 0.75, 0.75], [0.0, 0.0, 1.0, 1.0]], np.float32)
    out = np.asarray(uncrop_bbox(jnp.asarray(feats), jnp.asarray(boxes), 16, fill_value=-7.0))
    assert out.shape == (2, 16, 16, 3)
    # sample 0: pixels outside the box are fill
    assert np.all(out[0, 0, 0] == -7.0) and np.all(out[0, -1, -1] == -7.0)
    # inside the box, values come from the crop (finite, not fill)
    assert np.all(out[0, 8, 8] != -7.0)
    # sample 1: full box -> corner equals crop corner (coord 0 -> pixel 0)
    np.testing.assert_allclose(out[1, 0, 0], feats[1, 0, 0], atol=1e-5)
