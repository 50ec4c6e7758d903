"""Adversarial-box coverage for the typed-algebra eval layout path.

The eval serving path computes stage-1..c3 via row/column type candidates
(generator.py LayoutEncoder._typed_c2c3_eval); pattern->candidate matching
must cover every realized window pattern for ANY box geometry: degenerate
(zero area), single-pixel, full-image, clamped at borders, and shifted
outside [0, 1] (boxes_shift can leave the canvas).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.models.generator import Generator
from aglayout_tpu.ops.rasterize import rasterize_boxes

NUM_CLASSES = 11


def _boxes_adversarial():
    # (x0, y0, x1, y1) normalized
    return np.asarray(
        [
            [
                [0.0, 0.0, 1.0, 1.0],      # full image
                [0.5, 0.5, 0.5, 0.5],      # zero area
                [0.0, 0.0, 0.01, 0.01],    # single pixel at corner
                [0.98, 0.97, 1.0, 1.0],    # single pixel at far corner
                [0.3, 0.0, 0.35, 1.0],     # full-height sliver
            ],
            [
                [-0.4, 0.2, 0.1, 0.5],     # shifted partially off-canvas left
                [0.7, 0.3, 1.3, 0.6],      # off-canvas right
                [0.2, 0.21, 0.8, 0.22],    # 1-row band
                [0.0, 0.4, 1.0, 0.6],      # full-width band
                [0.45, 0.1, 0.55, 0.9],    # tall thin center
            ],
        ],
        np.float32,
    )


@pytest.mark.parametrize("image_size,object_size", [(64, 32), (128, 64)])
def test_typed_layout_adversarial_boxes(image_size, object_size):
    rng = np.random.RandomState(3)
    boxes = jnp.asarray(_boxes_adversarial())
    b, o = boxes.shape[:2]
    model = Generator(
        num_classes=NUM_CLASSES,
        image_size=image_size,
        object_size=object_size,
        clstm_layers=2,
        resi_num=1,
    )
    objs = jnp.asarray(rng.randint(0, NUM_CLASSES, (b, o)), jnp.int32)
    valid = jnp.ones((b, o), jnp.float32)
    z = jnp.asarray(rng.randn(b, o, 64).astype(np.float32))
    attr = jnp.asarray((rng.rand(b, o, 106) < 0.1).astype(np.float32))
    masks = rasterize_boxes(boxes, image_size, image_size)[..., None]

    batch = dict(
        imgs=jnp.asarray(rng.randn(b, image_size, image_size, 3).astype(np.float32)),
        objs=objs, boxes=boxes, masks=masks, valid=valid, z_rand=z,
        attribute=attr, masks_shift=masks, boxes_shift=boxes, attribute_est=attr,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        **batch, train=True,
    )
    _, mut = model.apply(
        variables, **batch, train=True,
        rngs={"reparam": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": mut["batch_stats"]}

    typed = model.apply(
        variables, objs, boxes, valid, z, attr, None, False, method=Generator.generate
    )
    dense = model.apply(
        variables, objs, boxes, valid, z, attr, masks, False, method=Generator.generate
    )
    np.testing.assert_allclose(np.asarray(typed), np.asarray(dense), atol=3e-4)


@pytest.mark.parametrize("image_size", [64, 128])
def test_typed_axis_coverage_exhaustive(image_size):
    """Every realizable (inb, rect-window) pattern must match a candidate
    type row — the argmax pattern-match in the typed eval path would
    otherwise silently map uncovered rows to candidate 0 (ADVICE r2).

    The typing depends on the box only through rounded integer edges and
    rows/columns type independently, so enumerating all integer (lo, hi)
    pairs in [0, size]^2 is a complete proof for this image size.
    """
    from aglayout_tpu.models.generator import typed_axis_coverage

    cov2, cov3 = jax.jit(typed_axis_coverage, static_argnums=0)(image_size)
    cov2, cov3 = np.asarray(cov2), np.asarray(cov3)
    n = image_size + 1
    lo, hi = np.divmod(np.arange(n * n), n)
    bad2 = np.argwhere(~cov2)
    bad3 = np.argwhere(~cov3)
    assert cov2.all(), f"c2 rows uncovered at edges {[(lo[i], hi[i]) for i, in bad2[:5]]}"
    assert cov3.all(), f"c3 rows uncovered at edges {[(lo[i], hi[i]) for i, in bad3[:5]]}"
