"""The fused eval-mode layout-encoder stage-1 must be EXACT vs the classic
masked-plane path (same params, same running stats, same boxes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.models.generator import Generator
from aglayout_tpu.ops.rasterize import rasterize_boxes

NUM_CLASSES = 23


def _setup(image_size, object_size):
    rng = np.random.RandomState(0)
    b, o = 2, 4
    model = Generator(
        num_classes=NUM_CLASSES,
        image_size=image_size,
        object_size=object_size,
        clstm_layers=2,
        resi_num=1,
    )
    objs = jnp.asarray(rng.randint(0, NUM_CLASSES, (b, o)), jnp.int32)
    xy0 = rng.uniform(0, 0.6, (b, o, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.4, (b, o, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy0, np.minimum(xy0 + wh, 1.0)], -1))
    valid = jnp.asarray((np.arange(o)[None] < np.array([4, 2])[:, None]).astype(np.float32))
    z = jnp.asarray(rng.randn(b, o, 64).astype(np.float32))
    attr = jnp.asarray((rng.rand(b, o, 106) < 0.1).astype(np.float32))
    masks = rasterize_boxes(boxes, image_size, image_size)[..., None]

    batch = dict(
        imgs=jnp.asarray(rng.randn(b, image_size, image_size, 3).astype(np.float32)),
        objs=objs,
        boxes=boxes,
        masks=masks,
        valid=valid,
        z_rand=z,
        attribute=attr,
        masks_shift=masks,
        boxes_shift=boxes,
        attribute_est=attr,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        **batch,
        train=True,
    )
    # populate nontrivial BN running stats with one train pass
    _, mut = model.apply(
        variables,
        **batch,
        train=True,
        rngs={"reparam": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": mut["batch_stats"]}
    return model, variables, objs, boxes, valid, z, attr, masks


@pytest.mark.parametrize("image_size,object_size", [(64, 32), (128, 64)])
def test_fused_generate_matches_masked_path(image_size, object_size):
    model, variables, objs, boxes, valid, z, attr, masks = _setup(image_size, object_size)

    fused = model.apply(
        variables, objs, boxes, valid, z, attr, None, False, method=Generator.generate
    )
    classic = model.apply(
        variables, objs, boxes, valid, z, attr, masks, False, method=Generator.generate
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(classic), atol=2e-4)


@pytest.mark.parametrize("image_size,object_size", [(64, 32)])
def test_fused_train_forward_matches_masked_path(image_size, object_size):
    """Train-mode fused stage-1 (analytic batch stats) must match the dense
    masked path: outputs AND updated BN running stats."""
    model, variables, objs, boxes, valid, z, attr, masks = _setup(image_size, object_size)
    model_dense = Generator(
        num_classes=NUM_CLASSES,
        image_size=image_size,
        object_size=object_size,
        clstm_layers=2,
        resi_num=1,
        fused_layout=False,
    )
    batch = dict(
        imgs=jnp.asarray(np.random.RandomState(9).randn(2, image_size, image_size, 3).astype(np.float32)),
        objs=objs,
        boxes=boxes,
        masks=masks,
        valid=valid,
        z_rand=z,
        attribute=attr,
        masks_shift=masks,
        boxes_shift=boxes,
        attribute_est=attr,
    )
    out_f, mut_f = model.apply(
        variables, **batch, train=True,
        rngs={"reparam": jax.random.PRNGKey(5)}, mutable=["batch_stats"],
    )
    out_d, mut_d = model_dense.apply(
        variables, **batch, train=True,
        rngs={"reparam": jax.random.PRNGKey(5)}, mutable=["batch_stats"],
    )
    for k in ("img_rec", "img_rand", "img_shift", "mu", "z_rand_rec"):
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_d[k]), atol=3e-4, err_msg=k
        )
    # bn1 running stats updated identically by the analytic moments
    sf = mut_f["batch_stats"]["layout_encoder"]["bn1"]["bn"]
    sd = mut_d["batch_stats"]["layout_encoder"]["bn1"]["bn"]
    np.testing.assert_allclose(np.asarray(sf["mean"]), np.asarray(sd["mean"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sf["var"]), np.asarray(sd["var"]), atol=1e-5)
