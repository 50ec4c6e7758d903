"""Shape and behavior tests for the full generator + discriminators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.models import (
    AttributeDiscriminator,
    Generator,
    ImageDiscriminator,
    ObjectDiscriminator,
)

NUM_CLASSES = 179
ATTR_DIM = 106


def make_batch(rng, b=2, o=4, size=64, z_dim=64):
    imgs = rng.randn(b, size, size, 3).astype(np.float32)
    objs = rng.randint(0, NUM_CLASSES, (b, o)).astype(np.int32)
    boxes = rng.uniform(0.1, 0.5, (b, o, 4)).astype(np.float32)
    boxes[..., 2:] = np.minimum(boxes[..., :2] + 0.3, 1.0)
    valid = (np.arange(o)[None] < np.array([o, o - 2])[:, None]).astype(np.float32)
    masks = rng.randint(0, 2, (b, o, size, size, 1)).astype(np.float32)
    attr = (rng.rand(b, o, ATTR_DIM) < 0.05).astype(np.float32)
    z = rng.randn(b, o, z_dim).astype(np.float32)
    return dict(
        imgs=jnp.asarray(imgs),
        objs=jnp.asarray(objs),
        boxes=jnp.asarray(boxes),
        masks=jnp.asarray(masks),
        valid=jnp.asarray(valid),
        z_rand=jnp.asarray(z),
        attribute=jnp.asarray(attr),
        masks_shift=jnp.asarray(masks),
        boxes_shift=jnp.asarray(boxes),
        attribute_est=jnp.asarray(attr),
    )


@pytest.mark.parametrize("size,obj_size", [(64, 32), (128, 64)])
def test_generator_forward_shapes(size, obj_size):
    rng = np.random.RandomState(0)
    b, o = 2, 4
    batch = make_batch(rng, b, o, size)
    model = Generator(
        num_classes=NUM_CLASSES, image_size=size, object_size=obj_size, clstm_layers=3
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        **batch,
        train=True,
    )
    out, mutated = model.apply(
        variables,
        **batch,
        train=True,
        rngs={"reparam": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out["img_rec"].shape == (b, size, size, 3)
    assert out["img_rand"].shape == (b, size, size, 3)
    assert out["img_shift"].shape == (b, size, size, 3)
    assert out["crops_input"].shape == (b, o, obj_size, obj_size, 3)
    assert out["mu"].shape == (b * o, 64)
    assert out["z_rand_rec"].shape == (b * o, 64)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
    assert "batch_stats" in mutated


def test_generator_generate_path():
    rng = np.random.RandomState(1)
    b, o = 2, 4
    batch = make_batch(rng, b, o, 64)
    model = Generator(num_classes=NUM_CLASSES, image_size=64, object_size=32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        **batch,
        train=True,
    )
    img = model.apply(
        variables,
        batch["objs"],
        batch["boxes"],
        batch["valid"],
        batch["z_rand"],
        batch["attribute"],
        method=Generator.generate,
    )
    assert img.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_discriminator_shapes():
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    crops = jnp.asarray(rng.randn(8, 32, 32, 3).astype(np.float32))
    crops64 = jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32))

    di = ImageDiscriminator()
    v = di.init(jax.random.PRNGKey(0), imgs)
    out, _ = di.apply(v, imgs, mutable=["batch_stats"])
    assert out.shape == (2,)

    do = ObjectDiscriminator(n_class=NUM_CLASSES)
    v = do.init(jax.random.PRNGKey(0), crops)
    (src, cls), _ = do.apply(v, crops, mutable=["batch_stats"])
    assert src.shape == (8,) and cls.shape == (8, NUM_CLASSES)

    da = AttributeDiscriminator(n_attribute=ATTR_DIM)
    v = da.init(jax.random.PRNGKey(0), crops)
    att, _ = da.apply(v, crops, mutable=["batch_stats"])
    assert att.shape == (8, ATTR_DIM)

    da128 = AttributeDiscriminator(n_attribute=ATTR_DIM, extra_block=True)
    v = da128.init(jax.random.PRNGKey(0), crops64)
    att, _ = da128.apply(v, crops64, mutable=["batch_stats"])
    assert att.shape == (8, ATTR_DIM)


def test_spectral_norm_constrains_weights():
    """After power iteration converges, the effective weight has sigma ~= 1."""
    from aglayout_tpu.models.sn import SNConv2d

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    mod = SNConv2d(8, 3, padding=1)
    state = mod.init(jax.random.PRNGKey(0), x)
    for _ in range(50):
        out, mut = mod.apply(state, x, True, mutable=["batch_stats"])
        state = {"params": state["params"], "batch_stats": mut["batch_stats"]}
    k = np.asarray(state["params"]["kernel"])  # (kh, kw, I, O)
    mat = k.transpose(3, 2, 0, 1).reshape(8, -1)
    u = np.asarray(state["batch_stats"]["sn"]["u"])
    v = np.asarray(state["batch_stats"]["sn"]["v"])
    sigma_est = u @ mat @ v
    sigma_true = np.linalg.svd(mat, compute_uv=False)[0]
    np.testing.assert_allclose(sigma_est, sigma_true, rtol=1e-3)
    # the normalized weight used in the forward therefore has sigma ~= 1
    assert np.isfinite(np.asarray(out)).all()
