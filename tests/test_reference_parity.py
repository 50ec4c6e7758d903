"""Full per-sample parity vs the actual reference PyTorch model.

Imports the reference implementation from /root/reference (read-only) on
CPU, builds it with random weights, converts its state_dict through our
torch importer, and compares full forward outputs element-wise. This is the
"per-sample fidelity validated against reference PyTorch checkpoints"
requirement of BASELINE.md exercised end-to-end (with random weights in
place of the unpublished pretrained ones — the math path is identical).

torch>=1.3 changed F.grid_sample's default to align_corners=False; the
reference ran torch 1.1 (align_corners=True semantics, README.md:10), so
grid_sample is wrapped to restore the original behavior for the comparison.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@pytest.fixture(scope="module")
def reference_generator():
    import torch
    import torch.nn.functional as F

    if REF not in sys.path:
        sys.path.insert(0, REF)
    # restore torch-1.1 grid_sample semantics the reference was written for
    orig = F.grid_sample

    def grid_sample_11(input, grid, **kw):
        kw.setdefault("align_corners", True)
        return orig(input, grid, **kw)

    F.grid_sample = grid_sample_11
    try:
        from models.generator_obj_att import Generator as RefGenerator
    except Exception as e:  # pragma: no cover
        F.grid_sample = orig
        pytest.skip(f"reference import failed: {e}")
    torch.manual_seed(0)
    ref = RefGenerator(
        num_embeddings=23, obj_att_dim=64, z_dim=64, obj_size=32,
        clstm_layers=3, attribute_dim=106,
    )
    ref.eval()
    yield ref, torch
    F.grid_sample = orig


def test_full_generator_parity_vs_reference(reference_generator):
    ref, torch = reference_generator
    import jax
    import jax.numpy as jnp

    from aglayout_tpu.models.generator import Generator
    from aglayout_tpu.ops.rasterize import rasterize_boxes
    from aglayout_tpu.utils.torch_import import import_generator

    b, o, size, obj_size = 2, 3, 64, 32
    rng = np.random.RandomState(0)
    imgs = rng.randn(b, 3, size, size).astype(np.float32)
    objs = rng.randint(0, 23, (b, o)).astype(np.int64)
    xy0 = rng.uniform(0.05, 0.5, (b, o, 2)).astype(np.float32)
    wh = rng.uniform(0.15, 0.4, (b, o, 2)).astype(np.float32)
    boxes = np.concatenate([xy0, np.minimum(xy0 + wh, 1.0)], -1).astype(np.float32)
    attrs = (rng.rand(b, o, 106) < 0.1).astype(np.float32)
    z_rand = rng.randn(b, o, 64).astype(np.float32)
    # genuinely shifted variant: different boxes, own rasterized masks
    xy0s = rng.uniform(0.05, 0.5, (b, o, 2)).astype(np.float32)
    whs = rng.uniform(0.15, 0.4, (b, o, 2)).astype(np.float32)
    boxes_shift = np.concatenate([xy0s, np.minimum(xy0s + whs, 1.0)], -1).astype(np.float32)
    masks = np.asarray(rasterize_boxes(jnp.asarray(boxes), size, size))[..., None]
    masks_shift = np.asarray(rasterize_boxes(jnp.asarray(boxes_shift), size, size))[..., None]

    # ---- reference forward (flat contract, eval mode)
    t = torch.as_tensor
    flat = lambda x: x.reshape((b * o,) + x.shape[2:])  # noqa: E731
    obj_to_img = np.repeat(np.arange(b), o)
    with torch.no_grad():
        ref_out = ref(
            t(imgs),
            t(flat(objs)),
            t(flat(boxes)),
            t(flat(masks.transpose(0, 1, 4, 2, 3))),  # (O,1,H,W)
            t(obj_to_img),
            t(flat(z_rand)),
            t(flat(attrs)),
            t(flat(masks_shift.transpose(0, 1, 4, 2, 3))),
            t(flat(boxes_shift)),
            t(flat(attrs)),
        )
    (r_crops, r_crops_rec, r_crops_rand, r_crops_shift, r_img_rec, r_img_rand,
     r_img_shift, r_mu, r_logvar, r_z_rand_rec, r_z_rand_shift) = [
        x.numpy() for x in ref_out
    ]

    # ---- our forward with imported weights
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params, stats = import_generator(sd, image_size=64, clstm_layers=3)
    model = Generator(num_classes=23, image_size=64, object_size=32, clstm_layers=3)
    # template init to obtain the full batch_stats structure (u/v-free nets)
    batch = dict(
        imgs=jnp.asarray(imgs.transpose(0, 2, 3, 1)),
        objs=jnp.asarray(objs.astype(np.int32)),
        boxes=jnp.asarray(boxes),
        masks=jnp.asarray(masks),
        valid=jnp.ones((b, o), jnp.float32),
        z_rand=jnp.asarray(z_rand),
        attribute=jnp.asarray(attrs),
        masks_shift=jnp.asarray(masks_shift),
        boxes_shift=jnp.asarray(boxes_shift),
        attribute_est=jnp.asarray(attrs),
    )
    template = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        **batch,
        train=True,
    )
    # imported trees must cover the template exactly (same structure)
    tpaths = set(
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(template["params"])[0]
    )
    ipaths = set(jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(params)[0])
    assert tpaths == ipaths, (tpaths - ipaths, ipaths - tpaths)

    out = model.apply(
        {"params": params, "batch_stats": stats},
        **batch,
        train=False,
        rngs={"reparam": jax.random.PRNGKey(2)},
    )

    def check(name, ours, theirs, is_image=True, atol=2e-3):
        ours = np.asarray(ours)
        if is_image:
            ours = ours.transpose(0, 3, 1, 2) if ours.ndim == 4 else ours
        np.testing.assert_allclose(ours, theirs, atol=atol, err_msg=name)

    check("img_rand", out["img_rand"], r_img_rand)
    check("img_shift", out["img_shift"], r_img_shift)
    check("mu", out["mu"], r_mu, is_image=False)
    check("logvar", out["logvar"], r_logvar, is_image=False)
    check("z_rand_rec", out["z_rand_rec"], r_z_rand_rec, is_image=False)
    check("z_rand_shift", out["z_rand_shift"], r_z_rand_shift, is_image=False)
    check(
        "crops_input",
        np.asarray(out["crops_input"]).reshape(b * o, obj_size, obj_size, 3),
        r_crops,
    )
    check(
        "crops_rand",
        np.asarray(out["crops_rand"]).reshape(b * o, obj_size, obj_size, 3),
        r_crops_rand,
    )
    # img_rec depends on z_rec (random eps in both impls) — parity holds for
    # the deterministic mu-driven outputs checked above.


def test_ragged_train_mode_parity_vs_reference(reference_generator):
    """The dense-padding redesign's riskiest semantics vs ground truth:

    * ragged object counts (2/4/5 objects across a 3-image batch) — the
      reference flat-packs real objects (models/generator_obj_att.py:285-346
      groups them per image); we pad to O_max=5 with a validity mask, so this
      exercises masked BatchNorm statistics (real rows only), the analytic
      fused-stage-1 train-mode moments, and ConvLSTM carry-through padding;
    * train mode (ref.train()) — batch-statistic normalization everywhere
      AND the running-stat updates (momentum 0.1, unbiased var) compared
      against the reference's post-forward state_dict;
    * genuinely shifted boxes_shift (different from boxes), so the shift
      branch runs with its own rasterized masks;
    * a deterministic img_rec comparison: fc_logvar is pinned to -40 so
      z_rec == mu up to ~1e-8 on both sides regardless of the eps draw.
    """
    _, torch = reference_generator
    import jax
    import jax.numpy as jnp

    from models.generator_obj_att import Generator as RefGenerator

    from aglayout_tpu.models.generator import Generator
    from aglayout_tpu.ops.rasterize import rasterize_boxes
    from aglayout_tpu.utils.torch_import import import_generator

    torch.manual_seed(5)
    ref = RefGenerator(
        num_embeddings=13, obj_att_dim=64, z_dim=64, obj_size=32,
        clstm_layers=3, attribute_dim=106,
    )
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "fc_logvar" in name:
                p.zero_() if name.endswith("weight") else p.fill_(-40.0)
    ref.train()

    b, o_max, size, obj_size = 3, 5, 64, 32
    counts = [2, 4, 5]
    n_real = sum(counts)
    rng = np.random.RandomState(5)
    imgs = rng.randn(b, 3, size, size).astype(np.float32)

    def rand_boxes(r):
        xy0 = r.uniform(0.05, 0.5, (b, o_max, 2)).astype(np.float32)
        wh = r.uniform(0.15, 0.4, (b, o_max, 2)).astype(np.float32)
        return np.concatenate([xy0, np.minimum(xy0 + wh, 1.0)], -1).astype(np.float32)

    objs = rng.randint(0, 13, (b, o_max)).astype(np.int64)
    boxes = rand_boxes(rng)
    boxes_shift = rand_boxes(rng)  # genuinely different shift boxes
    attrs = (rng.rand(b, o_max, 106) < 0.1).astype(np.float32)
    z_rand = rng.randn(b, o_max, 64).astype(np.float32)
    valid = np.zeros((b, o_max), np.float32)
    for i, c in enumerate(counts):
        valid[i, :c] = 1.0
    masks = np.asarray(rasterize_boxes(jnp.asarray(boxes), size, size))[..., None]
    masks_shift = np.asarray(rasterize_boxes(jnp.asarray(boxes_shift), size, size))[..., None]

    # ---- reference forward: flat-packed real rows only, train mode
    sel = valid.reshape(-1).astype(bool)

    def pack(x):
        return np.ascontiguousarray(x.reshape((b * o_max,) + x.shape[2:])[sel])

    obj_to_img = np.repeat(np.arange(b), counts)
    t = torch.as_tensor
    with torch.no_grad():
        ref_out = ref(
            t(imgs), t(pack(objs)), t(pack(boxes)),
            t(pack(masks.transpose(0, 1, 4, 2, 3))), t(obj_to_img),
            t(pack(z_rand)), t(pack(attrs)),
            t(pack(masks_shift.transpose(0, 1, 4, 2, 3))), t(pack(boxes_shift)),
            t(pack(attrs)),
        )
    (r_crops, r_crops_rec, r_crops_rand, r_crops_shift, r_img_rec, r_img_rand,
     r_img_shift, r_mu, _r_logvar, r_z_rand_rec, r_z_rand_shift) = [
        x.numpy() for x in ref_out
    ]
    post_sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    # ---- ours: dense-padded, train mode, mutable batch stats.
    # The pre-forward weights must come from a state_dict captured BEFORE the
    # train forward mutates running stats — rebuild an identical module.
    torch.manual_seed(5)
    ref0 = RefGenerator(
        num_embeddings=13, obj_att_dim=64, z_dim=64, obj_size=32,
        clstm_layers=3, attribute_dim=106,
    )
    with torch.no_grad():
        for name, p in ref0.named_parameters():
            if "fc_logvar" in name:
                p.zero_() if name.endswith("weight") else p.fill_(-40.0)
    sd = {k: v.numpy() for k, v in ref0.state_dict().items()}
    params, stats = import_generator(sd, image_size=64, clstm_layers=3)
    model = Generator(num_classes=13, image_size=64, object_size=32, clstm_layers=3)
    batch = dict(
        imgs=jnp.asarray(imgs.transpose(0, 2, 3, 1)),
        objs=jnp.asarray(objs.astype(np.int32)),
        boxes=jnp.asarray(boxes),
        masks=jnp.asarray(masks),
        valid=jnp.asarray(valid),
        z_rand=jnp.asarray(z_rand),
        attribute=jnp.asarray(attrs),
        masks_shift=jnp.asarray(masks_shift),
        boxes_shift=jnp.asarray(boxes_shift),
        attribute_est=jnp.asarray(attrs),
    )
    out, mutated = model.apply(
        {"params": params, "batch_stats": stats},
        **batch,
        train=True,
        rngs={"reparam": jax.random.PRNGKey(11)},
        mutable=["batch_stats"],
    )

    def check_img(name, ours, theirs, atol=2e-3):
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), theirs, atol=atol, err_msg=name
        )

    def check_obj(name, ours, theirs, atol=2e-3, is_image=False):
        ours = np.asarray(ours).reshape((b * o_max,) + np.asarray(ours).shape[2:])[sel]
        if is_image:
            ours = ours.transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, theirs, atol=atol, err_msg=name)

    check_img("img_rec", out["img_rec"], r_img_rec)
    check_img("img_rand", out["img_rand"], r_img_rand)
    check_img("img_shift", out["img_shift"], r_img_shift)
    check_obj("mu", out["mu"].reshape(b, o_max, -1), r_mu)
    check_obj("z_rand_rec", out["z_rand_rec"].reshape(b, o_max, -1), r_z_rand_rec)
    check_obj("z_rand_shift", out["z_rand_shift"].reshape(b, o_max, -1), r_z_rand_shift)
    check_obj("crops_input", out["crops_input"], r_crops, is_image=True)
    check_obj("crops_input_rec", out["crops_input_rec"], r_crops_rec, is_image=True)
    check_obj("crops_rand", out["crops_rand"], r_crops_rand, is_image=True)
    check_obj("crops_shift", out["crops_shift"], r_crops_shift, is_image=True)

    # ---- updated running statistics must match the reference's
    _, ref_post_stats = import_generator(post_sd, image_size=64, clstm_layers=3)
    flat_ours = jax.tree_util.tree_flatten_with_path(mutated["batch_stats"])[0]
    flat_ref = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(ref_post_stats)[0]
    )
    assert len(flat_ours) == len(flat_ref)
    for path, ours_v in flat_ours:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(ours_v), flat_ref[key], rtol=1e-3, atol=2e-4, err_msg=key
        )


def test_discriminators_parity_vs_reference(reference_generator):
    _, torch = reference_generator
    import jax.numpy as jnp

    from models.discriminator import (  # reference, via sys.path
        AttributeDiscriminator as RefAttD,
        ImageDiscriminator as RefImgD,
        ObjectDiscriminator as RefObjD,
        add_sn,
    )

    from aglayout_tpu.models.discriminator import (
        AttributeDiscriminator,
        ImageDiscriminator,
        ObjectDiscriminator,
    )
    from aglayout_tpu.utils.torch_import import (
        import_attribute_discriminator,
        import_image_discriminator,
        import_object_discriminator,
    )

    torch.manual_seed(1)
    rng = np.random.RandomState(1)
    imgs = rng.randn(2, 3, 64, 64).astype(np.float32)
    crops = rng.randn(4, 3, 32, 32).astype(np.float32)

    def converge_sn(module, x):
        # real checkpoints carry converged power-iteration state; replicate
        module.train()
        with torch.no_grad():
            for _ in range(30):
                module(torch.as_tensor(x))
        module.eval()
        return module

    rd = converge_sn(add_sn(RefImgD(conv_dim=64)), imgs)
    with torch.no_grad():
        ref_out = rd(torch.as_tensor(imgs)).numpy()
    p, s = import_image_discriminator({k: v.numpy() for k, v in rd.state_dict().items()})
    ours = ImageDiscriminator().apply(
        {"params": p, "batch_stats": s}, jnp.asarray(imgs.transpose(0, 2, 3, 1)), False
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=2e-4)

    rd = converge_sn(add_sn(RefObjD(n_class=23)), crops)
    with torch.no_grad():
        r_src, r_cls = [x.numpy() for x in rd(torch.as_tensor(crops))]
    p, s = import_object_discriminator({k: v.numpy() for k, v in rd.state_dict().items()})
    src, cls = ObjectDiscriminator(n_class=23).apply(
        {"params": p, "batch_stats": s}, jnp.asarray(crops.transpose(0, 2, 3, 1)), False
    )
    np.testing.assert_allclose(np.asarray(src), r_src, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(cls), r_cls, rtol=2e-4, atol=1e-4)

    rd = converge_sn(add_sn(RefAttD(n_attribute=106)), crops)
    with torch.no_grad():
        ref_att = rd(torch.as_tensor(crops)).numpy()
    p, s = import_attribute_discriminator({k: v.numpy() for k, v in rd.state_dict().items()})
    att = AttributeDiscriminator(n_attribute=106).apply(
        {"params": p, "batch_stats": s}, jnp.asarray(crops.transpose(0, 2, 3, 1)), False
    )
    np.testing.assert_allclose(np.asarray(att), ref_att, rtol=2e-4, atol=1e-4)


def test_full_generator128_parity_vs_reference(reference_generator):
    """Same element-wise parity for the 128^2 model (pool + upsample tail,
    fused SPADE f=16 path)."""
    _, torch = reference_generator
    import jax
    import jax.numpy as jnp

    from models.generator_obj_att128 import Generator as RefGenerator128

    from aglayout_tpu.models.generator import Generator
    from aglayout_tpu.ops.rasterize import rasterize_boxes
    from aglayout_tpu.utils.torch_import import import_generator

    torch.manual_seed(3)
    ref = RefGenerator128(
        num_embeddings=11, obj_att_dim=64, z_dim=64, obj_size=64,
        clstm_layers=3, attribute_dim=106,
    )
    ref.eval()

    b, o, size, obj_size = 1, 3, 128, 64
    rng = np.random.RandomState(3)
    imgs = rng.randn(b, 3, size, size).astype(np.float32)
    objs = rng.randint(0, 11, (b, o)).astype(np.int64)
    xy0 = rng.uniform(0.05, 0.5, (b, o, 2)).astype(np.float32)
    wh = rng.uniform(0.15, 0.4, (b, o, 2)).astype(np.float32)
    boxes = np.concatenate([xy0, np.minimum(xy0 + wh, 1.0)], -1).astype(np.float32)
    attrs = (rng.rand(b, o, 106) < 0.1).astype(np.float32)
    z_rand = rng.randn(b, o, 64).astype(np.float32)
    masks = np.asarray(rasterize_boxes(jnp.asarray(boxes), size, size))[..., None]

    t = torch.as_tensor
    flat = lambda x: np.ascontiguousarray(x.reshape((b * o,) + x.shape[2:]))  # noqa: E731
    obj_to_img = np.repeat(np.arange(b), o)
    with torch.no_grad():
        ref_out = ref(
            t(imgs), t(flat(objs)), t(flat(boxes)),
            t(flat(masks.transpose(0, 1, 4, 2, 3))), t(obj_to_img),
            t(flat(z_rand)), t(flat(attrs)),
            t(flat(masks.transpose(0, 1, 4, 2, 3))), t(flat(boxes)), t(flat(attrs)),
        )
    r_img_rand = ref_out[5].numpy()
    r_mu = ref_out[7].numpy()
    r_z_rand_rec = ref_out[9].numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params, stats = import_generator(sd, image_size=128, clstm_layers=3)
    model = Generator(num_classes=11, image_size=128, object_size=64, clstm_layers=3)
    batch = dict(
        imgs=jnp.asarray(imgs.transpose(0, 2, 3, 1)),
        objs=jnp.asarray(objs.astype(np.int32)),
        boxes=jnp.asarray(boxes),
        masks=jnp.asarray(masks),
        valid=jnp.ones((b, o), jnp.float32),
        z_rand=jnp.asarray(z_rand),
        attribute=jnp.asarray(attrs),
        masks_shift=jnp.asarray(masks),
        boxes_shift=jnp.asarray(boxes),
        attribute_est=jnp.asarray(attrs),
    )
    out = model.apply(
        {"params": params, "batch_stats": stats},
        **batch,
        train=False,
        rngs={"reparam": jax.random.PRNGKey(7)},
    )
    np.testing.assert_allclose(
        np.asarray(out["img_rand"]).transpose(0, 3, 1, 2), r_img_rand, atol=3e-3
    )
    np.testing.assert_allclose(np.asarray(out["mu"]), r_mu, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["z_rand_rec"]), r_z_rand_rec, atol=2e-3)


def test_attribute_discriminator128_parity(reference_generator):
    _, torch = reference_generator
    import jax.numpy as jnp

    from models.discriminator import AttributeDiscriminator128 as RefAttD128, add_sn

    from aglayout_tpu.models.discriminator import AttributeDiscriminator
    from aglayout_tpu.utils.torch_import import import_attribute_discriminator

    torch.manual_seed(4)
    rng = np.random.RandomState(4)
    crops = rng.randn(2, 3, 64, 64).astype(np.float32)
    rd = add_sn(RefAttD128(n_attribute=106))
    rd.train()
    with torch.no_grad():
        for _ in range(30):
            rd(torch.as_tensor(crops))
    rd.eval()
    with torch.no_grad():
        ref = rd(torch.as_tensor(crops)).numpy()
    p, s = import_attribute_discriminator(
        {k: v.numpy() for k, v in rd.state_dict().items()}, extra_block=True
    )
    ours = AttributeDiscriminator(n_attribute=106, extra_block=True).apply(
        {"params": p, "batch_stats": s}, jnp.asarray(crops.transpose(0, 2, 3, 1)), False
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=1e-4)
