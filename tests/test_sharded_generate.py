"""Data-parallel serving: Generator.generate sharded over a device mesh.

Eval-mode generate has no cross-batch reductions (BN uses running stats,
no CropEncoder on real images), so a batch-sharded generate must match the
single-device output exactly, shard by shard. The reference serves on one
hardcoded GPU (test64.py:76-265); `parallel.mesh.make_sharded_generate` is
the TPU scale-out equivalent, tested here on the 8-virtual-CPU-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.config import Config
from aglayout_tpu.models.generator import Generator
from aglayout_tpu.parallel.mesh import make_mesh, make_sharded_generate, replicated
from aglayout_tpu.train.state import Models, create_train_state

pytestmark = pytest.mark.slow  # ~80 s cold compile on a 1-core host


def test_sharded_generate_matches_single_device():
    cfg = Config(
        batch_size=8,
        max_objects=3,
        image_size=64,
        object_size=32,
        num_classes=12,
        attribute_dim=106,
        clstm_layers=1,
        resi_num=1,
    )
    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    variables = {"params": state.g.params, "batch_stats": state.g.stats}

    b, o = cfg.batch_size, cfg.max_objects
    rng = np.random.RandomState(3)
    objs = jnp.asarray(rng.randint(0, cfg.num_classes, (b, o)), jnp.int32)
    xy0 = rng.uniform(0, 0.6, (b, o, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.4, (b, o, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy0, np.minimum(xy0 + wh, 1.0)], -1))
    valid = jnp.ones((b, o), jnp.float32)
    z = jnp.asarray(rng.randn(b, o, cfg.z_dim).astype(np.float32))
    attr = jnp.asarray((rng.rand(b, o, cfg.attribute_dim) < 0.05).astype(np.float32))

    mesh = make_mesh()  # all 8 virtual devices
    gen = make_sharded_generate(models.generator, mesh)
    vars_repl = jax.device_put(variables, replicated(mesh))
    out_sharded = gen(vars_repl, objs, boxes, valid, z, attr)
    assert out_sharded.shape == (b, cfg.image_size, cfg.image_size, 3)
    # output really is sharded over the mesh (one sample per device)
    assert len(out_sharded.sharding.device_set) == 8

    out_single = jax.jit(
        lambda v, *a: models.generator.apply(v, *a, method=Generator.generate)
    )(variables, objs, boxes, valid, z, attr)

    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_single), rtol=0, atol=1e-5
    )


def test_sharded_generate_128_phase_dc_matches_single_device():
    """phase_dc (parity-split dc1..dc3 + folded-up2 c5) composes with the
    batch-sharded generate: pure conv/layout ops, so GSPMD shards them on
    batch with no collectives. phase_dc is opt-in (default OFF after the
    round-4 TPU A/B measured it a regression); this guards the opt-in
    config at 128^2."""
    cfg = Config(
        batch_size=8,
        max_objects=3,
        image_size=128,
        object_size=64,
        num_classes=12,
        attribute_dim=106,
        clstm_layers=1,
        resi_num=1,
        conv_dim=16,
        d_conv_dim=16,
        phase_dc=True,
    )
    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    variables = {"params": state.g.params, "batch_stats": state.g.stats}

    b, o = cfg.batch_size, cfg.max_objects
    rng = np.random.RandomState(4)
    objs = jnp.asarray(rng.randint(0, cfg.num_classes, (b, o)), jnp.int32)
    xy0 = rng.uniform(0, 0.6, (b, o, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.4, (b, o, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy0, np.minimum(xy0 + wh, 1.0)], -1))
    valid = jnp.ones((b, o), jnp.float32)
    z = jnp.asarray(rng.randn(b, o, cfg.z_dim).astype(np.float32))
    attr = jnp.asarray((rng.rand(b, o, cfg.attribute_dim) < 0.05).astype(np.float32))

    mesh = make_mesh()
    gen = make_sharded_generate(models.generator, mesh)
    vars_repl = jax.device_put(variables, replicated(mesh))
    out_sharded = gen(vars_repl, objs, boxes, valid, z, attr)
    assert out_sharded.shape == (b, 128, 128, 3)

    out_single = jax.jit(
        lambda v, *a: models.generator.apply(v, *a, method=Generator.generate)
    )(variables, objs, boxes, valid, z, attr)
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_single), rtol=0, atol=1e-5
    )
