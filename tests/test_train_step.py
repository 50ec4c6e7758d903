"""Train-step integration tests: loss finiteness, param updates, sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.config import Config
from aglayout_tpu.data.synthetic import synthetic_batch, synthetic_cooccurrence
from aglayout_tpu.data.vocab import attribute_pos_weight
from aglayout_tpu.train.state import Models, create_train_state, param_count
from aglayout_tpu.train.step import make_train_step


def small_config(**kw):
    base = dict(
        batch_size=3,
        max_objects=3,
        image_size=64,
        object_size=32,
        num_classes=12,
        attribute_dim=106,
        clstm_layers=1,
        resi_num=1,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = small_config()
    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    matrix = synthetic_cooccurrence(rng, cfg.num_classes, cfg.attribute_dim)
    pw = attribute_pos_weight()
    step = jax.jit(make_train_step(cfg, models, matrix, pw))
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(
            rng, cfg.batch_size, cfg.max_objects, cfg.image_size, cfg.num_classes
        ).items()
    }
    return cfg, models, state, step, batch


def test_train_step_runs_and_losses_finite(setup):
    cfg, models, state, step, batch = setup
    new_state, metrics = step(state, batch)
    images = metrics.pop("images")
    for name, img in images.items():
        assert np.isfinite(np.asarray(img)).all(), name
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    # all four nets' params must actually change
    for name in ("g", "d_image", "d_object", "d_att"):
        old = jax.tree.leaves(getattr(state, name).params)
        new = jax.tree.leaves(getattr(new_state, name).params)
        changed = any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new))
        assert changed, f"{name} params did not update"
    assert int(new_state.step) == 1
    # expected metric names (reference train64.py:265-272, 372-379)
    expected = {
        "D/loss",
        "D/image_adv_loss_real",
        "D/image_adv_loss_fake",
        "D/object_adv_loss_real",
        "D/object_adv_loss_fake",
        "D/object_cls_loss_real",
        "D/object_att_cls_loss",
        "G/loss",
        "G/image_adv_loss",
        "G/object_adv_loss",
        "G/object_cls_loss",
        "G/rec_img",
        "G/rec_z",
        "G/kl",
        "G/object_att_cls_loss",
    }
    assert expected == set(metrics)


def test_multiple_steps_stable(setup):
    cfg, models, state, step, batch = setup
    for _ in range(2):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["G/loss"]))
    assert np.isfinite(float(metrics["D/loss"]))
    # BN running stats moved away from init
    bn_mean = state.g.stats["decoder"]["spade_0"]["param_free_norm"]["mean"]
    assert float(jnp.abs(bn_mean).sum()) > 0


def test_sharded_train_step_8_devices():
    """GSPMD data parallelism over the 8-device CPU mesh: global batch 8
    sharded 8 ways; BN stats become global automatically."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = small_config(batch_size=8, max_objects=2)
    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    matrix = synthetic_cooccurrence(rng, cfg.num_classes, cfg.attribute_dim)
    pw = attribute_pos_weight()

    mesh = Mesh(np.array(jax.devices()), ("data",))
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    batch_np = synthetic_batch(rng, 8, cfg.max_objects, cfg.image_size, cfg.num_classes)
    batch = {k: jax.device_put(jnp.asarray(v), data_sh) for k, v in batch_np.items()}
    state = jax.device_put(state, repl)

    step = jax.jit(
        make_train_step(cfg, models, matrix, pw),
        in_shardings=(repl, data_sh),
        out_shardings=(repl, repl),
    )
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["G/loss"]))
    assert np.isfinite(float(metrics["D/loss"]))

    # parity: the sharded step must equal the single-device step
    step1 = jax.jit(make_train_step(cfg, models, matrix, pw))
    state1 = jax.device_put(jax.device_put(state, repl), jax.devices()[0])
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    new_state1, metrics1 = step1(state1, batch1)
    np.testing.assert_allclose(
        float(metrics["G/loss"]), float(metrics1["G/loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(metrics["D/loss"]), float(metrics1["D/loss"]), rtol=2e-4
    )


def test_param_count_reasonable(setup):
    cfg, models, state, step, batch = setup
    counts = param_count(state)
    assert counts["g"] > 1_000_000
    assert counts["d_image"] > 1_000_000
