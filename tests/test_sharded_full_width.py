"""Full-width (conv_dim=64) sharded train step on a 2-device CPU mesh.

Round-3 verdict: multi-device correctness was only proven at toy width
(conv_dim=8 dryrun, small_config 8-device test) — width-dependent GSPMD
sharding/layout bugs (e.g. a reduction dim that only splits badly at 64+
channels, BN global-batch stats at real widths) would slip through. Two
virtual devices keep the CPU-collective rendezvous cost ~4x below the
8-device full-width case while exercising the production parameter shapes.
Reference capability: SURVEY §2.17 (train64.py DataParallel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.config import Config
from aglayout_tpu.data.synthetic import synthetic_batch, synthetic_cooccurrence
from aglayout_tpu.data.vocab import attribute_pos_weight
from aglayout_tpu.train.state import Models, create_train_state
from aglayout_tpu.train.step import make_train_step

pytestmark = pytest.mark.slow


def test_sharded_train_step_full_width_2_devices():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # full production widths (conv_dim=64, d_conv_dim=64, 3 clstm layers,
    # 6 residual blocks); batch 2 so each device carries one sample
    cfg = Config(batch_size=2, max_objects=3, image_size=64, object_size=32,
                 num_classes=12, attribute_dim=106)
    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    matrix = synthetic_cooccurrence(rng, cfg.num_classes, cfg.attribute_dim)
    pw = attribute_pos_weight()

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    batch_np = synthetic_batch(rng, 2, cfg.max_objects, cfg.image_size, cfg.num_classes)
    batch = {k: jax.device_put(jnp.asarray(v), data_sh) for k, v in batch_np.items()}
    state_sh = jax.device_put(state, repl)

    step = jax.jit(
        make_train_step(cfg, models, matrix, pw),
        in_shardings=(repl, data_sh),
        out_shardings=(repl, repl),
    )
    new_state, metrics = step(state_sh, batch)
    assert np.isfinite(float(metrics["G/loss"]))
    assert np.isfinite(float(metrics["D/loss"]))

    # parity vs the identical step on one device
    step1 = jax.jit(make_train_step(cfg, models, matrix, pw))
    state1 = jax.device_put(state, jax.devices()[0])
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, metrics1 = step1(state1, batch1)
    np.testing.assert_allclose(
        float(metrics["G/loss"]), float(metrics1["G/loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(metrics["D/loss"]), float(metrics1["D/loss"]), rtol=2e-4
    )

    # params on all four nets moved, and BN stats are finite at full width
    for name in ("g", "d_image", "d_object", "d_att"):
        old = jax.tree.leaves(getattr(state_sh, name).params)
        new = jax.tree.leaves(getattr(new_state, name).params)
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        )
        assert changed, name
    for leaf in jax.tree.leaves(new_state.g.stats):
        assert np.isfinite(np.asarray(leaf)).all()
