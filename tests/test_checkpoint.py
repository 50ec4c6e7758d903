"""Checkpoint round-trip: full train state (params+stats+opt+rng+step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.config import Config
from aglayout_tpu.train.state import Models, create_train_state
from aglayout_tpu.utils.checkpoint import restore_state, save_state

pytestmark = pytest.mark.quick


def test_checkpoint_roundtrip(tmp_path):
    cfg = Config(
        batch_size=2, max_objects=2, image_size=64, object_size=32,
        num_classes=7, clstm_layers=1, resi_num=1,
    )
    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    state = state.replace(step=jnp.asarray(123, jnp.int32))

    save_state(str(tmp_path), 123, state)

    fresh = create_train_state(cfg, models, jax.random.PRNGKey(1))
    restored, step = restore_state(str(tmp_path), fresh, "l")
    assert step == 123
    assert int(restored.step) == 123
    for a, b in zip(jax.tree.leaves(state.g.params), jax.tree.leaves(restored.g.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too (fixes the reference's silent Adam reset)
    for a, b in zip(jax.tree.leaves(state.d_image.opt), jax.tree.leaves(restored.d_image.opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # rng key restored
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(state.rng)) if hasattr(jax.random, "key_data") else np.asarray(state.rng),
        np.asarray(jax.random.key_data(restored.rng)) if hasattr(jax.random, "key_data") else np.asarray(restored.rng),
    )


def test_restore_scratch_and_missing(tmp_path):
    cfg = Config(
        batch_size=2, max_objects=2, image_size=64, object_size=32,
        num_classes=7, clstm_layers=1, resi_num=1,
    )
    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    out, step = restore_state(str(tmp_path / "nope"), state, "l")
    assert step == 0
    out, step = restore_state(str(tmp_path), state, "s")
    assert step == 0
