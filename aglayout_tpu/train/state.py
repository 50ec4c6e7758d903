"""Train state: all four networks + their optimizers in one pytree.

Fixes the reference's silent Adam reset on resume (SURVEY.md §5.4): optimizer
moments, the RNG key, and the step counter are part of the checkpointed
state.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from aglayout_tpu.config import Config
from aglayout_tpu.models import (
    AttributeDiscriminator,
    Generator,
    ImageDiscriminator,
    ObjectDiscriminator,
)


class NetState(flax.struct.PyTreeNode):
    params: Any
    stats: Any  # batch_stats: BN running stats + spectral-norm u/v
    opt: Any


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    rng: jax.Array
    g: NetState
    d_image: NetState
    d_object: NetState
    d_att: NetState


class Models:
    """Static bundle: module definitions + optimizer (not a pytree)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.bf16 else None

        def tpu_auto(flag):
            return flag if flag is not None else jax.default_backend() == "tpu"

        self.generator = Generator(
            num_classes=cfg.num_classes,
            attribute_dim=cfg.attribute_dim,
            embedding_dim=cfg.embedding_dim,
            z_dim=cfg.z_dim,
            image_size=cfg.image_size,
            object_size=cfg.object_size,
            clstm_layers=cfg.clstm_layers,
            resi_num=cfg.resi_num,
            conv_dim=cfg.conv_dim,
            pallas_heads=tpu_auto(cfg.pallas_heads),
            int8_serving=cfg.int8_serving,
            pallas_apply8=tpu_auto(cfg.pallas_apply8),
            pallas_compact_heads=tpu_auto(cfg.pallas_compact_heads),
            pallas_grouped_heads=tpu_auto(cfg.pallas_grouped_heads),
            pallas_trunk=tpu_auto(cfg.pallas_trunk),
            # NOT tpu_auto: a round-4 TPU A/B measured auto-on phase_dc a 19%
            # serving regression (2,550 vs 3,162 img/s at 128^2 b=128), so
            # None resolves to OFF; pass True explicitly to opt in.
            phase_dc=bool(cfg.phase_dc),
            clstm_eval_unroll=cfg.clstm_unroll if cfg.clstm_unroll is not None else 1,
            dtype=dtype,
        )
        self.d_image = ImageDiscriminator(conv_dim=cfg.d_conv_dim, dtype=dtype)
        self.d_object = ObjectDiscriminator(
            n_class=cfg.num_classes, conv_dim=cfg.d_conv_dim, dtype=dtype
        )
        self.d_att = AttributeDiscriminator(
            n_attribute=cfg.attribute_dim,
            conv_dim=cfg.d_conv_dim,
            extra_block=(cfg.image_size == 128),
            dtype=dtype,
        )
        # Adam(lr, betas=(0.5, 0.999)) for every net (train64.py:111-114)
        self.tx = optax.adam(cfg.learning_rate, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8)


def dummy_batch(cfg: Config, batch_size: int | None = None):
    b = batch_size or cfg.batch_size
    o, s = cfg.max_objects, cfg.image_size
    return {
        "imgs": jnp.zeros((b, s, s, 3), jnp.float32),
        "objs": jnp.zeros((b, o), jnp.int32),
        "boxes": jnp.tile(jnp.asarray([0.25, 0.25, 0.75, 0.75], jnp.float32), (b, o, 1)),
        "masks": jnp.ones((b, o, s, s, 1), jnp.float32),
        "valid": jnp.ones((b, o), jnp.float32),
        "attribute": jnp.zeros((b, o, cfg.attribute_dim), jnp.float32),
        "masks_shift": jnp.ones((b, o, s, s, 1), jnp.float32),
        "boxes_shift": jnp.tile(jnp.asarray([0.25, 0.25, 0.75, 0.75], jnp.float32), (b, o, 1)),
    }


def create_train_state(cfg: Config, models: Models, rng: jax.Array) -> TrainState:
    batch = dummy_batch(cfg, batch_size=2)
    kg, ki, ko, ka, kr, knext = jax.random.split(rng, 6)
    o, s = cfg.max_objects, cfg.object_size

    gv = jax.jit(models.generator.init, static_argnames=("train",))(
        {"params": kg, "reparam": kr},
        **batch,
        z_rand=jnp.zeros((2, o, cfg.z_dim), jnp.float32),
        attribute_est=batch["attribute"],
        train=True,
    )
    iv = jax.jit(models.d_image.init)(ki, batch["imgs"])
    ov = jax.jit(models.d_object.init)(ko, jnp.zeros((2 * o, s, s, 3), jnp.float32))
    av = jax.jit(models.d_att.init)(ka, jnp.zeros((2 * o, s, s, 3), jnp.float32))

    def net(v):
        return NetState(
            params=v["params"],
            stats=v.get("batch_stats", {}),
            opt=models.tx.init(v["params"]),
        )

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        rng=knext,
        g=net(gv),
        d_image=net(iv),
        d_object=net(ov),
        d_att=net(av),
    )


def create_train_state_fast(cfg: Config, models: Models, seed: int = 0) -> TrainState:
    """Shape-only state construction for dry runs and sharding tests.

    `create_train_state` XLA-compiles all four `Module.init` forwards; on the
    1-core grading host those four compiles alone cost ~2.5 minutes — dead
    weight for the multi-chip dry run, which only validates the *train step's*
    collectives and shardings (width- and value-independent). This variant
    traces the same inits with `jax.eval_shape` (no compile, no execution) and
    fills the leaves with seeded host-side values: N(0, 0.1) floats (nonzero so
    spectral-norm u/v power iteration is well-defined), |N|+0.5 for BN running
    variances (rsqrt stays tame), zeros for integers. NOT for training — real
    runs need `create_train_state`'s torch-default init parity.
    """
    batch = dummy_batch(cfg, batch_size=2)
    key = jax.random.PRNGKey(seed)
    o, s = cfg.max_objects, cfg.object_size

    gv = jax.eval_shape(
        lambda: models.generator.init(
            {"params": key, "reparam": key},
            **batch,
            z_rand=jnp.zeros((2, o, cfg.z_dim), jnp.float32),
            attribute_est=batch["attribute"],
            train=True,
        )
    )
    iv = jax.eval_shape(lambda: models.d_image.init(key, batch["imgs"]))
    crops = jnp.zeros((2 * o, s, s, 3), jnp.float32)
    ov = jax.eval_shape(lambda: models.d_object.init(key, crops))
    av = jax.eval_shape(lambda: models.d_att.init(key, crops))

    rng = np.random.RandomState(seed)

    def fill(tree):
        def leaf(path, x):
            if not jnp.issubdtype(x.dtype, jnp.floating):
                return jnp.zeros(x.shape, x.dtype)
            v = rng.normal(0.0, 0.1, x.shape)
            if any("var" in str(getattr(p, "key", p)).lower() for p in path):
                v = np.abs(v) + 0.5
            return jnp.asarray(v, x.dtype)

        return jax.tree_util.tree_map_with_path(leaf, tree)

    def net(v):
        params = fill(v["params"])
        return NetState(
            params=params, stats=fill(v.get("batch_stats", {})), opt=models.tx.init(params)
        )

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(seed + 1),
        g=net(gv),
        d_image=net(iv),
        d_object=net(ov),
        d_att=net(av),
    )


def param_count(state: TrainState) -> dict:
    return {
        name: int(sum(np.prod(x.shape) for x in jax.tree.leaves(getattr(state, name).params)))
        for name in ("g", "d_image", "d_object", "d_att")
    }
