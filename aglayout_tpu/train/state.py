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
            pallas_heads=(
                cfg.pallas_heads
                if cfg.pallas_heads is not None
                else jax.default_backend() == "tpu"
            ),
            int8_serving=cfg.int8_serving,
            pallas_apply8=cfg.pallas_apply8,
            pallas_compact_heads=cfg.pallas_compact_heads,
            pallas_grouped_heads=cfg.pallas_grouped_heads,
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


def param_count(state: TrainState) -> dict:
    return {
        name: int(sum(np.prod(x.shape) for x in jax.tree.leaves(getattr(state, name).params)))
        for name in ("g", "d_image", "d_object", "d_att")
    }
