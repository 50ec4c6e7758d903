"""On-device attribute estimation and swapping.

The reference does both with host-side Python row loops per iteration
(train64.py:155-188, test64.py:127-138) — a GPU<->CPU ping-pong per step.
Here both are vectorized masked array ops that live inside the jitted train
step (SURVEY.md §7 hard part #5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def estimate_attributes(att_logits, attribute, valid):
    """Densify missing attribute labels with the classifier's argmax.

    Reference train64.py:155-166: objects with no GT attribute get the
    argmax prediction of netD_att on their real crop set to 1.

    att_logits: (N, A) from the attribute discriminator on real crops;
    attribute: (N, A) multi-hot GT; valid: (N,) row mask.
    Returns attribute_est (N, A).
    """
    has_gt = jnp.sum(attribute, axis=-1) > 0
    need = (~has_gt) & (valid > 0)
    add = jax.nn.one_hot(jnp.argmax(att_logits, axis=-1), attribute.shape[-1], dtype=attribute.dtype)
    return jnp.where(need[:, None], jnp.maximum(attribute, add), attribute)


def swap_attributes(rng, matrix, attribute, attribute_est, objs, valid, batch_size: int, o_max: int):
    """Re-sample attributes for half the objects of the first B//3 images.

    Reference train64.py:169-188: for each image idx < floor(B/3), the first
    floor(n_objs/2) of its objects get 1-2 new attributes drawn from the
    object<->attribute co-occurrence matrix with the old attributes' weights
    zeroed; both `attribute` and `attribute_est` rows are replaced by the
    new one-hot set. Images 0..B//3-1 are later excluded from the image
    reconstruction loss.

    All inputs flat: attribute (N=B*O, A); objs (N,); valid (N,).
    matrix: (num_classes, A) co-occurrence counts (float).
    Returns (attribute, attribute_est, num_img_to_change).
    """
    n, a = attribute.shape
    num_img_to_change = batch_size // 3

    img_idx = jnp.arange(n) // o_max
    slot_idx = jnp.arange(n) % o_max
    n_valid = jnp.sum(valid.reshape(batch_size, o_max), axis=1)  # (B,)
    half = jnp.floor(n_valid / 2.0)
    change = (
        (img_idx < num_img_to_change)
        & (slot_idx < jnp.take(half, img_idx))
        & (valid > 0)
    )

    weights = jnp.take(matrix, objs, axis=0) * (1.0 - attribute)  # zero old attrs
    # guard rows whose weights vanish (reference would raise; never observed)
    safe = jnp.where(jnp.sum(weights, axis=-1, keepdims=True) > 0, weights, jnp.ones_like(weights))
    logits = jnp.log(jnp.maximum(safe, 1e-20))
    k1, k2, k3 = jax.random.split(rng, 3)
    draw1 = jax.random.categorical(k1, logits, axis=-1)
    draw2 = jax.random.categorical(k2, logits, axis=-1)
    two = jax.random.bernoulli(k3, 0.5, (n,))  # k = randrange(1, 3) ∈ {1, 2}
    new_att = jax.nn.one_hot(draw1, a, dtype=attribute.dtype)
    new_att = jnp.clip(new_att + two[:, None] * jax.nn.one_hot(draw2, a, dtype=attribute.dtype), 0, 1)

    attribute_out = jnp.where(change[:, None], new_att, attribute)
    attribute_est_out = jnp.where(change[:, None], new_att, attribute_est)
    return attribute_out, attribute_est_out, num_img_to_change
