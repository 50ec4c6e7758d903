"""GAN losses with exact reference semantics under dense padded objects.

Every loss mirrors train64.py/train128.py (identical files): non-saturating
sigmoid cross-entropy adversarial losses (NOT hinge — the hinge code in the
reference's vendored SPADE tree is dead), 0.4/0.4/0.2 rec/rand/shift branch
weighting, pos-weighted attribute BCE restricted to annotated objects,
masked L1 image reconstruction excluding attribute-swapped images, latent
reconstruction L1, and the VAE KL term.

Masking rules: the reference's flat object tensors contain only real
objects, so its plain `.mean()` reductions become masked means here; the KL
term is a *sum* over real objects (train64.py:294-295), so padded slots are
zeroed, not averaged.
"""

from __future__ import annotations

import jax.numpy as jnp


def bce_logits(logits, target, weight=None, pos_weight=None):
    """binary_cross_entropy_with_logits, elementwise mean over `weight`.

    target is a constant (0.0/1.0) or an array; `weight` is an optional
    per-row mask (rows weighted 0 contribute nothing, denominator counts
    only weighted rows x feature dims); `pos_weight` multiplies the positive
    term per feature (torch semantics: loss = -[pw*y*log σ(x) +
    (1-y)*log(1-σ(x))]).
    """
    logits = logits.astype(jnp.float32)
    target = jnp.broadcast_to(jnp.asarray(target, jnp.float32), logits.shape)
    # numerically stable: max(x,0) - x*y + log(1+exp(-|x|)), with pos_weight
    log_sig = jnp.log1p(jnp.exp(-jnp.abs(logits))) + jnp.maximum(-logits, 0.0)  # -log σ(x)
    log_one_minus = jnp.log1p(jnp.exp(-jnp.abs(logits))) + jnp.maximum(logits, 0.0)  # -log(1-σ(x))
    pw = 1.0 if pos_weight is None else jnp.asarray(pos_weight, jnp.float32)
    loss = pw * target * log_sig + (1.0 - target) * log_one_minus
    if weight is None:
        return jnp.mean(loss)
    w = weight.astype(jnp.float32)
    w = w.reshape(w.shape + (1,) * (loss.ndim - w.ndim))
    denom = jnp.sum(w) * (loss.size / w.size)
    return jnp.sum(loss * w) / jnp.maximum(denom, 1.0)


def _logsumexp(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True))


def cross_entropy(logits, labels, weight=None):
    """F.cross_entropy with optional per-row mask (masked mean)."""
    logits = logits.astype(jnp.float32)
    logp = logits - _logsumexp(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if weight is None:
        return jnp.mean(nll)
    w = weight.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def masked_l1_image_rec(img_rec, imgs, num_img_to_change: int):
    """Masked L1 reconstruction (train64.py:284-287): the first
    num_img_to_change images (their attributes were swapped) are excluded;
    normalizer is the kept-image count."""
    b = imgs.shape[0]
    per_image = jnp.mean(
        jnp.abs(img_rec.astype(jnp.float32) - imgs.astype(jnp.float32)).reshape(b, -1), axis=1
    )
    keep = (jnp.arange(b) >= num_img_to_change).astype(jnp.float32)
    return jnp.sum(per_image * keep) / (b - num_img_to_change)


def z_rec_loss(z_rand_rec, z_rand_shift, z, valid_flat):
    """0.5 * L1(z_rand_rec, z) + 0.5 * L1(z_rand_shift, z), masked mean
    over valid object rows (train64.py:289-291)."""
    w = valid_flat.astype(jnp.float32)[:, None]
    denom = jnp.maximum(jnp.sum(w) * z.shape[-1], 1.0)
    rand = jnp.sum(jnp.abs(z_rand_rec - z) * w) / denom
    shift = jnp.sum(jnp.abs(z_rand_shift - z) * w) / denom
    return 0.5 * rand + 0.5 * shift


def kl_loss(mu, logvar, valid_flat):
    """-0.5 * sum(1 + logvar - mu^2 - exp(logvar)) over valid rows
    (train64.py:294-295 — a raw sum, not a mean)."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    elt = 1.0 + logvar - mu * mu - jnp.exp(logvar)
    w = valid_flat.astype(jnp.float32)[:, None]
    return -0.5 * jnp.sum(elt * w)


def branch_weighted(rec, rand, shift):
    """The 0.4/0.4/0.2 rec/rand/shift weighting used for every adversarial
    and auxiliary loss across branches (train64.py:208,229,313,351-354)."""
    return 0.4 * rec + 0.4 * rand + 0.2 * shift
