"""Normalization layers with exact torch-BatchNorm semantics + masking.

The reference model is BatchNorm everywhere (plain, class-conditional, and
SPADE's parameter-free BN). Three requirements drive this implementation:

1. **torch semantics** for checkpoint parity: train mode normalizes with the
   biased batch variance and updates running stats with the *unbiased*
   variance at momentum 0.1; eval mode uses running stats
   (ConditionalBatchNorm at reference models/generator_obj_att.py:31-44,
   SPADE at models/spade/networks/normalization.py:66-108).
2. **masking**: the reference's object-level tensors contain only real
   objects; our dense (B, O_max) layout contains padded slots that must not
   contaminate batch statistics.
3. **cross-replica stats**: under GSPMD data parallelism the batch axis is
   sharded, and the global sums below are computed with XLA collectives
   automatically — the TPU-native upgrade of the reference's vendored,
   never-wired SyncBatchNorm (models/spade/networks/sync_batchnorm/).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all leading axes with optional per-row validity mask.

    x: (N, ..., C). mask: (N,) float/bool or None. Works for both 2-D
    (BatchNorm1d) and 4-D NHWC (BatchNorm2d) inputs.
    """

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    affine: bool = True
    dtype: jnp.dtype | None = None

    def setup(self):
        self.ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        self.ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        if self.affine:
            self.scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
            self.bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

    def eval_affine(self):
        """(a, b) such that eval-mode BN(x) == a * x + b (per channel)."""
        a = jax.lax.rsqrt(self.ra_var.value + self.epsilon)
        b = -self.ra_mean.value * a
        if self.affine:
            a = a * self.scale
            b = b * self.scale + self.bias
        return a, b

    def __call__(self, x, mask=None, use_running_average: bool = False):
        ra_mean, ra_var = self.ra_mean, self.ra_var
        reduce_axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                cnt = jnp.asarray(
                    jnp.prod(jnp.asarray(x.shape[:-1])), jnp.float32
                )
                mean = jnp.mean(xf, axis=reduce_axes)
                mean2 = jnp.mean(xf * xf, axis=reduce_axes)
            else:
                m = mask.astype(jnp.float32).reshape(
                    mask.shape + (1,) * (x.ndim - mask.ndim)
                )
                per_row = jnp.asarray(
                    jnp.prod(jnp.asarray(x.shape[mask.ndim : -1])), jnp.float32
                )
                cnt = jnp.sum(m) * per_row
                mean = jnp.sum(xf * m, axis=reduce_axes) / cnt
                mean2 = jnp.sum(xf * xf * m, axis=reduce_axes) / cnt
            var = mean2 - mean * mean  # biased, used for normalization (torch)
            if not self.is_initializing():
                mom = self.momentum
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - mom) * ra_mean.value + mom * mean
                ra_var.value = (1 - mom) * ra_var.value + mom * unbiased

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            y = y * self.scale + self.bias
        return y.astype(self.dtype or x.dtype)


def _cbn_embed_init(key, shape, dtype=jnp.float32):
    """Scale half ~ N(1, 0.02), bias half zero (reference
    generator_obj_att.py:37-38)."""
    num_classes, twoc = shape
    c = twoc // 2
    scale = 1.0 + 0.02 * jax.random.normal(key, (num_classes, c), dtype)
    return jnp.concatenate([scale, jnp.zeros((num_classes, c), dtype)], axis=1)


class ConditionalBatchNorm(nn.Module):
    """BN (affine-free) + per-class affine from an embedding table.

    Reference: models/generator_obj_att.py:31-44. Conditioned on object
    class everywhere in the generator encoders.
    """

    features: int
    num_classes: int
    dtype: jnp.dtype | None = None

    def setup(self):
        self.bn = MaskedBatchNorm(self.features, affine=False, dtype=self.dtype)
        self.embed = nn.Embed(
            self.num_classes,
            2 * self.features,
            embedding_init=_cbn_embed_init,
            param_dtype=jnp.float32,
        )

    def eval_affine(self, y):
        """Per-row (a, b) with eval-mode CBN(x, y) == a * x + b (channelwise)."""
        a0, b0 = self.bn.eval_affine()
        gamma, beta = jnp.split(self.embed(y), 2, axis=-1)
        return gamma * a0, gamma * b0 + beta

    def __call__(self, x, y, mask=None, use_running_average: bool = False):
        out = self.bn(x, mask, use_running_average)
        gamma, beta = jnp.split(self.embed(y), 2, axis=-1)
        shape = gamma.shape[:1] + (1,) * (x.ndim - 2) + gamma.shape[-1:]
        return out * gamma.reshape(shape).astype(out.dtype) + beta.reshape(shape).astype(out.dtype)


class SPADE(nn.Module):
    """Spatially-adaptive denormalization conditioned on the layout feature.

    Reference: models/spade/networks/normalization.py:66-108 with
    param_free_norm_type='batch', ks=3, nhidden=128. The segmap here is the
    generator's own 8x8 layout feature, nearest-resized to x's spatial size.
    """

    norm_features: int
    nhidden: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, segmap, use_running_average: bool = False):
        from aglayout_tpu.models.layers import Conv2d

        normalized = MaskedBatchNorm(
            self.norm_features, affine=False, dtype=self.dtype, name="param_free_norm"
        )(x, None, use_running_average)

        # nearest-resize segmap (B, h, w, C) to x's (H, W). Decoder sizes are
        # integer multiples of the 8x8 layout grid, so repetition is exact and
        # matches torch F.interpolate(mode='nearest').
        h, w = segmap.shape[1], segmap.shape[2]
        H, W = x.shape[1], x.shape[2]
        if H % h == 0 and W % w == 0:
            seg = jnp.repeat(jnp.repeat(segmap, H // h, axis=1), W // w, axis=2)
        else:
            idx_h = (jnp.arange(H) * h) // H
            idx_w = (jnp.arange(W) * w) // W
            seg = segmap[:, idx_h][:, :, idx_w]

        actv = nn.relu(Conv2d(self.nhidden, 3, padding=1, dtype=self.dtype, name="mlp_shared")(seg))
        gamma = Conv2d(self.norm_features, 3, padding=1, dtype=self.dtype, name="mlp_gamma")(actv)
        beta = Conv2d(self.norm_features, 3, padding=1, dtype=self.dtype, name="mlp_beta")(actv)
        return normalized * (1 + gamma) + beta
