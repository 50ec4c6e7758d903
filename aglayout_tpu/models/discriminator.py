"""SNGAN-style discriminators with spectral normalization.

Capability parity with the reference's models/discriminator.py:
  * ImageDiscriminator (184-230): 5 pre-act resblocks 3->1024ch, spatial
    sum, bias-free linear -> 1 logit.
  * ObjectDiscriminator (233-278): same trunk on object crops; real/fake
    head + n_class-way auxiliary classifier head.
  * AttributeDiscriminator (144-181) and AttributeDiscriminator128
    (102-141): trunk -> 106 attribute logits; the 128 variant adds one
    extra downsampling block for 64x64 crops. Expressed here as one module
    with `extra_block`.
  * add_sn (15-22): every conv/linear spectrally normalized — here each
    layer is an SNConv2d/SNDense with torch-exact power iteration (state in
    the 'batch_stats' collection; `update_stats` threaded per call).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from aglayout_tpu.models.layers import avg_pool2
from aglayout_tpu.models.sn import SNConv2d, SNDense


class OptimizedBlock(nn.Module):
    """First block: conv-relu-conv(-pool) + (pool-)1x1 shortcut.

    Reference: models/discriminator.py:29-60.
    """

    features: int
    downsample: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        h = SNConv2d(self.features, 3, padding=1, dtype=self.dtype, name="conv1")(x, update_stats)
        h = nn.relu(h)
        h = SNConv2d(self.features, 3, padding=1, dtype=self.dtype, name="conv2")(h, update_stats)
        if self.downsample:
            h = avg_pool2(h)
        s = x
        if self.downsample:
            s = avg_pool2(s)
        if self.downsample or x.shape[-1] != self.features:
            s = SNConv2d(self.features, 1, padding=0, dtype=self.dtype, name="sc")(s, update_stats)
        return h + s


class DResidualBlock(nn.Module):
    """Pre-activation resblock: relu-conv-relu-conv(-pool) + sc(relu(x))(-pool).

    Reference: models/discriminator.py:63-99. NOTE the shortcut consumes
    relu(x), not x: the reference's ``residual(x) + shortcut(x)`` evaluates
    ``residual`` first, whose leading ``ReLU(inplace=True)`` mutates x in
    place before ``shortcut`` reads it. The effective (and executed)
    architecture is therefore the standard shared-pre-activation SNGAN
    block — verified element-wise against the reference model in
    tests/test_reference_parity.py.
    """

    features: int
    downsample: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        in_ch = x.shape[-1]
        y = nn.relu(x)  # shared pre-activation (see docstring)
        h = SNConv2d(in_ch, 3, padding=1, dtype=self.dtype, name="conv1")(y, update_stats)
        h = nn.relu(h)
        h = SNConv2d(self.features, 3, padding=1, dtype=self.dtype, name="conv2")(h, update_stats)
        if self.downsample:
            h = avg_pool2(h)
        s = y
        if self.downsample or in_ch != self.features:
            s = SNConv2d(self.features, 1, padding=0, dtype=self.dtype, name="sc")(s, update_stats)
        if self.downsample:
            s = avg_pool2(s)
        return h + s


class ImageDiscriminator(nn.Module):
    """Whole-image real/fake discriminator (reference :184-230)."""

    conv_dim: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        d = self.conv_dim
        h = OptimizedBlock(d, downsample=True, dtype=self.dtype, name="block0")(x, update_stats)
        for i, feats in enumerate((d * 2, d * 4, d * 8, d * 16)):
            h = DResidualBlock(feats, downsample=True, dtype=self.dtype, name=f"block{i+1}")(
                h, update_stats
            )
        h = nn.relu(h)
        h = jnp.sum(h, axis=(1, 2))
        out = SNDense(1, use_bias=False, dtype=self.dtype, name="classifier")(h, update_stats)
        return out[:, 0]


class ObjectDiscriminator(nn.Module):
    """Object-crop discriminator with auxiliary class head (reference :233-278)."""

    n_class: int
    conv_dim: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        d = self.conv_dim
        h = OptimizedBlock(d, downsample=False, dtype=self.dtype, name="block0")(x, update_stats)
        for i, feats in enumerate((d * 2, d * 4, d * 8, d * 16)):
            h = DResidualBlock(feats, downsample=True, dtype=self.dtype, name=f"block{i+1}")(
                h, update_stats
            )
        h = nn.relu(h)
        h = jnp.sum(h, axis=(1, 2))
        src = SNDense(1, dtype=self.dtype, name="classifier_src")(h, update_stats)
        cls = SNDense(self.n_class, dtype=self.dtype, name="classifier_cls")(h, update_stats)
        return src[:, 0], cls


class AttributeDiscriminator(nn.Module):
    """Attribute classifier/discriminator on object crops.

    extra_block=False: reference AttributeDiscriminator (:144-181, 32^2
    crops); extra_block=True: AttributeDiscriminator128 (:102-141, 64^2
    crops, one more downsampling block).
    """

    n_attribute: int = 106
    conv_dim: int = 64
    extra_block: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        d = self.conv_dim
        h = OptimizedBlock(d, downsample=False, dtype=self.dtype, name="block0")(x, update_stats)
        feats_list = [d * 2, d * 4, d * 8, d * 16]
        if self.extra_block:
            feats_list.append(d * 16)
        for i, feats in enumerate(feats_list):
            h = DResidualBlock(feats, downsample=True, dtype=self.dtype, name=f"block{i+1}")(
                h, update_stats
            )
        h = nn.relu(h)
        h = jnp.sum(h, axis=(1, 2))
        return SNDense(self.n_attribute, dtype=self.dtype, name="classifier_att")(h, update_stats)
