"""ResNet-50 in flax for the crop realism-classification evaluation.

Capability parity with the reference's evaluation/train_resinet50_vg.py /
test_classification_vg.py: a ResNet-50 is trained on real object crops
(n_class-way) and then evaluated on real vs generated vs shifted crops —
classification accuracy on generated crops is the realism score. The
reference fine-tunes torchvision's ImageNet-pretrained model; pretrained
weights are unavailable offline, so this trains from scratch (documented
deviation — accuracies are comparable *between our own runs*).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9, dtype=self.dtype
        )
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        residual = x
        y = conv(self.features, (1, 1))(x)
        y = nn.relu(norm()(y))
        y = conv(self.features, (3, 3), strides=(self.stride, self.stride), padding=1)(y)
        y = nn.relu(norm()(y))
        y = conv(self.features * 4, (1, 1))(y)
        y = norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = conv(self.features * 4, (1, 1), strides=(self.stride, self.stride))(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    num_classes: int
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                stride = 2 if i > 0 and j == 0 else 1
                x = Bottleneck(64 * 2**i, stride, dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)
