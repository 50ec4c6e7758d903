"""Spectral normalization with exact torch semantics.

The reference wraps every Conv/ConvTranspose/Linear/Embedding in all three
discriminators with nn.utils.spectral_norm (models/discriminator.py:15-22).
torch semantics reproduced here:

  * weight viewed as a (out, fan_in) matrix — for conv kernels that is the
    OIHW flattening, so our HWIO kernel is transposed to (O, I*kh*kw)
  * one power iteration per update: v = normalize(W^T u); u = normalize(W v)
  * sigma = u^T W v with u, v treated as constants (gradients flow through
    W only, including through sigma)
  * u, v are persistent buffers (here: 'batch_stats' collection, so they
    ride with BN stats in the train state and the torch importer can map
    weight_u/weight_v onto them directly)

Update cadence: the reference updates u at literally every train-mode
forward; here updates happen when update_stats=True (once per D phase).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from aglayout_tpu.models.layers import torch_uniform_init

_EPS = 1e-12


def _l2n(x):
    return x / jnp.maximum(jnp.linalg.norm(x), _EPS)


class _SNParam(nn.Module):
    """Owns the u/v buffers and produces the normalized weight matrix."""

    out_dim: int
    in_dim: int

    @nn.compact
    def __call__(self, mat, update_stats: bool):
        u = self.variable(
            "batch_stats",
            "u",
            lambda: _l2n(jax.random.normal(self.make_rng("params"), (self.out_dim,), jnp.float32)),
        )
        v = self.variable(
            "batch_stats",
            "v",
            lambda: _l2n(jax.random.normal(self.make_rng("params"), (self.in_dim,), jnp.float32)),
        )
        matf = mat.astype(jnp.float32)
        if update_stats and not self.is_initializing():
            v_new = _l2n(jax.lax.stop_gradient(matf).T @ u.value)
            u_new = _l2n(jax.lax.stop_gradient(matf) @ v_new)
            u.value = u_new
            v.value = v_new
            uu, vv = u_new, v_new
        else:
            uu, vv = u.value, v.value
        sigma = uu @ matf @ vv
        return (matf / sigma).astype(mat.dtype)


class SNConv2d(nn.Module):
    """Spectrally-normalized NHWC conv (torch Conv2d + spectral_norm)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        in_ch = x.shape[-1]
        k = self.kernel_size
        fan_in = in_ch * k * k
        kernel = self.param(
            "kernel", torch_uniform_init(fan_in), (k, k, in_ch, self.features), jnp.float32
        )
        # torch views the OIHW weight as (O, I*kh*kw)
        mat = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1)
        mat_bar = _SNParam(self.features, fan_in, name="sn")(mat, update_stats)
        kernel_bar = mat_bar.reshape(self.features, in_ch, k, k).transpose(2, 3, 1, 0)
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel_bar.astype(dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(fan_in), (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class SNDense(nn.Module):
    """Spectrally-normalized linear (torch Linear + spectral_norm)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        in_f = x.shape[-1]
        kernel = self.param("kernel", torch_uniform_init(in_f), (in_f, self.features), jnp.float32)
        mat = kernel.T  # torch Linear weight is (out, in)
        mat_bar = _SNParam(self.features, in_f, name="sn")(mat, update_stats)
        dtype = self.dtype or x.dtype
        y = x.astype(dtype) @ mat_bar.T.astype(dtype)
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(in_f), (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y
