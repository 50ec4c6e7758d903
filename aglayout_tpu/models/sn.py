"""Spectral normalization with exact torch semantics.

The reference wraps every Conv/ConvTranspose/Linear/Embedding in all three
discriminators with nn.utils.spectral_norm (models/discriminator.py:15-22).
torch semantics reproduced here:

  * weight viewed as a (out, fan_in) matrix — for conv kernels that is the
    OIHW flattening, so fan_in is ordered (in, kh, kw)
  * one power iteration per update: v = normalize(W^T u); u = normalize(W v)
  * sigma = u^T W v with u, v treated as constants (gradients flow through
    W only, including through sigma)
  * u, v are persistent buffers (here: 'batch_stats' collection, so they
    ride with BN stats in the train state and the torch importer can map
    weight_u/weight_v onto them directly)

Update cadence: the reference updates u at literally every train-mode
forward; here updates happen when update_stats=True (once per D phase).

Performance note (round 5): the matvecs and sigma are computed by einsum
DIRECTLY on the HWIO kernel — the torch (O, I*kh*kw) matrix view is never
materialized. The previous transpose->reshape->normalize->transpose-back
formulation materialized two full kernel copies per apply (0.3+ ms each on
the D trunks' 3x3x1024x1024 kernels, visible in the train-step profile);
the einsum form is the same math with only reduction-order-level fp
differences.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from aglayout_tpu.models.layers import torch_uniform_init

_EPS = 1e-12


def _l2n(x):
    return x / jnp.maximum(jnp.linalg.norm(x), _EPS)


class _SNState(nn.Module):
    """Owns the u/v power-iteration buffers ('batch_stats' collection)."""

    out_dim: int
    in_dim: int

    @nn.compact
    def __call__(self):
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
        return u, v


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
        u, v = _SNState(self.features, fan_in, name="sn")()
        init = self.is_initializing()
        kf = kernel  # f32 (kh, kw, in, out); torch W view is (out, in*kh*kw)
        if update_stats and not init:
            kd = jax.lax.stop_gradient(kf)
            # v = normalize(W^T u): (in, kh, kw) ordering == OIHW fan_in order
            v_new = _l2n(jnp.einsum("hwio,o->ihw", kd, u.value).reshape(-1))
            u_new = _l2n(jnp.einsum("hwio,ihw->o", kd, v_new.reshape(in_ch, k, k)))
            u.value = u_new
            v.value = v_new
            uu, vv = u_new, v_new
        else:
            uu, vv = u.value, v.value
        sigma = jnp.einsum("hwio,ihw,o->", kf, vv.reshape(in_ch, k, k), uu)
        # NOTE scale the KERNEL, not the conv output: TPU convs lower to
        # custom-calls, so an output scale cannot fuse and costs a full
        # HBM pass over the (much larger) activations — measured 1.61 vs
        # 1.72 steps/s on the 128^2 b=32 train step.
        kernel_bar = kf / sigma
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
        u, v = _SNState(self.features, in_f, name="sn")()
        init = self.is_initializing()
        kf = kernel  # f32 (in, out); torch W view is (out, in)
        if update_stats and not init:
            kd = jax.lax.stop_gradient(kf)
            v_new = _l2n(jnp.einsum("io,o->i", kd, u.value))
            u_new = _l2n(jnp.einsum("io,i->o", kd, v_new))
            u.value = u_new
            v.value = v_new
            uu, vv = u_new, v_new
        else:
            uu, vv = u.value, v.value
        sigma = jnp.einsum("io,i,o->", kf, vv, uu)
        dtype = self.dtype or x.dtype
        y = x.astype(dtype) @ (kf / sigma).astype(dtype)
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(in_f), (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y
