"""Conv/Dense wrappers with exact torch layer semantics + default inits.

The reference trains with PyTorch default initializers (its weights_init
helper is commented out at models/generator_obj_att.py:615), so training
dynamics depend on those defaults:

  * Conv2d / Linear: kaiming_uniform(a=sqrt(5)) on weights — i.e.
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — and the same bound for bias.
  * ConvTranspose2d: same formula but torch computes fan_in from
    weight.size(1) * k * k = out_channels * k * k.
  * Embedding: N(0, 1).

ConvTranspose2d(k, s, p) in torch equals a forward convolution with
lhs_dilation=s, padding k-1-p on each side, and the kernel spatially flipped
with in/out swapped; we store the kernel already in forward-conv HWIO form
(the torch checkpoint importer performs the flip/transpose once at load).
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from aglayout_tpu.models.norms import MaskedBatchNorm


def torch_uniform_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_embed_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


class Conv2d(nn.Module):
    """NHWC conv matching torch.nn.Conv2d(k, stride, padding) defaults.

    Pass `in_features` to declare the kernel at setup time — required when a
    fused fast path reads `.kernel` algebraically instead of calling the
    conv spatially.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    in_features: int | None = None

    def setup(self):
        if self.in_features is not None:
            k = self.kernel_size
            fan_in = self.in_features * k * k
            self.kernel = self.param(
                "kernel",
                torch_uniform_init(fan_in),
                (k, k, self.in_features, self.features),
                jnp.float32,
            )
            if self.use_bias:
                self.bias = self.param(
                    "bias", torch_uniform_init(fan_in), (self.features,), jnp.float32
                )

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        fan_in = in_ch * k * k
        if self.in_features is not None:
            kernel = self.kernel
        else:
            kernel = self.param(
                "kernel", torch_uniform_init(fan_in), (k, k, in_ch, self.features), jnp.float32
            )
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            if self.in_features is not None:
                bias = self.bias
            else:
                bias = self.param(
                    "bias", torch_uniform_init(fan_in), (self.features,), jnp.float32
                )
            y = y + bias.astype(dtype)
        return y


class ConvTranspose2d(nn.Module):
    """NHWC transposed conv matching torch.nn.ConvTranspose2d(k, s, p).

    Output spatial size = (in - 1) * s - 2p + k. Kernel is stored in
    forward-conv HWIO layout (flipped/transposed relative to torch's
    (in, out, kh, kw) — see module docstring).
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    # declare the kernel at setup time so fast paths (e.g. the phase-
    # decomposed eval deconv, ops/phase_deconv.py) can read `.kernel`
    in_features: int | None = None

    def setup(self):
        if self.in_features is not None:
            k = self.kernel_size
            fan_in = self.features * k * k
            self.kernel = self.param(
                "kernel",
                torch_uniform_init(fan_in),
                (k, k, self.in_features, self.features),
                jnp.float32,
            )
            if self.use_bias:
                self.bias = self.param(
                    "bias", torch_uniform_init(fan_in), (self.features,), jnp.float32
                )

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        # torch computes ConvTranspose fan_in from weight.size(1)*k*k = out*k*k
        fan_in = self.features * k * k
        if self.in_features is not None:
            if in_ch != self.in_features:
                raise ValueError(
                    f"ConvTranspose2d declared in_features={self.in_features} "
                    f"but got input with {in_ch} channels (shape {x.shape})"
                )
            kernel = self.kernel
        else:
            kernel = self.param(
                "kernel", torch_uniform_init(fan_in), (k, k, in_ch, self.features), jnp.float32
            )
        dtype = self.dtype or x.dtype
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding=[(pad, pad)] * 2,
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            if self.in_features is not None:
                bias = self.bias
            else:
                bias = self.param(
                    "bias", torch_uniform_init(fan_in), (self.features,), jnp.float32
                )
            y = y + bias.astype(dtype)
        return y


class Dense(nn.Module):
    """Linear with torch default init."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param("kernel", torch_uniform_init(in_f), (in_f, self.features), jnp.float32)
        dtype = self.dtype or x.dtype
        y = x.astype(dtype) @ kernel.astype(dtype)
        if self.use_bias:
            bias = self.param("bias", torch_uniform_init(in_f), (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class Embed(nn.Module):
    """Embedding table with torch default N(0,1) init."""

    num_embeddings: int
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, ids):
        table = self.param(
            "embedding", torch_embed_init, (self.num_embeddings, self.features), jnp.float32
        )
        y = jnp.take(table, ids, axis=0)
        return y.astype(self.dtype or y.dtype)


class ResidualBlock(nn.Module):
    """Generator residual block: conv-BN-ReLU-conv-BN + identity skip.

    Reference: models/generator_obj_att.py:47-60 (affine BN, no-bias convs).
    Operates on per-image tensors, so no mask is needed.
    """

    features: int
    dtype: jnp.dtype | None = None

    def setup(self):
        # setup-style (not @nn.compact) with the same submodule names so the
        # parent can read c1/c2 kernels + bn eval affines for the fused
        # serving trunk (ops/pallas_resblocks.py); param tree is unchanged.
        self.c1 = Conv2d(
            self.features, 3, padding=1, use_bias=False, dtype=self.dtype,
            in_features=self.features,
        )
        self.bn1 = MaskedBatchNorm(self.features, dtype=self.dtype)
        self.c2 = Conv2d(
            self.features, 3, padding=1, use_bias=False, dtype=self.dtype,
            in_features=self.features,
        )
        self.bn2 = MaskedBatchNorm(self.features, dtype=self.dtype)

    def __call__(self, x, use_running_average: bool = False):
        h = self.c1(x)
        h = self.bn1(h, None, use_running_average)
        h = nn.relu(h)
        h = self.c2(h)
        h = self.bn2(h, None, use_running_average)
        return x + h


def avg_pool2(x):
    """2x2 average pool, stride 2 (torch F.avg_pool2d(x, 2))."""
    return nn.avg_pool(x, (2, 2), (2, 2))


def adaptive_avg_pool(x, out_hw: int):
    """AdaptiveAvgPool2d for integer-ratio downsizing (exact match)."""
    h, w = x.shape[1], x.shape[2]
    if h == out_hw and w == out_hw:
        return x
    assert h % out_hw == 0 and w % out_hw == 0, (h, w, out_hw)
    kh, kw = h // out_hw, w // out_hw
    return nn.avg_pool(x, (kh, kw), (kh, kw))
