"""Pallas TPU kernel: few-output-channel conv, channels-major layout.

Second iteration of ops/pallas_conv.py addressing its VMEM blowup: keeping
the output channels (3) in the MAJOR dims means no (H, W, 3) lane-padded
vectors exist anywhere. Per image:

  1. y = W_flat^T @ x_t        x_t: (C, H*W) channels-major input
     -> y: (K*K*O, H, W), full-MXU matmul, bf16
  2. accumulate the K^2 shifted (3, H, W) slices into a VMEM scratch
     accumulator (in-place ref updates keep one temporary live at a time)

The caller transposes NHWC -> NCHW once (one XLA pass) and transposes the
small (B, 3, H, W) result back.

STATUS: exact in interpret mode. On-device Mosaic rejects the
(K*K*O, H*W) -> (K*K*O, H, W) reshape ("infer-vector-layout: unsupported
shape cast" — splitting the lane dim needs a relayout). Next iteration:
feed x as (C, H, W) blocks and emit y row-by-row into a 3-D scratch via a
fori_loop of (K*K*O, C) x (C, W) matmuls. The decoder keeps plain convs
meanwhile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, out_ref, acc_ref, *, k: int, c_out: int, h: int, w: int):
    r = k // 2
    x = x_ref[0]  # (C, H*W)
    wf = w_ref[...]  # (K*K*O, C)
    y = jnp.dot(wf, x, preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(k * k * c_out, h, w)

    rows = jax.lax.broadcasted_iota(jnp.int32, (c_out, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (c_out, h, w), 2)
    acc_ref[...] = jnp.broadcast_to(
        b_ref[...].reshape(c_out, 1, 1), (c_out, h, w)
    ).astype(jnp.float32)
    for dy in range(k):
        for dx in range(k):
            sy, sx = dy - r, dx - r
            idx = (dy * k + dx) * c_out
            sl = y[idx : idx + c_out]  # (3, H, W) — major-dim slice
            if sy:
                sl = jnp.roll(sl, -sy, 1)
            if sx:
                sl = jnp.roll(sl, -sx, 2)
            valid = (
                (rows + sy >= 0) & (rows + sy < h) & (cols + sx >= 0) & (cols + sx < w)
            )
            acc_ref[...] = acc_ref[...] + jnp.where(valid, sl.astype(jnp.float32), 0.0)
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_conv_few_out_nchw(x, kernel, bias=None, interpret: bool = False):
    """x: (B, H, W, C) NHWC in/out; kernel (K, K, C, O), O small."""
    b, h, w, c = x.shape
    k = kernel.shape[0]
    c_out = kernel.shape[3]
    x_t = x.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    w_flat = kernel.reshape(k * k, c, c_out).transpose(0, 2, 1).reshape(k * k * c_out, c)
    w_flat = w_flat.astype(x.dtype)
    bias = jnp.zeros((c_out,), jnp.float32) if bias is None else bias.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, c_out=c_out, h=h, w=w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h * w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_out, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_out, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c_out, h, w), jnp.float32)],
        interpret=interpret,
    )(x_t, w_flat, bias)
    return out.transpose(0, 2, 3, 1).astype(x.dtype)
