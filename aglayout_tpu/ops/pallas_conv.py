"""Pallas TPU kernel: KxK conv with few output channels, fused in VMEM.

The decoder's RGB-producing convs (c4: 7x7 64->3 at 64^2; c7: 7x7 128->3 at
128^2) run at ~8% MXU through XLA (N=3 padded to 128 lanes), and the
XLA-level rewrite in ops/fastconv.py doesn't fuse its shifted reduction.
This kernel does the profitable form in one pass per image:

  1. one full-MXU matmul  Y = X @ W_flat   (C -> K*K*O merged channels)
  2. the K^2 shifted-slice reduction of Y entirely in VMEM (rolls + masks)

Grid is over the batch; one image's activations (H, W, C up to 128^2 x 128
bf16 = 4 MB) plus the merged Y (4.6 MB) fit comfortably in VMEM.

Exactness is tested against lax.conv in interpret mode (CPU).

STATUS: compiles via Mosaic after working around two lowerings (zero-shift
rolls emit empty slices; sub-32-bit masks can't gain minor dims), but the
NHWC formulation pads every (H, W, 3) temporary to 128 lanes, blowing the
scoped-VMEM budget (94 MB at c4's shapes). The profitable form keeps
channels in the major dims (NCHW-style: y as (K*K*O, H, W), rolls along
the trailing spatial dims) — queued as the next kernel iteration. Until
then the decoder uses plain convs and this module is the executable spec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, out_ref, *, k: int, c_out: int):
    _, h, w, c = x_ref.shape
    r = k // 2
    x = x_ref[0]
    wf = w_ref[...]  # (C, K*K*O)
    y = jnp.dot(
        x.reshape(h * w, c), wf, preferred_element_type=jnp.float32
    ).reshape(h, w, k * k * c_out)

    # 3-D iotas: inserting a minor dim on a narrow mask is unsupported for
    # sub-32-bit types in Mosaic, so masks are built at full rank directly
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w, c_out), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w, c_out), 1)
    acc = jnp.zeros((h, w, c_out), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            sy, sx = dy - r, dx - r
            idx = (dy * k + dx) * c_out
            sl = y[:, :, idx : idx + c_out]
            # out[p] += Y[p + s]: roll by -s and zero the wrapped band
            # (skip zero shifts: Mosaic rejects the empty slice jnp.roll emits)
            if sy:
                sl = jnp.roll(sl, -sy, 0)
            if sx:
                sl = jnp.roll(sl, -sx, 1)
            valid = (
                (rows + sy >= 0) & (rows + sy < h) & (cols + sx >= 0) & (cols + sx < w)
            )
            acc = acc + jnp.where(valid, sl, 0.0)
    out_ref[0] = (acc + b_ref[...]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_conv_few_out(x, kernel, bias=None, interpret: bool = False):
    """x: (B, H, W, C); kernel: (K, K, C, O) small O. Same-padding conv."""
    b, h, w, c = x.shape
    k = kernel.shape[0]
    c_out = kernel.shape[3]
    w_flat = (
        kernel.reshape(k * k, c, c_out).transpose(1, 0, 2).reshape(c, k * k * c_out)
    ).astype(x.dtype)
    bias = jnp.zeros((c_out,), jnp.float32) if bias is None else bias.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, c_out=c_out),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c_out), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        # f32 out: Mosaic can't relayout narrow (3-lane) minor dims in bf16
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out), jnp.float32),
        interpret=interpret,
    )(x, w_flat, bias)
    return out.astype(x.dtype)
