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

Mosaic lessons baked in: dynamic indexing must land on leading (untiled)
dims, so x blocks are (1, H, C, W) and y scratch is (H, K*K*O, W) with a
fori_loop of (K*K*O, C) x (C, W) row matmuls; zero-shift rolls are skipped
(empty-slice lowering); the default 16 MB scoped-VMEM cap is raised via
CompilerParams.

Measured on TPU v5e at c7's shapes (b=128, 128^2x128ch, bf16): 8.5 ms vs
12.4 ms for the XLA conv standalone (1.46x). HOWEVER, integrated into the
full decoder it regressed end-to-end (128^2 serving 1670 -> 1378 img/s):
the custom call is a fusion barrier (the producer relu+SPADE no longer
fuses into the conv's input read) and the NHWC<->NCHW transposes add two
full-tensor passes. The decoder therefore keeps plain convs; the winning
form needs an NHWC-native kernel whose input block IS the SPADE output
(fusing normalized*(1+gamma)+beta + relu into the kernel prologue) — the
concrete next iteration. In bf16 mode the merged-channel intermediate takes
one extra bf16 rounding; in f32 it is bit-exact (interpret tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, out_ref, y_ref, *, k: int, c_out: int, h: int, w: int):
    r = k // 2
    wf = w_ref[...]  # (K*K*O, C)

    # x block: (1, H, C, W); y scratch: (H, K*K*O, W). All dynamic indexing
    # happens on leading (untiled) dims — Mosaic requires tiled-dim indices
    # to be statically 8-aligned.
    def emit_row(i, _):
        y_ref[i] = jnp.dot(
            wf, x_ref[0, i], preferred_element_type=jnp.float32
        ).astype(y_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h, emit_row, 0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, c_out, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, c_out, w), 2)
    acc = jnp.broadcast_to(b_ref[...].reshape(1, c_out, 1), (h, c_out, w)).astype(
        jnp.float32
    )
    for dy in range(k):
        for dx in range(k):
            sy, sx = dy - r, dx - r
            idx = (dy * k + dx) * c_out
            sl = y_ref[:, idx : idx + c_out, :]  # (H, 3, W)
            if sy:
                sl = jnp.roll(sl, -sy, 0)
            if sx:
                sl = jnp.roll(sl, -sx, 2)
            valid = (
                (rows + sy >= 0) & (rows + sy < h) & (cols + sx >= 0) & (cols + sx < w)
            )
            acc = acc + jnp.where(valid, sl.astype(jnp.float32), 0.0)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_conv_few_out_nchw(x, kernel, bias=None, interpret: bool = False):
    """x: (B, H, W, C) NHWC in/out; kernel (K, K, C, O), O small."""
    b, h, w, c = x.shape
    k = kernel.shape[0]
    c_out = kernel.shape[3]
    x_t = x.transpose(0, 1, 3, 2)  # (B, H, C, W)
    w_flat = kernel.reshape(k * k, c, c_out).transpose(0, 2, 1).reshape(k * k * c_out, c)
    w_flat = w_flat.astype(x.dtype)
    bias = jnp.zeros((c_out,), jnp.float32) if bias is None else bias.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, c_out=c_out, h=h, w=w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, c, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, c_out, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, c_out, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, k * k * c_out, w), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_t, w_flat, bias)
    return out.transpose(0, 1, 3, 2).astype(x.dtype)
