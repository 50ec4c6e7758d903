"""Pallas TPU kernel: fused [SPADE-apply -> relu -> int8-quantize -> 5x5
conv (128ch) -> dequant] — the opt-in int8 serving path for the 128^2
decoder's c6 stage (reference models/generator_obj_att128.py:596).

Why: c6 is peak-bound in bf16 (9.0 ms at b=128, 97% of MXU peak — XLA
cannot go faster exactly), and XLA's s8 conv lowering shows no speedup on
v5e (ROOFLINE.md). The int8 MXU rate (394 TOPS, 2x bf16) is reachable only
by hand-feeding it: this kernel quantizes the SPADE-activated input with a
DYNAMIC per-image scale, im2cols in VMEM, runs one K=25*C int8 matmul per
row chunk, and dequantizes with per-output-channel weight scales. It also absorbs, for free, the two big exact-path memory
costs around c6: the full-resolution SPADE-4 gamma/beta assembly
(measured 3.3 ms — here the compact (B, HB, 5, W, C) class tables are
read directly) and the conv->Pallas relayout copy in front of the c7 head
(this kernel's output is already row-major).

Quantization error bound: relu'd activations in [0, m] quantized
symmetric per chunk (step m/127); weights per-out-channel (step
max|w|/127); accumulation in s32 is exact. Serving/eval only, opt-in via
Config.int8_serving / bench --int8; the default path stays exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K6 = 5  # conv kernel size
PADX = 2  # x padding inside the row scratch


def _kernel(
    x_ref,  # (1, H, W, C) bf16
    a_ref,  # (1, H//f, 5, W, C) spade4 folded multiplier
    b_ref,  # (1, H//f, 5, W, C) spade4 folded offset
    w6_ref,  # (25*C, C) int8, rows (dy, dx, ci)
    sw_ref,  # (1, C) f32 per-out-channel weight scales
    out_ref,  # (1, H, W, C) bf16
    y_ref,  # scratch (H+2r, W+2*PADX, C) bf16: spade-applied image
    q_ref,  # scratch (H+2r, W+2*PADX, C) int8: quantized image
    im_ref,  # scratch (ch*W, 25*C) int8: im2col
    *,
    H: int,
    W: int,
    C: int,
    f: int,
    ch: int,
    stages: int,
):
    r = K6 // 2
    n_chunk = H // ch
    sw = sw_ref[0].astype(jnp.float32)  # (C,)

    # ---- 1. bulk SPADE apply + relu, grouped by (f-block, row-class).
    # Row classes within a block are contiguous runs (0 | 1 | interior |
    # f-2 | f-1), so each (block, class) is ONE (n, W, C) fused op instead
    # of the per-row loop (which Mosaic lowered to 144 scalar-indexed row
    # stores per image — measured 18 ms/stage, the whole kernel's cost).
    y_ref[:r] = jnp.zeros((r, W + 2 * PADX, C), y_ref.dtype)
    y_ref[r + H :] = jnp.zeros((r, W + 2 * PADX, C), y_ref.dtype)
    y_ref[:, :PADX] = jnp.zeros((H + 2 * r, PADX, C), y_ref.dtype)
    y_ref[:, PADX + W :] = jnp.zeros((H + 2 * r, PADX, C), y_ref.dtype)
    segs = [(0, 1, 0), (1, 2, 1), (2, f - 2, 2), (f - 2, f - 1, 3), (f - 1, f, 4)]
    for blk in range(H // f):
        for u0, u1, cls in segs:
            g0, n = blk * f + u0, u1 - u0
            xa = x_ref[0, g0 : g0 + n]
            av = a_ref[0, blk, cls][None]
            bv = b_ref[0, blk, cls][None]
            y = jnp.maximum(xa.astype(jnp.float32) * av + bv, 0.0)
            y_ref[r + g0 : r + g0 + n, PADX : PADX + W] = y.astype(y_ref.dtype)

    # ---- 2. dynamic per-image symmetric quantization (relu'd: [0, m])
    m = jnp.max(y_ref[...].astype(jnp.float32))
    scale = jnp.maximum(m, 1e-8) / 127.0
    inv = 127.0 / jnp.maximum(m, 1e-8)
    q_ref[...] = jnp.round(y_ref[...].astype(jnp.float32) * inv).astype(jnp.int8)
    if stages <= 1:
        out_ref[0] = y_ref[r : r + H, PADX : PADX + W]
        return

    for c in range(n_chunk):
        # ---- 3. im2col: Q[(i, x), (dy, dx, ci)]
        for dy in range(K6):
            for dx in range(K6):
                t = dy * K6 + dx
                im_ref[:, t * C : (t + 1) * C] = q_ref[
                    c * ch + dy : c * ch + dy + ch, dx : dx + W, :
                ].reshape(ch * W, C)
        if stages <= 2:
            out_ref[0, c * ch : (c + 1) * ch] = im_ref[:, :C].reshape(ch, W, C).astype(
                out_ref.dtype
            )
            continue

        # ---- 4. one int8 matmul, s32 accumulation (exact)
        z = jax.lax.dot_general(
            im_ref[...],
            w6_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (ch*W, C)

        # ---- 5. dequant + store
        zf = z.astype(jnp.float32) * (scale * sw)[None, :]
        out_ref[0, c * ch : (c + 1) * ch] = zf.reshape(ch, W, C).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("f", "ch", "interpret", "stages"))
def spade_c6_int8(
    x, a_tab, b_tab, w6q, sw6, *, f: int, ch: int = 32, interpret: bool = False, stages: int = 3
):
    """relu(x * A4 + B4) -> int8 5x5 conv (C->C), dequantized to x.dtype.

    x: (B, H, W, C); a_tab/b_tab: (B, H//f, 5, W, C) folded SPADE tables
    (SPADE.folded_affine_tables); w6q: (K6, K6, C, C) int8; sw6: (C,) f32.
    Returns (B, H, W, C).
    """
    bsz, H, W, C = x.shape
    assert w6q.shape == (K6, K6, C, C) and w6q.dtype == jnp.int8
    assert H % ch == 0 and H % f == 0 and f >= 5
    w6_flat = w6q.reshape(K6 * K6 * C, C)  # rows (dy, dx, ci)

    return pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, C=C, f=f, ch=ch, stages=stages),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, H // f, 5, W, C), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, H // f, 5, W, C), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, H, W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H + 2 * (K6 // 2), W + 2 * PADX, C), x.dtype),
            pltpu.VMEM((H + 2 * (K6 // 2), W + 2 * PADX, C), jnp.int8),
            pltpu.VMEM((ch * W, K6 * K6 * C), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x, a_tab, b_tab, w6_flat, sw6.reshape(1, C).astype(jnp.float32))


def quantize_conv_weights(w):
    """Per-out-channel symmetric int8 quantization of an HWIO conv kernel.

    Returns (w_int8, scales) with w ~= w_int8 * scales[co]."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    scales = jnp.maximum(absmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / scales), -127, 127).astype(jnp.int8)
    return wq, scales
