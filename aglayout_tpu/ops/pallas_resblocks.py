"""Pallas TPU kernel: the layout encoder's 6-resblock 8x8 trunk in ONE pass.

After the ConvLSTM fuses the object sequence, the layout feature
(B, 8, 8, conv_dim) runs through `resi_num`=6 residual blocks
[conv3x3 -> BN -> relu -> conv3x3 -> BN] + skip (reference
models/generator_obj_att.py:47-60, applied at :511). At serving shapes
(B=128, 8x8x64) each conv is ~0.6 GFLOP — 3 us of MXU time — so the
XLA graph of 12 convs + 12 BN affines + 6 skip adds is pure
per-op-latency tail (measured ~1 ms of sub-0.2 ms fusions at the round-4
head). This kernel runs the whole trunk in one program with everything
VMEM-resident: each conv is 9 accumulated (B*64, C) @ (C, C) tap
matmuls reading shifted windows of a zero-padded scratch.

Numerics match the dense eval path op-for-op:
  - conv inputs are bf16 (the dense path's Conv2d cast), accumulation f32;
  - BN eval affine + relu in f32 (MaskedBatchNorm casts to f32);
  - the skip chain accumulates in f32 across all 6 blocks (never rounded
    to bf16 between blocks), exactly like the dense x + h promotion;
  - output f32, like the dense trunk's final x + h.

Eval/serving only (no VJP); train mode keeps the dense path (batch-stat
BN cannot fold into a static affine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    h_ref,  # (B, 8, 8, C) bf16/f32 input
    w1_ref,  # (R, 9, C, C) compute-dtype tap kernels, first conv per block
    w2_ref,  # (R, 9, C, C) second conv per block
    ab1_ref,  # (R, 2, C) f32 bn1 eval affine (a, b)
    ab2_ref,  # (R, 2, C) f32 bn2 eval affine
    out_ref,  # (B, 8, 8, C) f32
    xp_ref,  # VMEM scratch (B, 10, 10, C) compute dtype: padded conv input
    tp_ref,  # VMEM scratch (B, 10, 10, C): padded intermediate
    xf_ref,  # VMEM scratch (B*64, C) f32: the skip-chain accumulator
    *,
    B: int,
    C: int,
    R: int,
):
    cdtype = w1_ref.dtype

    def conv9(src_ref, w_ref, blk):
        acc = None
        for dy in range(3):
            for dx in range(3):
                lhs = src_ref[:, dy : dy + 8, dx : dx + 8, :].reshape(B * 64, C)
                p = jax.lax.dot_general(
                    lhs,
                    w_ref[blk, dy * 3 + dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = p if acc is None else acc + p
        return acc  # (B*64, C) f32

    # zero the pad frame once; inner writes below never touch it
    xp_ref[...] = jnp.zeros_like(xp_ref)
    tp_ref[...] = jnp.zeros_like(tp_ref)
    x0 = h_ref[...].astype(jnp.float32).reshape(B * 64, C)
    xf_ref[...] = x0
    xp_ref[:, 1:9, 1:9, :] = x0.astype(cdtype).reshape(B, 8, 8, C)

    for blk in range(R):
        t = conv9(xp_ref, w1_ref, blk)
        t = jnp.maximum(t * ab1_ref[blk, 0] + ab1_ref[blk, 1], 0.0)
        tp_ref[:, 1:9, 1:9, :] = t.astype(cdtype).reshape(B, 8, 8, C)
        u = conv9(tp_ref, w2_ref, blk)
        u = u * ab2_ref[blk, 0] + ab2_ref[blk, 1]
        xnew = xf_ref[...] + u
        xf_ref[...] = xnew
        xp_ref[:, 1:9, 1:9, :] = xnew.astype(cdtype).reshape(B, 8, 8, C)

    out_ref[...] = xf_ref[...].reshape(B, 8, 8, C)


@functools.partial(jax.jit, static_argnames=("interpret",))
def residual_trunk(h, w1, w2, ab1, ab2, *, interpret: bool = False):
    """Fused eval-mode residual trunk (see module docstring).

    h:   (B, 8, 8, C) layout feature (any float dtype; convs run in
         bf16 when h is bf16, matching the dense path's Conv2d cast).
    w1:  (R, 3, 3, C, C) first-conv kernels per block (HWIO).
    w2:  (R, 3, 3, C, C) second-conv kernels per block.
    ab1: (R, 2, C) f32 eval affine (a, b) of bn1 per block.
    ab2: (R, 2, C) f32 eval affine of bn2 per block.
    Returns (B, 8, 8, C) float32 — the dense trunk's x + h output dtype.
    """
    b, hh, ww, c = h.shape
    r = w1.shape[0]
    assert hh == 8 and ww == 8, (hh, ww)
    assert w1.shape == w2.shape == (r, 3, 3, c, c), (w1.shape, c)
    assert ab1.shape == ab2.shape == (r, 2, c), ab1.shape
    cdtype = h.dtype
    # (R, 3, 3, C, C) -> (R, 9, C, C) tap-major matrices
    w1m = w1.reshape(r, 9, c, c).astype(cdtype)
    w2m = w2.reshape(r, 9, c, c).astype(cdtype)

    return pl.pallas_call(
        functools.partial(_kernel, B=b, C=c, R=r),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, 8, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b, 10, 10, c), cdtype),
            pltpu.VMEM((b, 10, 10, c), cdtype),
            pltpu.VMEM((b * 64, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(h, w1m, w2m, ab1.astype(jnp.float32), ab2.astype(jnp.float32))
