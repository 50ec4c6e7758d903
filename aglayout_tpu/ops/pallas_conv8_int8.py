"""Pallas TPU kernel: int8 5x5 conv on small (8x8) spatial maps — the
opt-in int8 path for the ConvLSTM gate convolutions (reference
models/generator_obj_att.py:99-114; the 3-layer fused scan is 9.2 ms at
b=128, 92% of bf16 MXU peak — irreducible exactly, 2x on the int8 MXU).

One program processes a chunk of images: pad to (GB, 8+2r, 8+2r, Cin) in
VMEM, quantize with a dynamic per-chunk symmetric scale, build the
(GB*64, K2*Cin) im2col with 25 window-slice copies, run ONE int8 matmul
with exact s32 accumulation, dequantize with per-output-channel weight
scales. Called inside the masked `lax.scan` over object steps; the
sigmoid/tanh gate nonlinearities damp the sub-1% pre-activation
quantization error. Serving/eval only, opt-in (Config.int8_serving).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref,  # (GB, S, S, Cin) bf16
    w_ref,  # (K2*K2*Cin, Cout) int8
    sw_ref,  # (1, Cout) f32
    out_ref,  # (GB, S, S, Cout) bf16
    pad_ref,  # scratch (GB, S+2r, S+2r, Cin) int8
    im_ref,  # scratch (GB*S*S, K2*K2*Cin) int8
    *,
    GB: int,
    S: int,
    Cin: int,
    Cout: int,
    K2: int,
):
    r = K2 // 2
    sp = S + 2 * r

    # ---- dynamic per-chunk symmetric quantization
    xa = x_ref[...].astype(jnp.float32)
    m = jnp.max(jnp.abs(xa))
    scale = jnp.maximum(m, 1e-8) / 127.0
    q = jnp.round(xa * (127.0 / jnp.maximum(m, 1e-8))).astype(jnp.int8)

    # ---- zero-padded copy (pad ring written once, interior overwritten)
    pad_ref[...] = jnp.zeros((GB, sp, sp, Cin), jnp.int8)
    pad_ref[:, r : r + S, r : r + S, :] = q

    # ---- im2col: (GB*S*S, (dy, dx, ci))
    for dy in range(K2):
        for dx in range(K2):
            t = dy * K2 + dx
            im_ref[:, t * Cin : (t + 1) * Cin] = pad_ref[
                :, dy : dy + S, dx : dx + S, :
            ].reshape(GB * S * S, Cin)

    # ---- one int8 matmul, s32 accumulation (exact)
    z = jax.lax.dot_general(
        im_ref[...],
        w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (GB*S*S, Cout)

    sw = sw_ref[0].astype(jnp.float32)
    out = z.astype(jnp.float32) * (scale * sw)[None, :]
    out_ref[...] = out.reshape(GB, S, S, Cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "gb", "interpret"))
def conv_small_int8(x, wq, sw, *, k: int = 5, gb: int = 16, interpret: bool = False):
    """int8 KxK same-pad conv for small spatial maps.

    x: (B, S, S, Cin) with S small (8 here); wq: (K, K, Cin, Cout) int8;
    sw: (Cout,) f32 per-out-channel weight scales. Returns (B, S, S, Cout)
    in x.dtype. Activations are quantized per image-chunk (gb images) with
    a dynamic symmetric scale.
    """
    b, s, _, cin = x.shape
    cout = wq.shape[3]
    assert wq.shape == (k, k, cin, cout) and wq.dtype == jnp.int8
    while b % gb:
        gb -= 1
    w_flat = wq.reshape(k * k * cin, cout)

    return pl.pallas_call(
        functools.partial(_kernel, GB=gb, S=s, Cin=cin, Cout=cout, K2=k),
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, s, s, cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (gb, s, s, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, s, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((gb, s + 2 * (k // 2), s + 2 * (k // 2), cin), jnp.int8),
            pltpu.VMEM((gb * s * s, k * k * cin), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x, w_flat, sw.reshape(1, cout).astype(jnp.float32))
