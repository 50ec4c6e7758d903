"""Pallas TPU kernel: per-object typed c3 + dense expansion.

Back half of the layout encoder's typed-algebra eval path (see
generator.py LayoutEncoder._typed_c2c3_eval). Per object everything is
tiny — a 13x13 type grid of c2 values, a 182x512 matmul against the c3
kernel, a 14x52 column contraction, bn3 affine + relu on 196 type values,
and two one-hot expansion matmuls — but XLA lowers the per-object (batch
1280) einsum forms to batched-convolution fusions plus layout copies
(measured ~10 ms at b=128, O=10, 128^2). In VMEM per program the same math
is a handful of small matmuls and row copies.

Math (per object, G objects per program):
  Z1[(a, l), (h, c)] = z2p[idx[a, h], l, c]          row-window gather
  W3z[(a, l), (w, C)] = Z1 @ w3t                      c3 kernel contraction
  V3[g, (a, C)] = HC[g, (l, w)] @ W3z^(l,w),(a,C)     column contraction
  V3 = relu(V3 * a3 + b3)                             bn3 eval affine
  M1[x, (a, C)] = EC[x, g] @ V3                       column expansion
  out[y, (x, C)] = ER[y, a] @ M1^(a),(x,C)            row expansion

Exact vs the einsum composition modulo dot order (interpret-mode test);
serving/eval only (no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NA = 14  # row/col window-type candidates on the output grid
NL = 13  # input-type candidates (12 + zero row for OOB taps)
KW = 4  # c3 kernel size


_PAD = 16  # per-object row stride unit: NA*NL=182 padded to 192 (8-aligned)


def _kernel(
    z2p_ref,  # (G, NL, NL, c2) bf16; row/col NL-1 are zeros
    oh_ref,  # (G, KW, NA, NL): one-hot row-window selectors (OOB -> zero row)
    hc_ref,  # (G, NA, NL * KW): one-hot (l, w) column-window selectors
    er_ref,  # (G, S3, NA)
    ec_ref,  # (G, S3, NA)
    ab_ref,  # (G, 2, c4) f32: bn3 eval affine (a, b)
    w3t_ref,  # (KW * c2, KW * c4): ((h, c), (w, C))
    out_ref,  # (G, S3, S3, c4)
    z1_ref,  # scratch (G * RS, KW * c2), RS = 8-aligned row stride
    *,
    G: int,
    S3: int,
    c2: int,
    c4: int,
):
    cdtype = z2p_ref.dtype
    rs = -(-NA * NL // _PAD) * _PAD  # 192: aligned per-object row stride

    # ---- gather via one-hot matmuls: Z1[(a, l), (h, c)] = z2p[idx[a,h], l, c]
    # (a direct 56-copy gather per object was the kernel's bottleneck:
    # unaligned 13-row stores)
    for g in range(G):
        zf = z2p_ref[g].reshape(NL, NL * c2)  # (r, (l, c))
        for h in range(KW):
            zm = jnp.dot(
                oh_ref[g, h], zf, preferred_element_type=jnp.float32
            )  # (a, (l, c))
            z1_ref[g * rs : g * rs + NA * NL, h * c2 : (h + 1) * c2] = zm.reshape(
                NA * NL, c2
            ).astype(z1_ref.dtype)

    # ---- one matmul for all G objects
    w3z = jnp.dot(
        z1_ref[...], w3t_ref[...], preferred_element_type=jnp.float32
    )  # (G*RS, KW*c4)

    for g in range(G):
        # (a, l, (w, C)) -> ((l, w), (a, C))
        wz = w3z[g * rs : g * rs + NA * NL].reshape(NA, NL, KW, c4)
        wzt = wz.transpose(1, 2, 0, 3).reshape(NL * KW, NA * c4).astype(cdtype)
        v3 = jnp.dot(hc_ref[g], wzt, preferred_element_type=jnp.float32)  # (g, (a, C))
        a3 = jnp.broadcast_to(ab_ref[g, 0][None, :], (NA, c4)).reshape(1, NA * c4)
        b3 = jnp.broadcast_to(ab_ref[g, 1][None, :], (NA, c4)).reshape(1, NA * c4)
        v3 = jnp.maximum(v3 * a3 + b3, 0.0).astype(cdtype)

        m1 = jnp.dot(ec_ref[g], v3, preferred_element_type=jnp.float32)  # (x, (a, C))
        m1t = (
            m1.reshape(S3, NA, c4).transpose(1, 0, 2).reshape(NA, S3 * c4).astype(cdtype)
        )
        out = jnp.dot(er_ref[g], m1t, preferred_element_type=jnp.float32)  # (y, (x, C))
        out_ref[g] = out.reshape(S3, S3, c4).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "group"))
def typed_c3_expand(
    z2p, idxR, hc, er, ec, ab, w3t, *, interpret: bool = False, group: int = 4
):
    """See module docstring. Shapes:
    z2p (N, 13, 13, c2); idxR (N, 14, 4) int32; hc (N, 14, 52);
    er/ec (N, S3, 14); ab (N, 2, c4); w3t (4*c2, 4*c4).
    Returns (N, S3, S3, c4) in z2p.dtype.
    """
    n, nl, _, c2 = z2p.shape
    assert nl == NL
    s3 = er.shape[1]
    c4 = ab.shape[2]
    g = group
    while n % g:
        g -= 1
    rs = -(-NA * NL // _PAD) * _PAD

    # one-hot row-window selectors; OOB taps point at z2p's zero row NL-1
    oh = jax.nn.one_hot(idxR, NL, dtype=z2p.dtype).transpose(0, 2, 1, 3)

    out = pl.pallas_call(
        functools.partial(_kernel, G=g, S3=s3, c2=c2, c4=c4),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, NL, NL, c2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, KW, NA, NL), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, NA, NL * KW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s3, NA), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s3, NA), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 2, c4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, s3, s3, c4), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, s3, s3, c4), z2p.dtype),
        scratch_shapes=[pltpu.VMEM((g * rs, KW * c2), z2p.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(z2p, oh, hc, er, ec, ab, w3t)
    return out
