"""Pallas TPU kernel: per-object typed c3 + dense expansion.

Back half of the layout encoder's typed-algebra eval path (see
generator.py LayoutEncoder._typed_c2c3_eval). Per object everything is
tiny — a 13x13 type grid of c2 values, a c3-kernel contraction, bn3
affine + relu on 196 type values, and two one-hot expansion matmuls — but
XLA lowers the per-object (batch 1280) einsum forms to
batched-convolution fusions plus layout copies (measured ~10 ms at b=128,
O=10, 128^2).

v3 design (round 3): the v2 kernel looped over objects inside each
program, so every matmul had contraction size K in {13, 14, 52} — padded
to the 128-wide MXU tile, wasting ~80% of MXU cycles (measured 7.1 ms
isolated; stage bisection showed the one-hot expansion matmuls dominating
at ~10x their FLOP cost). Here G objects are batched with BLOCK-DIAGONAL
one-hot selector matrices (built by cheap XLA fusions in the wrapper), so
each stage is ONE program-wide matmul with K >= 104 and there are no
per-object loops at all:

  zm_h   = ohbd_h @ zf          (G*16, G*13)(G*13, 13*c2)   row gather
  w3z    = sum_h zm_h' @ w3t_h  (G*208, c2)(c2, 4*c4)       c3 contraction
  wzts   = transpose(w3z)       (G,16,13,4,c4)->(G,13,4,16,c4)  batched
  v3     = hcbd @ wzts'         (G*14, G*52)(G*52, 16*c4)   col windows
  v3r    = relu(v3 * A3 + B3)   bn3 eval affine (pad-lane masked)
  m1     = ecbd @ v3r           (G*33, G*14)                col expansion
  m1t    = transpose(m1)        (G,33,16,c4)->(G,16,33,c4)  batched
  out    = erbd @ m1t           (G*33, G*16)(G*16, 33*c4)   row expansion

Row strides are padded to 16 per object where rows are sliced/stored, so
every store and reshape is (8,128)-tile aligned; pad rows/cols are forced
to exact zeros at the source (zero rows in ohbd) so no NaN garbage can
leak through 0*x MXU products.

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
NZ = 12  # real input types (v4 consumes the unpadded 12x12 grid; OOB taps
#          are all-zero selector rows instead of reads of a padded zero row)
KW = 4  # c3 kernel size
NAP = 16  # padded per-object row-type stride (8-aligned; 16*NL = 208)


def _kernel(
    z2p_ref,  # (G, NL, NL, c2) bf16; row/col NL-1 are zeros
    ohbd_ref,  # (1, KW, G*NAP, G*NL) bf16 block-diag row-window selectors
    hcbd_ref,  # (1, G*NA, G*52) bf16 block-diag (l, w) column-window selectors
    ecbd_ref,  # (1, G*S3, G*NA) bf16 block-diag col-type expansion
    erbd_ref,  # (1, G*S3, G*NAP) bf16 block-diag row-type expansion
    ab_ref,  # (G, 2, c4) f32: bn3 eval affine (a, b)
    w3t_ref,  # (KW * c2, KW * c4): ((h, c), (w, C))
    out_ref,  # (G, S3, S3, c4)
    *,
    G: int,
    S3: int,
    c2: int,
    c4: int,
):
    cdtype = z2p_ref.dtype
    zf = z2p_ref[...].reshape(G * NL, NL * c2)  # rows (g, r), cols (l, c)

    # ---- gather + c3 contraction: w3z[(g, a, l), (w, C)]
    # z1[(g, a, l), (h, c)] = z2p[g, idx[a, h], l, c] realized as 4 matmuls
    # zm_h = ohbd_h @ zf (rows (g, a_p), cols (l, c)); the (h, c) column
    # block of z1 then contracts with the matching w3t row block, so z1 is
    # never materialized: w3z = sum_h zm_h.reshape @ w3t[h*c2:(h+1)*c2].
    w3z = None
    for h in range(KW):
        zm = jax.lax.dot_general(
            ohbd_ref[0, h],
            zf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G*NAP, NL*c2); pad rows (a >= NA) are exact zeros (zero rows in ohbd)
        zmr = zm.reshape(G * NAP * NL, c2).astype(cdtype)
        part = jax.lax.dot_general(
            zmr,
            w3t_ref[h * c2 : (h + 1) * c2, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G*NAP*NL, KW*c4)
        w3z = part if w3z is None else w3z + part

    # ---- batched transpose to ((g, l, w), (a_p, C))
    wzts = (
        w3z.reshape(G, NAP, NL, KW, c4)
        .transpose(0, 2, 3, 1, 4)
        .reshape(G * NL * KW, NAP * c4)
        .astype(cdtype)
    )

    # ---- column windows: v3[(g, b), (a_p, C)]
    v3 = jax.lax.dot_general(
        hcbd_ref[0],
        wzts,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G*NA, NAP*c4)

    # bn3 eval affine + relu; pad lanes (a_p >= NA) masked to exact zero so
    # relu(b3) cannot leak into them
    apad = (
        jax.lax.broadcasted_iota(jnp.int32, (1, NA, NAP, c4), 2) < NA
    ).astype(jnp.float32)
    a3 = jnp.broadcast_to(ab_ref[:, 0][:, None, None, :], (G, NA, NAP, c4))
    b3 = jnp.broadcast_to(ab_ref[:, 1][:, None, None, :], (G, NA, NAP, c4))
    a3 = (a3 * apad).reshape(G * NA, NAP * c4)
    b3 = (b3 * apad).reshape(G * NA, NAP * c4)
    v3r = jnp.maximum(v3 * a3 + b3, 0.0).astype(cdtype)

    # ---- col expansion: m1[(g, x), (a_p, C)]
    m1 = jax.lax.dot_general(
        ecbd_ref[0],
        v3r,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G*S3, NAP*c4)

    # ---- batched transpose to ((g, a_p), (x, C))
    m1t = (
        m1.reshape(G, S3, NAP, c4)
        .transpose(0, 2, 1, 3)
        .reshape(G * NAP, S3 * c4)
        .astype(cdtype)
    )

    # ---- row expansion + store
    out = jax.lax.dot_general(
        erbd_ref[0],
        m1t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G*S3, S3*c4)
    out_ref[...] = out.reshape(G, S3, S3, c4).astype(out_ref.dtype)


def typed_c3_expand(
    z2p, idxR, lsel, selR, selC, ab, w3t, *, interpret: bool = False, group: int = 8
):
    """Typed c3 + bn3 + relu + dense expansion (see module docstring).

    z2p:  (N, 13, 13, c2) type-grid c2 values; row/col 12 must be zeros.
    idxR: (N, 14, 4) int32 in [0, 13): c3 row-window source types.
    lsel: (N, 14, 4) int32 in [0, 13]: c3 col-window source types; 13 = OOB
          (contributes zero).
    selR/selC: (N, S3) int32 in [0, 14): output row/col -> type map.
    ab:   (N, 2, c4) f32 bn3 eval affine; w3t: (4*c2, 4*c4) ((h,c),(w,C)).
    Returns (N, S3, S3, c4) in z2p.dtype.
    """
    n, nl, _, c2 = z2p.shape
    assert nl == NL
    s3 = selR.shape[1]
    c4 = ab.shape[2]
    g = group
    while n % g:
        g -= 1
    dt = z2p.dtype

    def gband(x):
        return x.reshape(n // g, g, *x.shape[1:])

    goff = jnp.arange(g, dtype=jnp.int32)

    # block-diag row-window selectors, padded to NAP rows per object; pad
    # rows get class g*NL+... out of range -> all-zero one-hot rows
    idx_p = jnp.pad(
        gband(idxR), ((0, 0), (0, 0), (0, NAP - NA), (0, 0)), constant_values=NL
    )  # OOB class marker
    cls = jnp.where(
        idx_p < NL, idx_p + (goff * NL)[None, :, None, None], g * NL
    )  # (n/g, g, NAP, KW)
    ohbd = jax.nn.one_hot(cls, g * NL, dtype=dt)  # (n/g, g, NAP, KW, g*NL)
    ohbd = ohbd.transpose(0, 3, 1, 2, 4).reshape(n // g, KW, g * NAP, g * NL)

    # block-diag (l, w) column-window selectors: row (g, b) has one 1 per w
    # at col g*52 + lsel*4 + w (OOB lsel=13 -> class g*52+52.. >= g_total*52
    # only via the explicit out-of-range marker)
    wof = jnp.arange(KW, dtype=jnp.int32)
    hcls = jnp.where(
        gband(lsel) < NL,
        gband(lsel) * KW + wof + (goff * (NL * KW))[None, :, None, None],
        g * NL * KW,
    )  # (n/g, g, NA, KW)
    hcbd = jax.nn.one_hot(hcls, g * NL * KW, dtype=dt).sum(3)  # (n/g, g, NA, g*52)
    hcbd = hcbd.reshape(n // g, g * NA, g * NL * KW)

    ecbd = jax.nn.one_hot(
        gband(selC) + (goff * NA)[None, :, None], g * NA, dtype=dt
    ).reshape(n // g, g * s3, g * NA)
    erbd = jax.nn.one_hot(
        gband(selR) + (goff * NAP)[None, :, None], g * NAP, dtype=dt
    ).reshape(n // g, g * s3, g * NAP)

    out = pl.pallas_call(
        functools.partial(_kernel, G=g, S3=s3, c2=c2, c4=c4),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, NL, NL, c2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, KW, g * NAP, g * NL), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, g * NA, g * NL * KW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, g * s3, g * NA), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * s3, g * NAP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 2, c4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, s3, s3, c4), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, s3, s3, c4), z2p.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(z2p, ohbd, hcbd, ecbd, erbd, ab, w3t.astype(dt))
    return out


def _kernel_v4(
    z2p_ref,  # (G, NZ, NZ, c2) bf16 (unpadded 12x12 type grid)
    ohbd_ref,  # (1, NA*G, KW) i32 row-window selector classes, rows (a, g)
    hsel_ref,  # (1, G*NA, KW) i32 per-w col-window selector classes, rows (g, b)
    ecol_ref,  # (1, G*S3, 1) i32 col-type expansion classes, rows (g, x)
    erow_ref,  # (1, G*S3, 1) i32 row-type expansion classes, rows (g, y)
    ab_ref,  # (G, 2, c4) f32: bn3 eval affine (a, b)
    w3t_ref,  # (KW * c2, KW * c4): ((h, c), (w, C))
    out_ref,  # (G, S3, S3, c4)
    m_ref,  # VMEM scratch (NA, G, S3*c4): the half-expanded M, rows (a, g)
    *,
    G: int,
    S3: int,
    c2: int,
    c4: int,
):
    """Transpose-free v4 (round 4). The v3 kernel's cost was its two
    in-kernel batched transposes (wzts 1.7 ms, m1t 1.3 ms measured — the
    row-type index `a` alternates between rows and columns across stages,
    and Mosaic's sublane transpose runs at ~80 GB/s). Here the selector row
    order puts the row-type FIRST — rows (a, g) — and the NA row types are
    a static Python loop, so every stage is a contiguous static row slice +
    matmul, and the only reshapes are free row-major views (split of a
    minor column factor into rows, or merge of minor rows into columns):

      zm_h  = ohbd_h @ zf          rows (a, g) -> free view (a, g, l)
      w3z   = sum_h zmr_h @ w3t_h  rows (a, g, l), cols (w, C)
      per a (static):   blk = w3z[a]          rows (g, l)  [contiguous]
        v3_a  = sum_w hsel_w @ blk[:, wC]     rows (g, b)
        v3r_a = relu(v3_a * A3 + B3)
        m1_a  = ecol @ v3r_a                  rows (g, x)
        M[a]  = m1_a            (free: scratch row block, rows (a, g))
      out   = erow @ M.view(NA*G, S3*c4)      rows (g, y), cols (x, C)

    Same FLOPs as v3 (every dot K >= 96), zero transposes, and no NAP row
    padding (the (a, g, l) blocks are G*NZ = 96 rows, already 8-aligned),
    which also trims 2/16 of the stage-1/2 work. v4 also consumes the RAW
    12x12 type grid — OOB taps (idxR == 12, lsel >= 12) map to all-zero
    selector rows instead of reads of a padded zero row/col, killing the
    XLA-side pad of the (n, 12, 12, c2) tensor entirely.

    Round-4 refinement: the selector one-hots are built IN-KERNEL from
    tiny i32 class arrays (iota == class on the lane dim; class >= ncols
    gives an all-zero row, covering the OOB sentinels). The class arrays
    are free-view reshapes on the XLA side, so the former one_hot fusions
    and their ~46 MB/batch HBM round trip disappear (profiled ~0.4 ms of
    builds + selector DMA at b=128, O=10).
    """
    cdtype = z2p_ref.dtype
    zf = z2p_ref[...].reshape(G * NZ, NZ * c2)  # rows (g, r), cols (l, c)

    def _oh(cls_col, ncols):  # (R, 1) i32 -> (R, ncols) one-hot rows
        r = cls_col.shape[0]
        ids = jax.lax.broadcasted_iota(jnp.int32, (r, ncols), 1)
        return (ids == cls_col).astype(cdtype)

    # ---- gather + c3 contraction: w3z rows (a, g, l), cols (w, C)
    w3z = None
    for h in range(KW):
        zm = jax.lax.dot_general(
            _oh(ohbd_ref[0][:, h : h + 1], G * NZ),
            zf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (NA*G, NZ*c2) rows (a, g)
        zmr = zm.reshape(NA * G * NZ, c2).astype(cdtype)  # free view
        part = jax.lax.dot_general(
            zmr,
            w3t_ref[h * c2 : (h + 1) * c2, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (NA*G*NZ, KW*c4)
        w3z = part if w3z is None else w3z + part
    w3z = w3z.astype(cdtype)

    # bn3 eval affine per (g, C), broadcast over the b rows
    a3 = jnp.broadcast_to(ab_ref[:, 0][:, None, :], (G, NA, c4)).reshape(G * NA, c4)
    b3 = jnp.broadcast_to(ab_ref[:, 1][:, None, :], (G, NA, c4)).reshape(G * NA, c4)

    # selector one-hots reused across the static a-loop: build once
    hsel = [_oh(hsel_ref[0][:, w : w + 1], G * NZ) for w in range(KW)]
    ecol = _oh(ecol_ref[0], G * NA)
    erow = _oh(erow_ref[0], NA * G)

    # ---- per row-type a: col windows -> bn3/relu -> col expansion
    for a in range(NA):
        blk = w3z[a * G * NZ : (a + 1) * G * NZ]  # (G*NZ, KW*c4) rows (g, l)
        v3 = None
        for w in range(KW):
            piece = jax.lax.dot_general(
                hsel[w],
                blk[:, w * c4 : (w + 1) * c4],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (G*NA, c4) rows (g, b)
            v3 = piece if v3 is None else v3 + piece
        v3r = jnp.maximum(v3 * a3 + b3, 0.0).astype(cdtype)
        m1 = jax.lax.dot_general(
            ecol,
            v3r,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G*S3, c4) rows (g, x)
        m_ref[a] = m1.astype(cdtype).reshape(G, S3 * c4)  # free view

    # ---- row expansion + store: out rows (g, y), cols (x, C)
    out = jax.lax.dot_general(
        erow,
        m_ref[...].reshape(NA * G, S3 * c4),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G*S3, S3*c4)
    out_ref[...] = out.reshape(G, S3, S3, c4).astype(out_ref.dtype)


def typed_c3_expand_v4(
    z2p, idxR, lsel, selR, selC, ab, w3t, *, interpret: bool = False, group: int = 8
):
    """Transpose-free typed c3 + bn3 + relu + dense expansion (see
    _kernel_v4). Same contract as typed_c3_expand, except z2p may be the
    RAW (n, 12, 12, c2) grid — a padded (n, 13, 13, c2) input is sliced
    back down (both idxR == 12 and lsel in {12, 13} select zero)."""
    n, nl, _, c2 = z2p.shape
    assert nl in (NZ, NL), nl
    if nl == NL:
        z2p = z2p[:, :NZ, :NZ]
    s3 = selR.shape[1]
    c4 = ab.shape[2]
    g = group
    while n % g:
        g -= 1
    dt = z2p.dtype

    def gband(x):
        return x.reshape(n // g, g, *x.shape[1:])

    goff = jnp.arange(g, dtype=jnp.int32)

    # i32 class arrays — the kernel builds the one-hot selectors itself
    # (iota == class). All reshapes below are free row-major views; only
    # the tiny (NA, g) transpose of ib is a real (sub-us) op.
    # row-window selector classes, rows (a, g): col g*NZ + idxR when
    # idxR < NZ (12 = the reference path's zero row -> all-zero row here)
    ib = gband(idxR).transpose(0, 2, 1, 3)  # (n/g, NA, g, KW)
    cls = jnp.where(ib < NZ, ib + (goff * NZ)[None, None, :, None], g * NZ)
    ohcls = cls.reshape(n // g, NA * g, KW).astype(jnp.int32)

    # per-w col-window selector classes, rows (g, b): col g*NZ + lsel when
    # lsel < NZ (12 = zero col, 13 = OOB -> all-zero row either way)
    lb = gband(lsel)  # (n/g, g, NA, KW)
    hcls = jnp.where(lb < NZ, lb + (goff * NZ)[None, :, None, None], g * NZ)
    hcls = hcls.reshape(n // g, g * NA, KW).astype(jnp.int32)

    # col-type expansion classes, rows (g, x), cols (g, b)
    ccls = (
        (gband(selC) + (goff * NA)[None, :, None])
        .reshape(n // g, g * s3, 1)
        .astype(jnp.int32)
    )
    # row-type expansion classes, rows (g, y), cols (a, g)
    rcls = (
        (gband(selR) * g + goff[None, :, None])
        .reshape(n // g, g * s3, 1)
        .astype(jnp.int32)
    )

    out = pl.pallas_call(
        functools.partial(_kernel_v4, G=g, S3=s3, c2=c2, c4=c4),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, NZ, NZ, c2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NA * g, KW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * NA, KW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * s3, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * s3, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 2, c4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, s3, s3, c4), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, s3, s3, c4), z2p.dtype),
        scratch_shapes=[pltpu.VMEM((NA, g, s3 * c4), dt)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(z2p, ohcls, hcls, ccls, rcls, ab, w3t.astype(dt))
    return out


def _kernel_v5(
    z2p_ref,  # (G, NZ, NZ, c2) bf16 (unpadded 12x12 type grid)
    ohbd_ref,  # (1, KW, NA*G, G*NZ) bf16 row-window selectors, rows (a, g)
    hs_ref,  # (1, G*NA, KW*G*NZ) bf16 col-window selectors, rows (g, b), cols (w, g, l)
    ecol_ref,  # (1, G*S3, G*NA) bf16 block-diag col-type expansion, rows (g, x)
    erow_ref,  # (1, G*S3, NA*G) bf16 row-type expansion, rows (g, y), cols (a, g)
    ab_ref,  # (G, 2, c4) f32: bn3 eval affine (a, b)
    w3t_ref,  # (KW * c2, KW * c4): ((h, c), (w, C))
    out_ref,  # (G, S3, S3, c4)
    w3r_ref,  # VMEM scratch (KW*G*NZ, NA*c4): w3z repacked rows (w, g, l), cols (a, C)
    m_ref,  # VMEM scratch (NA, G, S3*c4): the half-expanded M, rows (a, g)
    *,
    G: int,
    S3: int,
    c2: int,
    c4: int,
):
    """Batched-stage v5 (round 4). v4 removed the transposes but left the
    column-window + col-expansion stages as 56 + 14 SMALL dots per program
    (M=112, K=96/112, N=256) — measured ~2.5 ms of MXU pipeline bubbles at
    serving shapes (each dot drains the systolic array at K<128). v5 keeps
    v4's row orders for stages 1/2/5 and repacks w3z once into a VMEM
    scratch with rows (w, g, l) and cols (a, C) — 56 CONTIGUOUS block
    copies (vector-rate, no sublane transpose: each (G*NZ, c4) tile moves
    row-block -> row-block at a column offset) — so that:

      stage 3 is ONE dot: v3  = HS @ W3R       (G*NA, KW*G*NZ)(.., NA*c4)
      stage 4 is ONE dot: m1  = ecol @ v3r     (G*S3, G*NA)(.., NA*c4)
      stage 5 feed: m_ref[a] = m1[:, aC]       free row-major views

    Identical FLOPs (the block-diagonal zeros contract exactly as v4's
    per-a slices), but K=384/112 and N=3584 keep the MXU pipeline full.
    """
    cdtype = z2p_ref.dtype
    zf = z2p_ref[...].reshape(G * NZ, NZ * c2)  # rows (g, r), cols (l, c)

    # ---- gather + c3 contraction: w3z rows (a, g, l), cols (w, C)
    w3z = None
    for h in range(KW):
        zm = jax.lax.dot_general(
            ohbd_ref[0, h],
            zf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (NA*G, NZ*c2) rows (a, g)
        zmr = zm.reshape(NA * G * NZ, c2).astype(cdtype)  # free view
        part = jax.lax.dot_general(
            zmr,
            w3t_ref[h * c2 : (h + 1) * c2, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (NA*G*NZ, KW*c4)
        w3z = part if w3z is None else w3z + part
    w3z = w3z.astype(cdtype)

    # ---- repack (a, g, l)x(w, C) -> (w, g, l)x(a, C): contiguous blocks
    for a in range(NA):
        blk = w3z[a * G * NZ : (a + 1) * G * NZ]  # (G*NZ, KW*c4) rows (g, l)
        for w in range(KW):
            w3r_ref[w * G * NZ : (w + 1) * G * NZ, a * c4 : (a + 1) * c4] = blk[
                :, w * c4 : (w + 1) * c4
            ]

    # ---- column windows, ALL row types at once: v3 rows (g, b), cols (a, C)
    v3 = jax.lax.dot_general(
        hs_ref[0],
        w3r_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G*NA, NA*c4)

    # bn3 eval affine per (g, C), broadcast over b rows and a columns
    a3 = jnp.broadcast_to(ab_ref[:, 0][:, None, None, :], (G, NA, NA, c4)).reshape(
        G * NA, NA * c4
    )
    b3 = jnp.broadcast_to(ab_ref[:, 1][:, None, None, :], (G, NA, NA, c4)).reshape(
        G * NA, NA * c4
    )
    v3r = jnp.maximum(v3 * a3 + b3, 0.0).astype(cdtype)

    # ---- col expansion, ALL row types at once: m1 rows (g, x), cols (a, C)
    m1 = jax.lax.dot_general(
        ecol_ref[0],
        v3r,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdtype)  # (G*S3, NA*c4)
    for a in range(NA):
        m_ref[a] = m1[:, a * c4 : (a + 1) * c4].reshape(G, S3 * c4)  # free view

    # ---- row expansion + store: out rows (g, y), cols (x, C)
    out = jax.lax.dot_general(
        erow_ref[0],
        m_ref[...].reshape(NA * G, S3 * c4),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G*S3, S3*c4)
    out_ref[...] = out.reshape(G, S3, S3, c4).astype(out_ref.dtype)


def typed_c3_expand_v5(
    z2p, idxR, lsel, selR, selC, ab, w3t, *, interpret: bool = False, group: int = 8
):
    """Batched-stage typed c3 + bn3 + relu + dense expansion (see
    _kernel_v5). Same contract as typed_c3_expand_v4."""
    n, nl, _, c2 = z2p.shape
    assert nl in (NZ, NL), nl
    if nl == NL:
        z2p = z2p[:, :NZ, :NZ]
    s3 = selR.shape[1]
    c4 = ab.shape[2]
    g = group
    while n % g:
        g -= 1
    dt = z2p.dtype

    def gband(x):
        return x.reshape(n // g, g, *x.shape[1:])

    goff = jnp.arange(g, dtype=jnp.int32)

    # row-window selectors, rows (a, g) — identical to v4
    ib = gband(idxR).transpose(0, 2, 1, 3)  # (n/g, NA, g, KW)
    cls = jnp.where(ib < NZ, ib + (goff * NZ)[None, None, :, None], g * NZ)
    ohbd = jax.nn.one_hot(cls, g * NZ, dtype=dt)  # (n/g, NA, g, KW, g*NZ)
    ohbd = ohbd.transpose(0, 3, 1, 2, 4).reshape(n // g, KW, NA * g, g * NZ)

    # merged col-window selector, rows (g, b), cols (w, g, l): one 1 per w
    # at col w*g*NZ + g*NZ + lsel (OOB lsel -> class g*NZ*KW = all-zero);
    # distinct w land in distinct column blocks, so the sum cannot collide
    lb = gband(lsel)  # (n/g, g, NA, KW)
    wof = jnp.arange(KW, dtype=jnp.int32)
    hcls = jnp.where(
        lb < NZ,
        lb + (goff * NZ)[None, :, None, None] + (wof * (g * NZ))[None, None, None, :],
        g * NZ * KW,
    )
    hs = jax.nn.one_hot(hcls, g * NZ * KW, dtype=dt).sum(3)  # (n/g, g, NA, KW*g*NZ)
    hs = hs.reshape(n // g, g * NA, KW * g * NZ)

    # col-type expansion, rows (g, x), cols (g, b)
    ecol = jax.nn.one_hot(
        gband(selC) + (goff * NA)[None, :, None], g * NA, dtype=dt
    ).reshape(n // g, g * s3, g * NA)
    # row-type expansion, rows (g, y), cols (a, g)
    erow = jax.nn.one_hot(
        gband(selR) * g + goff[None, :, None], NA * g, dtype=dt
    ).reshape(n // g, g * s3, NA * g)

    out = pl.pallas_call(
        functools.partial(_kernel_v5, G=g, S3=s3, c2=c2, c4=c4),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, NZ, NZ, c2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, KW, NA * g, g * NZ), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, g * NA, KW * g * NZ), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, g * s3, g * NA), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * s3, NA * g), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 2, c4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, s3, s3, c4), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, s3, s3, c4), z2p.dtype),
        scratch_shapes=[
            pltpu.VMEM((KW * g * NZ, NA * c4), dt),
            pltpu.VMEM((NA, g, s3 * c4), dt),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(z2p, ohbd, hs, ecol, erow, ab, w3t.astype(dt))
    return out


def _kernel_v6(
    z2p_ref,  # (G, NZ, NZ, c2) bf16 (unpadded 12x12 type grid)
    ohbd_ref,  # (1, KW, NA*G, G*NZ) bf16 row-window selectors, rows (a, g)
    hs_ref,  # (1, G*NA, KW*G*NZ) bf16 col-window selectors, rows (g, b), cols (w, g, l)
    ecol_ref,  # (1, G*S3, G*NA) bf16 block-diag col-type expansion, rows (g, x)
    erow_ref,  # (1, G*S3, NA*G) bf16 row-type expansion, rows (g, y), cols (a, g)
    ab_ref,  # (G, 2, c4) f32: bn3 eval affine (a, b)
    w3t_ref,  # (KW * c2, KW * c4): ((h, c), (w, C))
    out_ref,  # (G, S3, S3, c4)
    w3r_ref,  # VMEM scratch (KW*G*NZ, c4): ONE row type's repacked block
    m_ref,  # VMEM scratch (NA, G, S3*c4): the half-expanded M, rows (a, g)
    *,
    G: int,
    S3: int,
    c2: int,
    c4: int,
):
    """Per-row-type small-scratch repack (round 4). Middle ground between
    v4 (56 small K=96 stage-3 dots -> MXU drain bubbles) and v5 (one big
    K=384/N=3584 dot fed by a 2.7 MB scratch repack, which won isolated
    but LOST end-to-end to scratch-copy serialization). v6 keeps v4's
    static per-a loop but repacks ONE row type's (G*NZ, KW*c4) block into
    a reused (KW*G*NZ, c4) scratch (4 contiguous 96x256 copies), turning
    the 4 K=96 dots into a single K=384 dot per a: 56 -> 14 stage-3 dots
    with only 192 KB of scratch live at a time."""
    cdtype = z2p_ref.dtype
    zf = z2p_ref[...].reshape(G * NZ, NZ * c2)  # rows (g, r), cols (l, c)

    # ---- gather + c3 contraction: w3z rows (a, g, l), cols (w, C)
    w3z = None
    for h in range(KW):
        zm = jax.lax.dot_general(
            ohbd_ref[0, h],
            zf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (NA*G, NZ*c2) rows (a, g)
        zmr = zm.reshape(NA * G * NZ, c2).astype(cdtype)  # free view
        part = jax.lax.dot_general(
            zmr,
            w3t_ref[h * c2 : (h + 1) * c2, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (NA*G*NZ, KW*c4)
        w3z = part if w3z is None else w3z + part
    w3z = w3z.astype(cdtype)

    # bn3 eval affine per (g, C), broadcast over the b rows
    a3 = jnp.broadcast_to(ab_ref[:, 0][:, None, :], (G, NA, c4)).reshape(G * NA, c4)
    b3 = jnp.broadcast_to(ab_ref[:, 1][:, None, :], (G, NA, c4)).reshape(G * NA, c4)

    # ---- per row-type a: repack -> ONE K=KW*G*NZ dot -> bn3/relu -> expand
    for a in range(NA):
        blk = w3z[a * G * NZ : (a + 1) * G * NZ]  # (G*NZ, KW*c4) rows (g, l)
        for w in range(KW):
            w3r_ref[w * G * NZ : (w + 1) * G * NZ, :] = blk[:, w * c4 : (w + 1) * c4]
        v3 = jax.lax.dot_general(
            hs_ref[0],
            w3r_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G*NA, c4) rows (g, b)
        v3r = jnp.maximum(v3 * a3 + b3, 0.0).astype(cdtype)
        m1 = jax.lax.dot_general(
            ecol_ref[0],
            v3r,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G*S3, c4) rows (g, x)
        m_ref[a] = m1.astype(cdtype).reshape(G, S3 * c4)  # free view

    # ---- row expansion + store: out rows (g, y), cols (x, C)
    out = jax.lax.dot_general(
        erow_ref[0],
        m_ref[...].reshape(NA * G, S3 * c4),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G*S3, S3*c4)
    out_ref[...] = out.reshape(G, S3, S3, c4).astype(out_ref.dtype)


def typed_c3_expand_v6(
    z2p, idxR, lsel, selR, selC, ab, w3t, *, interpret: bool = False, group: int = 8
):
    """Per-row-type small-scratch repack typed c3 (see _kernel_v6). Same
    contract as typed_c3_expand_v4."""
    n, nl, _, c2 = z2p.shape
    assert nl in (NZ, NL), nl
    if nl == NL:
        z2p = z2p[:, :NZ, :NZ]
    s3 = selR.shape[1]
    c4 = ab.shape[2]
    g = group
    while n % g:
        g -= 1
    dt = z2p.dtype

    def gband(x):
        return x.reshape(n // g, g, *x.shape[1:])

    goff = jnp.arange(g, dtype=jnp.int32)

    # row-window selectors, rows (a, g) — identical to v4
    ib = gband(idxR).transpose(0, 2, 1, 3)  # (n/g, NA, g, KW)
    cls = jnp.where(ib < NZ, ib + (goff * NZ)[None, None, :, None], g * NZ)
    ohbd = jax.nn.one_hot(cls, g * NZ, dtype=dt)  # (n/g, NA, g, KW, g*NZ)
    ohbd = ohbd.transpose(0, 3, 1, 2, 4).reshape(n // g, KW, NA * g, g * NZ)

    # merged col-window selector, rows (g, b), cols (w, g, l) — identical to v5
    lb = gband(lsel)  # (n/g, g, NA, KW)
    wof = jnp.arange(KW, dtype=jnp.int32)
    hcls = jnp.where(
        lb < NZ,
        lb + (goff * NZ)[None, :, None, None] + (wof * (g * NZ))[None, None, None, :],
        g * NZ * KW,
    )
    hs = jax.nn.one_hot(hcls, g * NZ * KW, dtype=dt).sum(3)  # (n/g, g, NA, KW*g*NZ)
    hs = hs.reshape(n // g, g * NA, KW * g * NZ)

    # col-type expansion, rows (g, x), cols (g, b)
    ecol = jax.nn.one_hot(
        gband(selC) + (goff * NA)[None, :, None], g * NA, dtype=dt
    ).reshape(n // g, g * s3, g * NA)
    # row-type expansion, rows (g, y), cols (a, g)
    erow = jax.nn.one_hot(
        gband(selR) * g + goff[None, :, None], NA * g, dtype=dt
    ).reshape(n // g, g * s3, NA * g)

    out = pl.pallas_call(
        functools.partial(_kernel_v6, G=g, S3=s3, c2=c2, c4=c4),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, NZ, NZ, c2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, KW, NA * g, g * NZ), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, g * NA, KW * g * NZ), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, g * s3, g * NA), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * s3, NA * g), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 2, c4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, s3, s3, c4), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, s3, s3, c4), z2p.dtype),
        scratch_shapes=[
            pltpu.VMEM((KW * g * NZ, c4), dt),
            pltpu.VMEM((NA, g, s3 * c4), dt),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(z2p, ohbd, hs, ecol, erow, ab, w3t.astype(dt))
    return out


def typed_c3_inputs_from_windows(idxR, winKC, sel3R, sel3C):
    """Adapter from the generator's window arrays to this kernel's inputs:
    winKC in 0..13 with 0 = OOB -> lsel in 0..13 with 13 = OOB."""
    lsel = jnp.where(winKC > 0, winKC - 1, NL).astype(jnp.int32)
    return idxR.astype(jnp.int32), lsel, sel3R.astype(jnp.int32), sel3C.astype(jnp.int32)
