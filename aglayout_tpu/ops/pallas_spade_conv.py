"""Pallas TPU kernel: fused SPADE-apply + few-output-channel KxK conv.

Serves the decoder's RGB heads (c4: 7x7 64->3, c7: 7x7 128->3 — reference
models/generator_obj_att128.py:549-604), whose 3 output channels XLA
implements as a giant VPU fusion (measured 35 ms of a 68 ms 128^2 serving
batch). This kernel replaces [SPADE eval apply -> relu -> conv] with one
pass:

  1. prologue (VPU): y = relu(x * A + B) where A/B are the SPADE+BN folded
     per-pixel affine coefficients. Because the SPADE segmap is an f-times
     nearest-upsampled 8x8 layout feature, A/B take one of 5 row-classes x
     5 col-classes per block (see models/norms.py SPADE fast path); they are
     passed as compact row-class-expanded tables (B, HB, 5, W, C) and
     indexed with static (block, class) offsets — the full-resolution
     gamma/beta tensors (and their measured 13 ms of assembly copies) never
     exist.
  2. kn2row matmul (MXU): z[t*O+o, p] = sum_c W[t, o, c] * y[p, c] — one
     (K*K*O, C) x (C, rows*W) contraction per row-chunk, taps in the MAJOR
     dim so the reduction below runs at full lane width.
  3. shifted-slice reduction (VPU): out[o, h*W+w] += z[t*O+o, (h+dy)*W+(w+dx)]
     — because W equals the 128 lane width (or divides it), a spatial shift
     is a static linear lane offset plus an iota%W edge mask.

Exact in f32 (interpret-mode tests vs lax.conv composition); in bf16 the
merged-channel intermediate takes one extra rounding, same as any bf16 conv.
Serving/eval only (no custom VJP; the train step uses the dense path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GUARD = 8  # zero columns either side of the z scratch so tap slices never underflow


def _row_class(u: int, f: int) -> int:
    """SPADE block-row class of offset u in an f-pixel block (f >= 5)."""
    return 0 if u == 0 else 1 if u == 1 else 3 if u == f - 2 else 4 if u == f - 1 else 2


def _kernel(
    x_ref,
    a_ref,
    b_ref,
    w_ref,
    bias_ref,
    *rest,
    H: int,
    W: int,
    C: int,
    K: int,
    O: int,
    f: int,
    chunk: int,
    transposed: bool,
    compact: bool,
):
    # positional tail: [oh_ref (compact only)], out_ref, then scratch
    # y_ref, zt_ref, [ae_ref, be_ref (compact only)]
    if compact:
        oh_ref, out_ref, y_ref, zt_ref, ae_ref, be_ref = rest
    else:
        out_ref, y_ref, zt_ref = rest
    r = K // 2
    rows = chunk + 2 * r
    n_chunk = H // chunk
    kko = K * K * O
    hb = H // f

    if compact:
        # W-expand the class tables once per program with ONE one-hot
        # matmul each: (W, WB*5) @ (WB*5, HB*5*C) — exact 0/1 selection,
        # so the expansion is a copy, not arithmetic. Row (blk, cls)
        # coefficients then live at lane slice [(blk*5+cls)*C : +C].
        wb5 = (W // f) * 5
        for src, dst in ((a_ref, ae_ref), (b_ref, be_ref)):
            dst[...] = jax.lax.dot_general(
                oh_ref[...],
                src[0].reshape(wb5, hb * 5 * C),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dst.dtype)

    lane = jax.lax.broadcasted_iota(jnp.int32, (O, chunk * W), 1) % W
    bias = bias_ref[0].astype(jnp.float32).reshape(O, 1)

    for c in range(n_chunk):
        # ---- 1. SPADE-applied input rows [c*chunk - r, c*chunk + chunk + r)
        for j in range(rows):
            g = c * chunk + j - r
            if g < 0 or g >= H:
                y_ref[j] = jnp.zeros((W, C), y_ref.dtype)
            else:
                blk, u = divmod(g, f)
                cls = _row_class(u, f)
                xr = x_ref[g] if transposed else x_ref[0, g]
                xa = xr.astype(jnp.float32)
                if compact:
                    off = (blk * 5 + cls) * C
                    av = ae_ref[:, off : off + C].astype(jnp.float32)
                    bv = be_ref[:, off : off + C].astype(jnp.float32)
                else:
                    av = a_ref[0, blk, cls].astype(jnp.float32)
                    bv = b_ref[0, blk, cls].astype(jnp.float32)
                y_ref[j] = jnp.maximum(xa * av + bv, 0.0).astype(y_ref.dtype)

        # ---- 2. kn2row matmul, taps-major: (K*K*O, rows*W)
        rhs = y_ref[...].reshape(rows * W, C)
        z = jax.lax.dot_general(
            w_ref[...],
            rhs,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K*K*O, rows*W)
        zt_ref[:, _GUARD : _GUARD + rows * W] = z.astype(zt_ref.dtype)

        # ---- 3. shifted-slice reduction into (O, chunk*W)
        acc = jnp.broadcast_to(bias, (O, chunk * W)).astype(jnp.float32)
        for dy in range(K):
            for dx in range(K):
                t = dy * K + dx
                sx = dx - r
                base = _GUARD + dy * W + sx
                seg = zt_ref[t * O : (t + 1) * O, base : base + chunk * W].astype(
                    jnp.float32
                )
                if sx > 0:
                    seg = jnp.where(lane < (W - sx), seg, 0.0)
                elif sx < 0:
                    seg = jnp.where(lane >= (-sx), seg, 0.0)
                acc = acc + seg
        out_ref[0, :, c * chunk * W : (c + 1) * chunk * W] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("f", "interpret", "chunk", "transposed", "compact")
)
def spade_few_out_conv(
    x,
    a_tab,
    b_tab,
    kernel,
    bias=None,
    *,
    f: int,
    interpret: bool = False,
    chunk: int = 32,
    transposed: bool = False,
    compact: bool = False,
):
    """relu(x * A + B) convolved with a small-output-channel KxK kernel.

    x:     (B, H, W, C) pre-normalization features (the preceding conv's
           output), NHWC — or (H, W, B, C) when transposed=True. The
           transposed form exists because XLA lays conv outputs out as
           {3,0,2,1} (memory order H,W,B,C): `jnp.transpose(h, (1,2,0,3))`
           of a conv output is then a free bitcast into this kernel, where
           the NHWC form forces a measured ~1.6 ms relayout copy in front
           of the custom call.
    a_tab: (B, H//f, 5, W, C) folded SPADE multiplier by (row block,
           row class, column); see `SPADE.folded_affine_tables`. With
           compact=True: (B, (W//f)*5, H//f, 5, C) class-resolution tables
           (`SPADE.folded_affine_tables_compact_flat`) — ~f/5x smaller;
           the W expansion happens in-kernel as one exact one-hot matmul
           per program, so the XLA-side W-expanded table assembly
           (measured ~2 ms/batch at 128^2) never runs. Needs C % 128 == 0
           (the per-(row block, class) coefficients are read as C-wide
           lane slices of the expanded scratch).
    b_tab: same-shape folded SPADE offset.
    kernel: (K, K, C, O) with O small (<= 8); bias: (O,) or None.
    f: the segmap upsample factor (>= 5) defining the 5 row classes.

    Returns (B, H, W, O) in x.dtype.
    """
    if transposed:
        H, W, bsz, C = x.shape
        # Mosaic needs the block's minor dim 128-aligned: fold (B, C) into
        # one minor axis (a bitcast) and carve per-image C-wide slices.
        assert C % 128 == 0, "transposed path needs C % 128 == 0"
        x = x.reshape(H, W, bsz * C)
    else:
        bsz, H, W, C = x.shape
    K = kernel.shape[0]
    O = kernel.shape[3]
    assert kernel.shape[1] == K and kernel.shape[2] == C
    assert O <= 8 and K % 2 == 1
    assert H % f == 0
    if compact:
        assert C % 128 == 0, "compact tables need C % 128 == 0 lane slices"
        assert W % f == 0 and a_tab.shape == (bsz, (W // f) * 5, H // f, 5, C), (
            a_tab.shape
        )
    else:
        assert a_tab.shape == (bsz, H // f, 5, W, C)
    assert 128 % W == 0 or W % 128 == 0, "W must divide into or be a multiple of lanes"
    chunk = min(chunk, H)
    assert H % chunk == 0
    r = K // 2

    # (K*K*O, C) taps-major flat kernel
    w_flat = (
        kernel.reshape(K * K, C, O).transpose(0, 2, 1).reshape(K * K * O, C).astype(x.dtype)
    )
    bias = jnp.zeros((O,), jnp.float32) if bias is None else bias.astype(jnp.float32)

    x_spec = (
        pl.BlockSpec((H, W, C), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        if transposed
        else pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    )
    if compact:
        tab_spec = pl.BlockSpec(
            (1, (W // f) * 5, H // f, 5, C),
            lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        tab_spec = pl.BlockSpec(
            (1, H // f, 5, W, C), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM
        )
    in_specs = [
        x_spec,
        tab_spec,
        tab_spec,
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [x, a_tab, b_tab, w_flat, bias.reshape(1, O)]
    scratch = [
        pltpu.VMEM((chunk + 2 * r, W, C), x.dtype),
        pltpu.VMEM((K * K * O, _GUARD + (chunk + 2 * r) * W + _GUARD), x.dtype),
    ]
    if compact:
        # static column-class one-hot: column j -> (j//f)*5 + class(j%f)
        colcls = jnp.asarray(
            [(j // f) * 5 + _row_class(j % f, f) for j in range(W)], jnp.int32
        )
        onehot = jax.nn.one_hot(colcls, (W // f) * 5, dtype=x.dtype)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(onehot)
        scratch += [
            pltpu.VMEM((W, (H // f) * 5 * C), x.dtype),
            pltpu.VMEM((W, (H // f) * 5 * C), x.dtype),
        ]
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            H=H, W=W, C=C, K=K, O=O, f=f,
            chunk=chunk, transposed=transposed, compact=compact,
        ),
        grid=(bsz,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, O, H * W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, O, H * W), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    # (B, O, H*W) -> (B, H, W, O)
    return out.reshape(bsz, O, H, W).transpose(0, 2, 3, 1)


def _head8_kernel(
    x_any,  # (H, W, B, C) in ANY/HBM — the conv-native transposed view
    a_ref,  # (1, HB, 5, WB*5, 8, C) compact class tables (full HB: halo rows
    b_ref,  #   need the neighbor blocks' coefficients)
    w_ref,  # (K*K*O, C) taps-major flat kernel
    bias_ref,  # (1, O)
    out_ref,  # (1, 1, O, f*W*8)
    xw0_ref,  # (rows, W, 8, C) DMA window scratch, even programs
    xw1_ref,  # (rows, W, 8, C) DMA window scratch, odd programs
    yw_ref,  # (rows, W, 8, C) applied activations
    zt_ref,  # (K*K*O, guard + rows*W*8 + guard)
    ae_ref,  # (5 + 2r, W, 8, C) expanded coefficient slots (see `slots`)
    be_ref,
    sem,  # (2,) DMA semaphores, one per window buffer
    *,
    H: int,
    W: int,
    C: int,
    K: int,
    O: int,
    f: int,
    NB: int,
    FB: int = 1,
):
    i = pl.program_id(0)
    jb = pl.program_id(1)
    hb = H // (f * FB)  # FB f-row-blocks per program
    r = K // 2
    fout = f * FB
    rows = fout + 2 * r
    guard = _GUARD * 8

    # ---- clipped window DMA: global rows [jb*fout - r, jb*fout + fout + r)
    # ∩ [0, H), double-buffered ACROSS grid programs: program p (sequential
    # on the core) issues the DMA for program p+1's window before computing,
    # so the window transfer has the whole previous program's compute to land
    # — in the full model the strided (8-image, 2 KB-chunk) reads contend
    # with surrounding ops and a within-program start/wait leaves the
    # kernel DMA-latency-bound. Dynamic start, static size: the start is
    # clamped into range; the apply below compensates with `shift`.
    p_lin = i * hb + jb
    n_prog = NB * hb
    even = jax.lax.rem(p_lin, 2) == 0

    def window_copy(pp, xwr, s):
        ii = pp // hb
        jj = jax.lax.rem(pp, hb)
        raw = jj * fout - r
        s0 = jnp.clip(raw, 0, H - rows)
        return pltpu.make_async_copy(
            x_any.at[pl.ds(s0, rows), :, pl.ds(ii * 8, 8), :],
            xwr,
            sem.at[s],
        )

    @pl.when(p_lin == 0)
    def _():
        window_copy(0, xw0_ref, 0).start()

    nxt = p_lin + 1

    @pl.when((nxt < n_prog) & even)  # next program is odd -> buffer 1
    def _():
        window_copy(nxt, xw1_ref, 1).start()

    @pl.when((nxt < n_prog) & jnp.logical_not(even))
    def _():
        window_copy(nxt, xw0_ref, 0).start()

    # ---- expand the (block, class) coefficient slots needed by the
    # window while the DMA is in flight. Slots: 5L+c = local f-block L
    # (global f-block jb*FB + L) class c; then r top-halo slots from
    # f-block jb*FB - 1 and r bottom-halo slots from f-block jb*FB + FB.
    # Neighbor indices are clamped; their values are never read at the
    # edges (those rows are zeroed as conv padding).
    jprev = jnp.maximum(jb * FB - 1, 0)
    jnext = jnp.minimum(jb * FB + FB, H // f - 1)
    slots = [(5 * L + c, jb * FB + L, c) for L in range(FB) for c in range(5)]
    # top halo rows u<r live in f-block jb*FB-1 at in-block positions
    # f-r+u; bottom halo rows u>=fout+r live in f-block jb*FB+FB at u-(fout+r)
    slots += [(5 * FB + u, jprev, _row_class(f - r + u, f)) for u in range(r)]
    slots += [(5 * FB + r + u, jnext, _row_class(u, f)) for u in range(r)]
    for slot, jsrc, cls in slots:
        for wb in range(W // f):
            base = wb * f
            for u, ccls in ((0, 0), (1, 1), (f - 2, 3), (f - 1, 4)):
                ae_ref[slot, base + u] = a_ref[0, jsrc, cls, wb * 5 + ccls]
                be_ref[slot, base + u] = b_ref[0, jsrc, cls, wb * 5 + ccls]
            ae_ref[slot, base + 2 : base + f - 2] = jnp.broadcast_to(
                a_ref[0, jsrc, cls, wb * 5 + 2], (f - 4, *a_ref.shape[4:])
            )
            be_ref[slot, base + 2 : base + f - 2] = jnp.broadcast_to(
                b_ref[0, jsrc, cls, wb * 5 + 2], (f - 4, *b_ref.shape[4:])
            )

    raw0 = jb * fout - r
    src0 = jnp.clip(raw0, 0, H - rows)
    shift = src0 - raw0  # 0 interior, +r at jb==0, -r at jb==hb-1

    # ---- SPADE apply + relu into the window buffer (window coordinates)
    def apply_rows(xwr):
        for u in range(rows):
            if u < r:
                slot_u = 5 * FB + u  # f-block jb*FB-1
            elif u < fout + r:
                L = (u - r) // f
                slot_u = 5 * L + _row_class((u - r) % f, f)  # local f-block L
            else:
                slot_u = 5 * FB + r + (u - (fout + r))  # f-block jb*FB+FB
            iu = jnp.clip(u - shift, 0, rows - 1)
            xa = xwr[pl.ds(iu, 1)][0]
            yw_ref[u] = jnp.maximum(
                xa * ae_ref[slot_u] + be_ref[slot_u], jnp.zeros((), yw_ref.dtype)
            )

    @pl.when(even)
    def _():
        window_copy(p_lin, xw0_ref, 0).wait()
        apply_rows(xw0_ref)

    @pl.when(jnp.logical_not(even))
    def _():
        window_copy(p_lin, xw1_ref, 1).wait()
        apply_rows(xw1_ref)
    # zero the OOB halo rows (conv zero padding) at the H edges
    zrow = jnp.zeros(yw_ref.shape[1:], yw_ref.dtype)

    @pl.when(jb == 0)
    def _():
        for u in range(r):
            yw_ref[u] = zrow

    @pl.when(jb == hb - 1)
    def _():
        for u in range(r):
            yw_ref[rows - 1 - u] = zrow

    # ---- kn2row matmul, taps-major: (K*K*O, rows*W*8)
    rhs = yw_ref[...].reshape(rows * W * 8, C)
    z = jax.lax.dot_general(
        w_ref[...],
        rhs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zt_ref[:, guard : guard + rows * W * 8] = z.astype(zt_ref.dtype)

    # ---- shifted-slice reduction into (O, fout*W*8): dx -> 8 lanes, dy -> W*8
    wpos = (jax.lax.broadcasted_iota(jnp.int32, (O, fout * W * 8), 1) // 8) % W
    acc = jnp.broadcast_to(
        bias_ref[0].astype(jnp.float32).reshape(O, 1), (O, fout * W * 8)
    ).astype(jnp.float32)
    for dy in range(K):
        for dx in range(K):
            t = dy * K + dx
            sx = dx - r
            base = guard + (dy * W + sx) * 8
            seg = zt_ref[t * O : (t + 1) * O, base : base + fout * W * 8].astype(jnp.float32)
            if sx > 0:
                seg = jnp.where(wpos < (W - sx), seg, 0.0)
            elif sx < 0:
                seg = jnp.where(wpos >= (-sx), seg, 0.0)
            acc = acc + seg
    out_ref[0, 0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("f", "fb", "interpret"))
def spade_few_out_conv8(
    x_t, a_tab, b_tab, kernel, bias=None, *, f: int, fb: int = 1, interpret: bool = False
):
    """Fused [SPADE eval apply -> relu -> few-out KxK conv] consuming the
    TRANSPOSED (H, W, B, C) view of a conv output, 8 images per program.

    v4 of the RGB head (serves c7 at 128^2; reference
    models/generator_obj_att128.py:604). The NHWC head (spade_few_out_conv)
    forces a measured ~1.6 ms relayout of the c6 output ({3,0,2,1} ->
    row-major) in front of the custom call; this kernel reads the
    conv-native layout directly — `jnp.transpose(h, (1,2,0,3))` is a free
    bitcast — with 8-image sublane blocks like `spade_apply8`, and uses the
    same fully-compact class tables (`SPADE.folded_affine_tables_compact`),
    so the flat-table assembly copies disappear too. The H axis cannot be
    blocked with halos by BlockSpecs, so x stays in HBM/ANY and each
    program DMAs its (f + 2r)-row window manually (clipped at the edges;
    coefficient slots for halo rows come from the neighbor row-blocks).

    x_t: (H, W, B, C), B % 8 == 0, C % 128 == 0, H % f == W % f == 0.
    a_tab/b_tab: (B//8, H//f, 5, (W//f)*5, 8, C) from
    `SPADE.folded_affine_tables_compact`. kernel: (K, K, C, O) with O <= 8;
    bias: (O,) or None. Returns (B, H, W, O) in x_t.dtype.

    fb: f-row-blocks processed per program. fb > 1 amortizes the halo: the
    window DMA reads fb*f + 2r rows per fb*f output rows (read
    amplification 1 + 2r/(fb*f)), the kn2row matmul shrinks by the same
    factor, and the per-program coefficient-slot expansion is shared
    across the fb blocks. Needs (H//f) % fb == 0.
    """
    H, W, bsz, C = x_t.shape
    K = kernel.shape[0]
    O = kernel.shape[3]
    hb = H // f
    assert kernel.shape[1] == K and kernel.shape[2] == C
    assert O <= 8 and K % 2 == 1
    assert bsz % 8 == 0 and C % 128 == 0 and H % f == 0 and W % f == 0
    # _row_class's 0/1/interior/f-2/f-1 slot expansion needs the four edge
    # classes at distinct positions; f < 5 would silently alias slots.
    assert f >= 5, f
    assert a_tab.shape == (bsz // 8, hb, 5, (W // f) * 5, 8, C), a_tab.shape
    assert hb % fb == 0, (hb, fb)
    r = K // 2
    fout = f * fb
    rows = fout + 2 * r
    assert H >= rows, (H, rows)

    w_flat = (
        kernel.reshape(K * K, C, O).transpose(0, 2, 1).reshape(K * K * O, C).astype(x_t.dtype)
    )
    bias = jnp.zeros((O,), jnp.float32) if bias is None else bias.astype(jnp.float32)
    tab_spec = pl.BlockSpec(
        (1, hb, 5, (W // f) * 5, 8, C),
        lambda i, j: (i, 0, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(
            _head8_kernel, H=H, W=W, C=C, K=K, O=O, f=f, NB=bsz // 8, FB=fb
        ),
        grid=(bsz // 8, hb // fb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            tab_spec,
            tab_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, O, fout * W * 8), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz // 8, hb // fb, O, fout * W * 8), x_t.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, W, 8, C), x_t.dtype),
            pltpu.VMEM((rows, W, 8, C), x_t.dtype),
            pltpu.VMEM((rows, W, 8, C), x_t.dtype),
            pltpu.VMEM((K * K * O, 2 * _GUARD * 8 + rows * W * 8), x_t.dtype),
            pltpu.VMEM((5 * fb + 2 * r, W, 8, C), x_t.dtype),
            pltpu.VMEM((5 * fb + 2 * r, W, 8, C), x_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_t, a_tab, b_tab, w_flat, bias.reshape(1, O))
    # (B//8, HB//fb, O, fb*f, W, 8) -> (B, H, W, O)
    return (
        out.reshape(bsz // 8, hb // fb, O, fout, W, 8)
        .transpose(0, 5, 1, 3, 4, 2)
        .reshape(bsz, H, W, O)
    )


def _apply8_kernel(x_ref, a_ref, b_ref, out_ref, ae_ref, be_ref, *, f: int, W: int):
    # expand the compact (5rc, wb*5cc, 8, C) cell tables to (5rc, W, 8, C):
    # per (rcls, col block): 4 edge-column tile copies + 1 broadcast over the
    # interior run — every source row is one contiguous (8, C) tile.
    for rcls in range(5):
        for wb in range(W // f):
            base = wb * f
            for u, cls in ((0, 0), (1, 1), (f - 2, 3), (f - 1, 4)):
                ae_ref[rcls, base + u] = a_ref[0, 0, rcls, wb * 5 + cls]
                be_ref[rcls, base + u] = b_ref[0, 0, rcls, wb * 5 + cls]
            ae_ref[rcls, base + 2 : base + f - 2] = jnp.broadcast_to(
                a_ref[0, 0, rcls, wb * 5 + 2], (f - 4, *a_ref.shape[4:])
            )
            be_ref[rcls, base + 2 : base + f - 2] = jnp.broadcast_to(
                b_ref[0, 0, rcls, wb * 5 + 2], (f - 4, *b_ref.shape[4:])
            )
    # apply in the input dtype (bf16 on the serving path — same math as
    # XLA's fused bf16 gamma/beta apply; f32 temporaries here tripled the
    # kernel's scoped-VMEM stack and stalled the Mosaic scheduler)
    zero = jnp.zeros((), x_ref.dtype)
    for u in range(f):
        cls = _row_class(u, f)
        out_ref[u] = jnp.maximum(x_ref[u] * ae_ref[cls] + be_ref[cls], zero)


@functools.partial(jax.jit, static_argnames=("f", "interpret"))
def spade_apply8(x_t, a_tab, b_tab, *, f: int, interpret: bool = False):
    """relu(x * A + B) with fully-compact SPADE class tables, on the
    TRANSPOSED (H, W, B, C) view of a conv output, 8 images per program.

    v2 of `spade_apply_t` (which measured a net LOSS end-to-end): the
    (B, C) minor fold it needed for Mosaic tiling is a real relayout, and
    its W-expanded tables cost ~2 ms of XLA assembly copies. This kernel
    needs neither: blocks are (f, W, 8, C) — an 8-image sublane group
    satisfies the (8, 128) tiling directly, so `jnp.transpose(h,(1,2,0,3))`
    of a conv output stays a free bitcast — and the tables stay at class
    resolution (`SPADE.folded_affine_tables_compact`, ~25x smaller than
    the W-expanded form), expanded in-kernel with (8, C) tile copies.

    Serves the decoder's interior SPADE-4 at 128^2 (reference
    models/generator_obj_att128.py:596), replacing the measured 3.3 ms
    full-resolution gamma/beta assembly copy of the dense eval path.

    x_t: (H, W, B, C) with B % 8 == 0; a_tab/b_tab:
    (B//8, H//f, 5, (W//f)*5, 8, C). Returns (H, W, B, C) in x_t.dtype.
    """
    H, W, bsz, C = x_t.shape
    assert bsz % 8 == 0 and H % f == 0 and W % f == 0
    assert a_tab.shape == (bsz // 8, H // f, 5, (W // f) * 5, 8, C), (
        x_t.shape,
        a_tab.shape,
    )
    tab_spec = pl.BlockSpec(
        (1, 1, 5, (W // f) * 5, 8, C),
        lambda i, j: (i, j, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    io_spec = pl.BlockSpec(
        (f, W, 8, C), lambda i, j: (j, 0, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_apply8_kernel, f=f, W=W),
        grid=(bsz // 8, H // f),
        in_specs=[io_spec, tab_spec, tab_spec],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct(x_t.shape, x_t.dtype),
        scratch_shapes=[
            pltpu.VMEM((5, W, 8, C), x_t.dtype),
            pltpu.VMEM((5, W, 8, C), x_t.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x_t, a_tab, b_tab)


def _apply_kernel(x_ref, a_ref, b_ref, out_ref, *, f: int):
    for u in range(f):
        cls = _row_class(u, f)
        xa = x_ref[u].astype(jnp.float32)
        av = a_ref[0, 0, cls].astype(jnp.float32)
        bv = b_ref[0, 0, cls].astype(jnp.float32)
        out_ref[u] = jnp.maximum(xa * av + bv, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("f", "interpret"))
def spade_apply_t(x_t, a_tab, b_tab, *, f: int, interpret: bool = False):
    """relu(x * A + B) with SPADE folded-affine class tables, on the
    TRANSPOSED (H, W, B, C) view of a conv output.

    Serves the decoder's interior SPADE-4 at 128^2 (reference
    models/generator_obj_att128.py:596): the dense eval path materializes
    full-resolution gamma/beta (B*H*W*2C bf16 ~ 1 GB at b=128) plus a
    measured 3.3 ms relayout copy before XLA can fuse the apply into the
    c6 conv read. This kernel reads the compact (B, H//f, 5, W, C) class
    tables directly and writes the applied activation; wrapped in
    `jnp.transpose` bitcasts it sits copy-free between the c5 and c6 convs
    (both prefer the {3,0,2,1} = (H,W,B,C) memory order).

    x_t: (H, W, B, C); a_tab/b_tab: (B, H//f, 5, W, C) from
    `SPADE.folded_affine_tables`. Returns (H, W, B, C) in x_t.dtype.
    """
    H, W, bsz, C = x_t.shape
    assert H % f == 0 and a_tab.shape == (bsz, H // f, 5, W, C), (
        x_t.shape,
        a_tab.shape,
    )
    # Same Mosaic trick as the transposed head path: fold (B, C) into one
    # 128-aligned minor axis (a bitcast) and carve per-image C-wide slices.
    assert C % 128 == 0, "spade_apply_t needs C % 128 == 0"
    x_flat = x_t.reshape(H, W, bsz * C)
    tab_spec = pl.BlockSpec(
        (1, 1, 5, W, C), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM
    )
    io_spec = pl.BlockSpec((f, W, C), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_apply_kernel, f=f),
        grid=(bsz, H // f),
        in_specs=[io_spec, tab_spec, tab_spec],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct(x_flat.shape, x_t.dtype),
        interpret=interpret,
    )(x_flat, a_tab, b_tab)
    return out.reshape(H, W, bsz, C)
