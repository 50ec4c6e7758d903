"""The layout-to-image VAE-GAN generator, resolution-parameterized.

Capability parity with the reference's models/generator_obj_att.py (64x64)
and models/generator_obj_att128.py (128x128) — which differ only by an
adaptive pool in the LayoutEncoder and a 2x upsample tail in the Decoder —
expressed here as ONE model with `image_size` a parameter (SURVEY.md §2.8).

TPU-first data contract: object-level inputs are dense (B, O_max, ...) with
a boolean validity mask instead of the reference's ragged flat tensors with
obj_to_img index juggling. All object-level BatchNorm is masked, the ConvLSTM
fusion is a masked scan, and ROI crops are MXU einsums.
"""

from __future__ import annotations

from typing import Tuple

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from aglayout_tpu.models.convlstm import LayoutFuser
from aglayout_tpu.models.layers import (
    Conv2d,
    ConvTranspose2d,
    Dense,
    Embed,
    ResidualBlock,
    adaptive_avg_pool,
)
from aglayout_tpu.models.norms import SPADE, ConditionalBatchNorm, MaskedBatchNorm
from aglayout_tpu.ops.bilinear import crop_bbox_dense


def clstm_hidden_dims(clstm_layers: int, conv_dim: int = 64) -> Tuple[int, ...]:
    """Hidden dims by layer count (reference generator_obj_att.py:459-464),
    expressed as multiples of the generator base width (default 64 matches
    the reference's (128, 64, 64) exactly)."""
    cd = conv_dim
    return {1: (cd,), 2: (cd, cd), 3: (2 * cd, cd, cd)}[clstm_layers]


# ---------------------------------------------------------------------------
# Typed-eval geometry (shared by LayoutEncoder._typed_c2c3_eval and the
# exhaustive coverage test tests/test_typed_layout.py): every row/column of
# the c2/c3 output grids must match one of the candidate type rows below, or
# the argmax pattern-matching would silently map it to candidate 0.
# ---------------------------------------------------------------------------


def _tap_geometry(size: int):
    """(taps, inb, inbcode) for the stride-2 k4 window on the padded grid."""
    in_size = size + 2
    s2 = (in_size - 2) // 2 + 1
    taps = 2 * jnp.arange(s2)[:, None] + jnp.arange(4)[None, :] - 1
    inb = (taps >= 0) & (taps < in_size)  # (s2, 4)
    pow2 = jnp.asarray([1, 2, 4, 8], jnp.int32)
    inbcode = jnp.sum(inb * pow2, -1)  # (s2,)
    return taps, inb, inbcode


def _rect_win(taps, lo, hi, size: int):
    """(..., s2, 4) bool: which taps land inside [round(lo*s), round(hi*s))."""
    t0 = jnp.round(lo * size)[..., None, None]
    t1 = jnp.round(hi * size)[..., None, None]
    tt = taps[None, None].astype(jnp.float32) - 1.0  # original-grid coords
    return (tt >= t0) & (tt < t1)


def _axis_typing(rwin, inb, inbcode, lo, hi, size: int):
    """Type one axis of the c2 grid: 12 candidate rows covering every
    realized (inb, rect-window) pattern. Returns (sel, rwinK, inbK,
    covered); `covered` flags rows whose pattern matched a candidate."""
    s2 = rwin.shape[-2]
    pow2 = jnp.asarray([1, 2, 4, 8], jnp.int32)
    code = jnp.sum(rwin * pow2, -1) + 16 * inbcode  # (..., s2)
    yt = jnp.floor((jnp.round(lo * size) - 1.0) / 2.0)
    yb = jnp.floor((jnp.round(hi * size) - 1.0) / 2.0)
    ones = jnp.ones_like(yt)
    cand = jnp.stack(
        [0 * ones, ones, yt - 1, yt, yt + 1, yt + 2,
         yb - 1, yb, yb + 1, yb + 2, (s2 - 2) * ones, (s2 - 1) * ones],
        -1,
    )
    cand = jnp.clip(cand, 0, s2 - 1).astype(jnp.int32)  # (..., 12)
    candcode = jnp.take_along_axis(code, cand, axis=-1)
    eq = code[..., :, None] == candcode[..., None, :]
    covered = jnp.any(eq, axis=-1)  # (..., s2)
    sel = jnp.argmax(eq, axis=-1).astype(jnp.int32)  # (..., s2)
    rwinK = jnp.take_along_axis(rwin, cand[..., None], axis=-2)  # (..., 12, 4)
    inbK = inb[cand]  # (..., 12, 4)
    return sel, rwinK, inbK, covered


def _axis_out_typing(sel, lo, hi, size: int, s2: int, s3: int):
    """Type the c3 output windows (4 input rows, stride 2, pad 1): 14
    candidates on the s3 grid. Returns (sel3, winK, covered)."""
    src = 2 * jnp.arange(s3)[:, None] + jnp.arange(4)[None, :] - 1  # (s3, 4)
    selpad = jnp.pad(sel + 1, [(0, 0)] * (sel.ndim - 1) + [(1, 1)])  # 0 = OOB
    win = selpad[..., jnp.clip(src + 1, 0, s2 + 1)]  # (..., s3, 4) in 0..12
    code = jnp.sum(win * jnp.asarray([1, 13, 169, 2197]), -1)
    yt = jnp.floor((jnp.floor((jnp.round(lo * size) - 1.0) / 2.0) - 1.0) / 2.0)
    yb = jnp.floor((jnp.floor((jnp.round(hi * size) - 1.0) / 2.0) - 1.0) / 2.0)
    ones = jnp.ones_like(yt)
    cand = jnp.stack(
        [0 * ones, ones, yt - 1, yt, yt + 1, yt + 2, yt + 3,
         yb - 1, yb, yb + 1, yb + 2, yb + 3, (s3 - 2) * ones, (s3 - 1) * ones],
        -1,
    )
    cand = jnp.clip(cand, 0, s3 - 1).astype(jnp.int32)  # (..., 14)
    candcode = jnp.take_along_axis(code, cand, axis=-1)
    eq = code[..., :, None] == candcode[..., None, :]
    covered = jnp.any(eq, axis=-1)  # (..., s3)
    sel3 = jnp.argmax(eq, axis=-1).astype(jnp.int32)  # (..., s3)
    winK = jnp.take_along_axis(win, cand[..., None], axis=-2)  # (..., 14, 4)
    return sel3, winK, covered


def typed_axis_coverage(size: int):
    """Exhaustive coverage check of the typed-eval candidates for one axis.

    The typing depends on the box only through its rounded integer edge
    coordinates, and rows/columns are typed independently — so enumerating
    every integer (lo, hi) edge pair in [0, size]^2 is a complete proof for
    a given image size. Returns (covered_c2, covered_c3), each
    (n_pairs,) bool — all True iff no realizable pattern is uncovered.
    """
    taps, inb, inbcode = _tap_geometry(size)
    s2 = inb.shape[0]
    s3 = (s2 - 2) // 2 + 1
    grid = jnp.arange(size + 1, dtype=jnp.float32) / size
    lo = jnp.repeat(grid, size + 1).reshape(1, -1)
    hi = jnp.tile(grid, size + 1).reshape(1, -1)
    rwin = _rect_win(taps, lo, hi, size)[0]  # (P, s2, 4) — drop the lead 1
    sel, _, _, cov2 = _axis_typing(rwin, inb, inbcode, lo[0], hi[0], size)
    _, _, cov3 = _axis_out_typing(sel, lo[0], hi[0], size, s2, s3)
    return jnp.all(cov2, axis=-1), jnp.all(cov3, axis=-1)


class CropEncoder(nn.Module):
    """VAE encoder over object crops -> (z, mu, logvar).

    Reference: models/generator_obj_att.py:367-422. Five conv stages
    64..1024ch with class-conditional BN, adaptive average pool, two heads.
    """

    num_classes: int
    z_dim: int
    conv_dim: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, crops, objs, mask, train: bool):
        # crops: (N, s, s, 3); objs: (N,); mask: (N,)
        ura = not train
        d = self.conv_dim
        specs = [
            (d, 7, 1, 3),
            (d * 2, 4, 2, 1),
            (d * 4, 4, 2, 1),
            (d * 8, 4, 2, 1),
            (d * 16, 4, 2, 1),
        ]
        h = crops
        for i, (feats, k, s, p) in enumerate(specs):
            h = Conv2d(feats, k, stride=s, padding=p, use_bias=False, dtype=self.dtype, name=f"c{i+1}")(h)
            h = ConditionalBatchNorm(feats, self.num_classes, dtype=self.dtype, name=f"bn{i+1}")(
                h, objs, mask, ura
            )
            h = nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        mu = Dense(self.z_dim, dtype=self.dtype, name="fc_mu")(h)
        logvar = Dense(self.z_dim, dtype=self.dtype, name="fc_logvar")(h)
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(self.make_rng("reparam"), std.shape, std.dtype)
        z = eps * std + mu
        return z, mu, logvar


class AttributeEncoder(nn.Module):
    """Class embedding ⊕ multi-hot attributes -> 64-d fused object code.

    Reference: models/generator_obj_att.py:575-600 (MLP 128->64->64 with
    BatchNorm1d). BN is masked over valid object rows.
    """

    num_classes: int
    attribute_dim: int = 106
    embedding_dim: int = 64
    conv_dim: int = 64  # MLP 2cd -> cd -> cd (reference: 128 -> 64 -> 64)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, objs, attribute, mask, train: bool):
        ura = not train
        cd = self.conv_dim
        emb = Embed(self.num_classes, self.embedding_dim, dtype=self.dtype, name="embedding")(objs)
        a = jnp.concatenate([emb, attribute.astype(emb.dtype)], axis=-1)
        a = Dense(2 * cd, dtype=self.dtype, name="c0")(a)
        a = MaskedBatchNorm(2 * cd, dtype=self.dtype, name="bn0")(a, mask, ura)
        a = nn.relu(a)
        a = Dense(cd, dtype=self.dtype, name="c1")(a)
        a = MaskedBatchNorm(cd, dtype=self.dtype, name="bn1")(a, mask, ura)
        a = nn.relu(a)
        return Dense(cd, dtype=self.dtype, name="c2")(a)


class LayoutEncoder(nn.Module):
    """Broadcast object codes into masked planes, encode, fuse via ConvLSTM.

    Reference: models/generator_obj_att.py:449-513 (64) and
    generator_obj_att128.py:449-516 (128: extra AdaptiveAvgPool2d(8)).
    Note the reference's c0 is a 1x1 conv with padding=1 (spatial +2), which
    still lands on 8x8 after the stride-2 stages — reproduced faithfully.

    TPU fast path (eval/serving): the per-object input plane is exactly
    ``q + (p - q) * rect`` — a constant inside the object's box and a
    constant outside (the broadcast object code through the 1x1 conv and the
    eval-mode affine CBN). The broadcast + c0 + bn1 + relu + c2 pipeline
    therefore collapses into tiny einsums over separable binary box-window
    matrices (exact, same math) instead of materializing (B, O, H+2, W+2, C)
    planes and running full convs over them — the single largest
    memory-traffic and FLOP hotspot of the serving path.
    """

    num_classes: int
    image_size: int = 64
    conv_dim: int = 64
    resi_num: int = 6
    clstm_dims: Tuple[int, ...] = (128, 64, 64)
    z_dim: int = 64
    # Pallas kernel for the typed-c3 back half (TPU serving; see
    # ops/pallas_typed_expand.py)
    pallas_typed: bool = False
    # fused 6-resblock 8x8 trunk kernel on the eval path (TPU serving; see
    # ops/pallas_resblocks.py — the XLA graph of 12 tiny convs is pure
    # per-op-latency tail at these shapes)
    pallas_trunk: bool = False
    # opt-in approximate int8 serving: ConvLSTM gate convs through the
    # Pallas int8 kernel (ops/pallas_conv8_int8.py). Serving only.
    int8_serving: bool = False
    # lax.scan unroll factor for the object-axis ConvLSTM in EVAL mode
    # (exact; removes per-step while-loop bookkeeping). Train keeps 1.
    clstm_eval_unroll: int = 1
    dtype: jnp.dtype | None = None

    def setup(self):
        d = self.conv_dim
        c0_in = self.conv_dim + self.z_dim  # attribute code (cd) ⊕ z
        self.c0 = Conv2d(
            d, 1, stride=1, padding=1, use_bias=False, dtype=self.dtype, in_features=c0_in
        )
        self.bn1 = ConditionalBatchNorm(d, self.num_classes, dtype=self.dtype)
        self.c2 = Conv2d(
            d * 2, 4, stride=2, padding=1, use_bias=False, dtype=self.dtype, in_features=d
        )
        self.bn2 = ConditionalBatchNorm(d * 2, self.num_classes, dtype=self.dtype)
        self.c3 = Conv2d(
            d * 4, 4, stride=2, padding=1, use_bias=False, dtype=self.dtype,
            in_features=d * 2,
        )
        self.bn3 = ConditionalBatchNorm(d * 4, self.num_classes, dtype=self.dtype)
        self.c4 = Conv2d(
            d * 8, 4, stride=2, padding=1, use_bias=False, dtype=self.dtype,
            in_features=d * 4,
        )
        self.bn4 = ConditionalBatchNorm(d * 8, self.num_classes, dtype=self.dtype)
        self.clstm = LayoutFuser(
            self.clstm_dims, int8_serving=self.int8_serving, dtype=self.dtype
        )
        self.residuals = [
            ResidualBlock(self.clstm_dims[-1], dtype=self.dtype, name=f"residual_{i}")
            for i in range(self.resi_num)
        ]

    def _fused_stage1(self, vec, boxes, objs, valid=None, train: bool = False):
        """Exact broadcast+c0+bn1+relu+c2 on rectangular masks.

        vec: (B, O, C0) object codes; boxes: (B, O, 4) normalized;
        objs: (B, O) classes; valid: (B, O) row mask (train mode).
        Returns the c2 output (B*O, S2, S2, 2d).

        In train mode the bn1 batch statistics are computed ANALYTICALLY:
        the c0 output per object is Wv inside its box (area pixels) and 0
        elsewhere, so the masked batch moments reduce to area-weighted sums
        over objects — same math as the dense path, no (B*O, S+2, S+2, C)
        materialization, gradients flow through the closed form.
        """
        b, o, c0_dim = vec.shape
        d = self.conv_dim
        size = self.image_size
        in_size = size + 2  # c0's padding=1 quirk
        out_size = (in_size + 2 - 4) // 2 + 1
        dtype = self.dtype or vec.dtype

        w0 = self.c0.kernel[0, 0].astype(dtype)  # (C0, d)
        wv = jnp.einsum("bod,dk->bok", vec.astype(dtype), w0)
        if not train:
            a, bb = self.bn1.eval_affine(objs.reshape(-1))  # (B*O, d)
        else:
            # analytic masked batch moments of the c0 output
            wvf = wv.astype(jnp.float32).reshape(b * o, d)
            r0 = jnp.clip(jnp.round(boxes[..., 1] * size), 0, size)
            r1 = jnp.clip(jnp.round(boxes[..., 3] * size), 0, size)
            c0_ = jnp.clip(jnp.round(boxes[..., 0] * size), 0, size)
            c1 = jnp.clip(jnp.round(boxes[..., 2] * size), 0, size)
            area = (
                jnp.maximum(r1 - r0, 0.0) * jnp.maximum(c1 - c0_, 0.0)
            ).reshape(b * o)
            w = valid.reshape(b * o).astype(jnp.float32)
            cnt = jnp.sum(w) * float(in_size * in_size)
            mean = jnp.sum((w * area)[:, None] * wvf, axis=0) / cnt
            ex2 = jnp.sum((w * area)[:, None] * wvf * wvf, axis=0) / cnt
            var = ex2 - mean * mean
            a, bb = self.bn1.train_affine(objs.reshape(-1), mean, var, cnt)
        a = a.reshape(b, o, d).astype(dtype)
        bb = bb.reshape(b, o, d).astype(dtype)
        p = nn.relu(a * wv + bb)  # inside-box constant
        q = nn.relu(bb)  # outside-box constant (incl. padding ring)

        w2 = self.c2.kernel.astype(dtype)  # (4, 4, d, 2d)
        kq = jnp.einsum("hwdc,bod->bohwc", w2, q)
        kp = jnp.einsum("hwdc,bod->bohwc", w2, p - q)

        # tap coordinate in the padded (in_size) grid: t = 2*y + dy - 1
        ys = jnp.arange(out_size)
        taps = 2 * ys[:, None] + jnp.arange(4)[None, :] - 1  # (out, 4)
        inb = ((taps >= 0) & (taps < in_size)).astype(dtype)  # image bounds

        # rect rows/cols in the padded grid are [round(lo*size)+1, round(hi*size)+1)
        def rect_win(lo, hi):
            t0 = jnp.round(lo * size)[..., None, None]  # (B, O, 1, 1)
            t1 = jnp.round(hi * size)[..., None, None]
            tt = taps[None, None].astype(jnp.float32) - 1.0  # original-grid coords
            return ((tt >= t0) & (tt < t1)).astype(dtype)  # (B, O, out, 4)

        rr = rect_win(boxes[..., 1], boxes[..., 3])
        cc = rect_win(boxes[..., 0], boxes[..., 2])

        # window application as 4-term broadcast-MACs: XLA fuses these into
        # one pass over the (B, O, Y, X, C) output (K=4 matmuls tile poorly
        # on the 128-wide MXU)
        tq = jnp.einsum("yh,bohwc->boywc", inb, kq)  # (B, O, Y, 4, C)
        tp = jnp.einsum("boyh,bohwc->boywc", rr, kp)
        out = 0.0
        for dx in range(4):
            out = out + inb[None, None, None, :, dx, None] * tq[:, :, :, None, dx, :]
            out = out + cc[:, :, None, :, dx, None] * tp[:, :, :, None, dx, :]
        return out.reshape(b * o, out_size, out_size, 2 * d)

    def _typed_c2c3_eval(self, vec, boxes, objs):
        """Exact eval-mode [broadcast -> c0 -> bn1 -> relu -> c2 -> bn2 ->
        relu -> c3] via row/column type algebra — the (B*O, S2, S2, 2d)
        per-object c2 map is never materialized.

        The c0 output plane is a two-constant rectangle (see _fused_stage1),
        so every row of the c2 output matches one of <= 12 patterns (generic
        outside, <=2-row bands where the 4-tap stride-2 window crosses a box
        edge, interior, and the image-border rows clipped by `inb`), and
        likewise for columns: the full map is V2[row_type[y], col_type[x], c].
        c3 is computed on the 12x12 type grid, its 4-row output windows are
        typed again (14 window types on the S3 grid), and only the final
        (B*O, S3, S3, 4d) c3 output is expanded densely. All index maps are
        built per object from the box's integer edge coordinates; pattern ->
        candidate matching is by window-code equality, so duplicate or
        clipped candidates are harmless.

        Returns the raw c3 output (B*O, S3, S3, 4d); callers apply bn3/relu.
        """
        b, o, _ = vec.shape
        d = self.conv_dim
        size = self.image_size
        in_size = size + 2
        s2 = (in_size - 2) // 2 + 1
        s3 = (s2 - 2) // 2 + 1
        dtype = self.dtype or vec.dtype

        # ---- stage-1 constants (same algebra as _fused_stage1 eval)
        w0 = self.c0.kernel[0, 0].astype(dtype)
        wv = jnp.einsum("bod,dk->bok", vec.astype(dtype), w0)
        a1, b1 = self.bn1.eval_affine(objs.reshape(-1))
        a1 = a1.reshape(b, o, d).astype(dtype)
        b1 = b1.reshape(b, o, d).astype(dtype)
        p = nn.relu(a1 * wv + b1)
        q = nn.relu(b1)
        w2 = self.c2.kernel.astype(dtype)  # (4, 4, d, 2d)
        kq = jnp.einsum("hwdc,bod->bohwc", w2, q)
        kp = jnp.einsum("hwdc,bod->bohwc", w2, p - q)

        # ---- tap windows on the padded grid (identical to _fused_stage1);
        # geometry shared with typed_axis_coverage, whose exhaustive test
        # proves every realizable pattern matches a candidate (so the
        # argmax row->candidate map below can never silently mis-type)
        taps, inb, inbcode = _tap_geometry(size)

        # rows and columns are typed by the same axis algebra, so both run
        # as ONE stacked call (leading axis 0 = rows/y, 1 = cols/x): halves
        # the number of small integer fusions XLA emits for the typing
        # front half (profiled ~1.3 ms/batch of sub-0.2 ms ops at b=128)
        lo2 = jnp.stack([boxes[..., 1], boxes[..., 0]])  # (2, B, O)
        hi2 = jnp.stack([boxes[..., 3], boxes[..., 2]])
        rc = _rect_win(taps, lo2, hi2, size)  # (2, B, O, s2, 4)
        sel2ax, rcK, inbK2, _ = _axis_typing(rc, inb, inbcode, lo2, hi2, size)
        selR, selC = sel2ax[0], sel2ax[1]
        rrK, ccK = rcK[0], rcK[1]
        inbKR, inbKC = inbK2[0], inbK2[1]

        # ---- c2 values on the 12x12 type grid, bn2-affine + relu
        V2 = jnp.einsum(
            "bokh,bolw,bohwc->boklc", inbKR.astype(dtype), inbKC.astype(dtype), kq
        ) + jnp.einsum(
            "bokh,bolw,bohwc->boklc", rrK.astype(dtype), ccK.astype(dtype), kp
        )  # (B, O, 12, 12, 2d)
        a2, b2 = self.bn2.eval_affine(objs.reshape(-1))
        a2 = a2.reshape(b, o, 1, 1, -1).astype(dtype)
        b2 = b2.reshape(b, o, 1, 1, -1).astype(dtype)
        z2 = nn.relu(a2 * V2 + b2)

        # ---- type the c3 output windows (4 input rows, stride 2, pad 1)
        # (same stacked-axes trick as above)
        sel3ax, winK2, _ = _axis_out_typing(sel2ax, lo2, hi2, size, s2, s3)
        sel3R, sel3C = sel3ax[0], sel3ax[1]
        winKR, winKC = winK2[0], winK2[1]

        # ---- c3 on the type grid: V3[a, b, C]
        idxR = jnp.where(winKR > 0, winKR - 1, 12)  # (B, O, 14, 4)
        w3 = self.c3.kernel.astype(dtype)  # (4, 4, 2d, 4d)
        n = b * o
        c2d, c4d = 2 * d, 4 * d
        w3t = w3.transpose(0, 2, 1, 3).reshape(4 * c2d, 4 * c4d)  # ((h,c),(w,C))
        a3, b3 = self.bn3.eval_affine(objs.reshape(-1))  # (n, 4d) f32

        if self.pallas_typed:
            # ---- Pallas back half: gather + c3-on-types + bn3/relu +
            # expansion, G objects per program with block-diagonal one-hot
            # selectors so every stage is a K>=96 matmul (the XLA einsum
            # forms lower to batched-convolution fusions + layout copies,
            # measured ~10 ms at b=128, O=10 — as much as the dense c3
            # they replace; the round-2 per-object-loop kernel was MXU
            # tile-quantization bound at 5.8 ms; the round-3 v3 kernel's
            # two in-kernel transposes cost 3 ms; the transpose-free v4
            # measured 6.71 vs 8.56 ms isolated [2,935 -> 3,058 img/s].
            # v5 batches v4's 70 small per-row-type dots into two full
            # dots via a contiguous VMEM repack: 6.47 ms isolated but a
            # measured ~20 img/s END-TO-END LOSS (3,063 -> 3,041/3,046;
            # the repack's scratch traffic serializes against the
            # surrounding ops); v6's cheaper 192 KB reused repack loses
            # the same way (3,056 -> 3,043), so v4 stays the default —
            # see ROOFLINE.md)
            from aglayout_tpu.ops.pallas_typed_expand import (
                typed_c3_expand_v4,
                typed_c3_expand_v5,
                typed_c3_expand_v6,
                typed_c3_inputs_from_windows,
            )

            # AGL_TYPED_C3=v5/v6 selects an alternate variant for A/B
            # benching (tools/bench_typed_kernel.py measures them isolated)
            kernel = {
                "v5": typed_c3_expand_v5,
                "v6": typed_c3_expand_v6,
            }.get(os.environ.get("AGL_TYPED_C3", ""), typed_c3_expand_v4)

            idx_k, lsel_k, selr_k, selc_k = typed_c3_inputs_from_windows(
                idxR.reshape(n, 14, 4),
                winKC.reshape(n, 14, 4),
                sel3R.reshape(n, s3),
                sel3C.reshape(n, s3),
            )
            ab = jnp.stack([a3, b3], axis=1).astype(jnp.float32)  # (n, 2, 4d)
            # raw 12x12 grid: v4 maps OOB taps to zero selector rows, so the
            # zero-row/col pad of the XLA fallback is never materialized
            return kernel(
                z2.reshape(n, 12, 12, c2d).astype(dtype),
                idx_k, lsel_k, selr_k, selc_k, ab, w3t.astype(dtype),
            )

        # ---- XLA fallback (CPU tests): same math as einsums/matmuls
        # z2 padded with a zero row/col at index 12 for OOB taps
        z2p = jnp.pad(z2, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        # row-gather: Z1[o, a, h, l, c] = z2p[idxR[a, h], l, c]
        Z1 = jnp.take_along_axis(
            z2p[:, :, :, None],  # (B, O, 13, 1, 13, 2d)
            idxR.reshape(b, o, 14 * 4, 1, 1, 1),
            axis=2,
        ).reshape(b, o, 14, 4, 13, 2 * d)
        z1t = Z1.transpose(0, 1, 2, 4, 3, 5).reshape(n * 14 * 13, 4 * c2d)
        W3z = jnp.dot(z1t, w3t).reshape(n, 14, 13, 4, c4d)  # (n, a, l, w, C)
        HC = jax.nn.one_hot(
            jnp.where(winKC > 0, winKC - 1, 13), 13, dtype=dtype
        ).reshape(n, 14, 4, 13)  # (n, g, w, l); OOB -> all-zero
        hc = HC.transpose(0, 1, 3, 2).reshape(n, 14, 13 * 4)  # (n, g, (l, w))
        w3z = W3z.transpose(0, 2, 3, 1, 4).reshape(n, 13 * 4, 14 * c4d)
        V3 = jax.lax.dot_general(
            hc, w3z, (((2,), (1,)), ((0,), (0,)))
        )  # (n, g, (a, C))
        V3 = nn.relu(
            V3.reshape(n, 14, 14, c4d) * a3[:, None, None, :].astype(dtype)
            + b3[:, None, None, :].astype(dtype)
        )
        v3g = V3.reshape(b, o, 14, 14, c4d)  # (b, o, g, a, C)
        ER = jax.nn.one_hot(sel3R, 14, dtype=dtype)  # (B, O, s3, 14)
        EC = jax.nn.one_hot(sel3C, 14, dtype=dtype)
        T = jnp.einsum("boxg,bogaC->boxaC", EC, v3g)
        out3 = jnp.einsum("boya,boxaC->boyxC", ER, T)
        return out3.reshape(n, s3, s3, c4d)

    def __call__(self, objs_att, masks, valid, z, objs, train: bool, boxes=None):
        # objs_att: (B, O, 64); masks: (B, O, H, W, 1) or None (serving fast
        # path with `boxes` given); z: (B, O, z_dim); objs/valid: (B, O)
        ura = not train
        b, o = objs_att.shape[:2]
        d = self.conv_dim
        objs_f = objs.reshape(-1)
        mask_f = valid.reshape(-1)

        vec = jnp.concatenate([objs_att, z.astype(objs_att.dtype)], axis=-1)

        if masks is None and boxes is not None and ura and self.image_size >= 128:
            # eval serving at 128^2: exact type-algebra stage-1..c3 (never
            # builds the per-object S2^2 map); includes bn3 + relu. At 64^2
            # the dense c3 is cheap enough that the typed path's per-object
            # overhead is a net loss (measured 6.4k -> 5.7k img/s).
            h = self._typed_c2c3_eval(vec, boxes, objs)
        else:
            if masks is None and boxes is not None:
                h = self._fused_stage1(vec, boxes, objs, valid, train)
            else:
                hgt, wdt = masks.shape[2], masks.shape[3]
                h = vec[:, :, None, None, :] * masks.astype(vec.dtype)  # (B,O,H,W,C)
                h = h.reshape(b * o, hgt, wdt, vec.shape[-1])
                h = self.c0(h)
                h = self.bn1(h, objs_f, mask_f, ura)
                h = nn.relu(h)
                h = self.c2(h)
            h = self.bn2(h, objs_f, mask_f, ura)
            h = nn.relu(h)
            h = self.c3(h)
            h = self.bn3(h, objs_f, mask_f, ura)
            h = nn.relu(h)
        if ura and self.image_size == 128:
            # Exact fold of [c4 (k4 s2 p1) -> eval-affine bn4 -> avgpool 2x2]
            # into one k6 s4 p1 conv with the 2x2-shift-averaged kernel (the
            # pool commutes with bn4's affine): 1.78x fewer tap-positions
            # than conv-then-pool. Train mode keeps the dense path (bn4
            # batch stats are taken over the pre-pool 16^2 map).
            k4 = self.c4.kernel
            k6 = jnp.zeros((6, 6) + k4.shape[2:], k4.dtype)
            for u in (0, 1):
                for v in (0, 1):
                    k6 = k6.at[2 * u : 2 * u + 4, 2 * v : 2 * v + 4].add(k4)
            k6 = (0.25 * k6).astype(h.dtype)
            h = jax.lax.conv_general_dilated(
                h, k6, (4, 4), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            a4, b4 = self.bn4.eval_affine(objs_f)
            h = h * a4[:, None, None, :].astype(h.dtype) + b4[
                :, None, None, :
            ].astype(h.dtype)
        else:
            h = self.c4(h)
            h = self.bn4(h, objs_f, mask_f, ura)  # no relu (reference :504-509)
            if self.image_size == 128:
                h = adaptive_avg_pool(h, 8)  # (N,16,16,512) -> (N,8,8,512)

        h = h.reshape(b, o, 8, 8, d * 8)
        h = self.clstm(
            h, valid, unroll=self.clstm_eval_unroll if ura else 1
        )  # (B, 8, 8, 64)

        if ura and self.pallas_trunk and self.resi_num > 0 and h.shape[1:3] == (8, 8):
            from aglayout_tpu.ops.pallas_resblocks import residual_trunk

            w1 = jnp.stack([blk.c1.kernel for blk in self.residuals])
            w2 = jnp.stack([blk.c2.kernel for blk in self.residuals])
            ab1 = jnp.stack(
                [jnp.stack(blk.bn1.eval_affine()) for blk in self.residuals]
            )
            ab2 = jnp.stack(
                [jnp.stack(blk.bn2.eval_affine()) for blk in self.residuals]
            )
            return residual_trunk(h.astype(self.dtype or h.dtype), w1, w2, ab1, ab2)
        for block in self.residuals:
            h = block(h, ura)
        return h


class GlobalEncoder(nn.Module):
    """8x8 layout feature -> 128-d global context vector.

    Reference: models/generator_obj_att.py:425-446 (conv, BN, relu, conv,
    spatial sum).
    """

    dim: int = 128  # 2 * conv_dim in the reference (128 at conv_dim=64)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, h, train: bool):
        ura = not train
        h = Conv2d(self.dim, 4, stride=2, padding=1, use_bias=False, dtype=self.dtype, name="c1")(h)
        h = MaskedBatchNorm(self.dim, dtype=self.dtype, name="bn1")(h, None, ura)
        h = nn.relu(h)
        h = Conv2d(self.dim, 4, stride=2, padding=1, use_bias=False, dtype=self.dtype, name="c2")(h)
        return jnp.sum(h, axis=(1, 2))


class Decoder(nn.Module):
    """Layout feature ⊕ broadcast global vector -> RGB image.

    Reference: models/generator_obj_att.py:516-572 (64) plus the 2x
    nearest-upsample tail of generator_obj_att128.py:542-604 when
    image_size == 128. Every SPADE block is conditioned on the 8x8 layout
    feature itself (seg = hidden).
    """

    image_size: int = 64
    conv_dim: int = 64
    # Pallas fused [SPADE -> relu -> few-out conv] RGB heads (TPU, eval
    # path): see ops/pallas_spade_conv.py. Exact same math; enabled by
    # Models() when the default backend is TPU.
    pallas_heads: bool = False
    # Pallas SPADE-4 apply (spade_apply8) at 128^2 eval; opt-in until its
    # TPU compile + end-to-end win are verified (Config.pallas_apply8)
    pallas_apply8: bool = False
    # compact class-resolution head tables (in-kernel W expansion) for the
    # C%128==0 RGB head (c7): kills the ~2 ms/batch XLA-side W-expanded
    # table assembly; opt-in until TPU-verified (Config.pallas_compact_heads)
    pallas_compact_heads: bool = False
    # 8-image-sublane head (spade_few_out_conv8): consumes the producing
    # conv's (H, W, B, C) layout via a free bitcast + halo DMA (kills the
    # ~1.6 ms c7 head input relayout) AND uses the fully compact class
    # tables; TPU-verified exact, default-on for TPU (Config.pallas_grouped_heads).
    # Takes precedence over pallas_compact_heads where its B%8 / C%128
    # alignment gates pass.
    pallas_grouped_heads: bool = False
    # phase-decomposed dc1..dc3 on the eval path (ops/phase_deconv.py):
    # the lhs-dilated lowering walks 4x structural zeros at these tiny
    # spatial sizes; the parity split is one MXU-shaped k=2 conv + a
    # layout interleave. Exact (same nonzero taps).
    phase_dc: bool = False
    dtype: jnp.dtype | None = None

    def setup(self):
        d = self.conv_dim
        spade_kw = dict(seg_features=d, nhidden=2 * d, dtype=self.dtype)
        self.c0_new = Conv2d(d * 4, 3, padding=1, use_bias=False, dtype=self.dtype)
        self.spade_0 = SPADE(d * 4, **spade_kw)
        self.dc1 = ConvTranspose2d(
            d * 4, 4, 2, 1, use_bias=False, dtype=self.dtype, in_features=d * 4
        )
        self.spade_1 = SPADE(d * 4, **spade_kw)
        self.dc2 = ConvTranspose2d(
            d * 2, 4, 2, 1, use_bias=False, dtype=self.dtype, in_features=d * 4
        )
        self.spade_2 = SPADE(d * 2, **spade_kw)
        self.dc3 = ConvTranspose2d(
            d, 4, 2, 1, use_bias=False, dtype=self.dtype, in_features=d * 2
        )
        self.spade_3 = SPADE(d, **spade_kw)
        # c4/c5/c6/c7 kernels declared with in_features so the fused Pallas
        # heads (ops/pallas_spade_conv.py, ops/pallas_spade_c6_int8.py) can
        # read them directly
        self.c4 = Conv2d(3, 7, padding=3, use_bias=True, dtype=self.dtype, in_features=d)
        if self.image_size == 128:
            self.c5 = Conv2d(
                d * 2, 7, padding=3, use_bias=False, dtype=self.dtype, in_features=3
            )
            self.spade_4 = SPADE(d * 2, **spade_kw)
            self.c6 = Conv2d(
                d * 2, 5, padding=2, use_bias=False, dtype=self.dtype, in_features=d * 2
            )
            self.spade_5 = SPADE(d * 2, **spade_kw)
            self.c7 = Conv2d(
                3, 7, padding=3, use_bias=True, dtype=self.dtype, in_features=d * 2
            )

    def _head(self, spade, conv, h, seg, ura: bool):
        """[SPADE -> relu -> few-out conv] — fused Pallas kernel on the TPU
        eval path (identical math), dense composition otherwise."""
        f = h.shape[1] // seg.shape[1]
        if (
            self.pallas_heads
            and ura
            and f >= 5
            and h.shape[1] == f * seg.shape[1]
            and h.shape[2] == f * seg.shape[2]
        ):
            from aglayout_tpu.ops.pallas_spade_conv import (
                spade_few_out_conv,
                spade_few_out_conv8,
            )

            b, hh, w, c = h.shape
            k = conv.kernel.shape[0]
            if (
                self.pallas_grouped_heads
                and b % 8 == 0
                and c % 128 == 0
                and w % f == 0
                and hh >= f + 2 * (k // 2)
            ):
                # consume the producing conv's (H, W, B, C) layout directly
                # (free bitcast) with 8-image sublane groups and the fully
                # compact class tables — no input relayout, no flat-table
                # assembly (ops/pallas_spade_conv.spade_few_out_conv8)
                a_tab, b_tab = spade.folded_affine_tables_compact(seg, f)
                # fb = f-row-blocks per program: fb>1 amortizes the halo DMA
                # (read amplification 1 + 2r/(fb*f)) and the slot expansion.
                # AGL_HEAD8_FB overrides for A/B benching.
                fb = int(os.environ.get("AGL_HEAD8_FB", "1"))
                if (hh // f) % fb:
                    fb = 1
                return spade_few_out_conv8(
                    jnp.transpose(h, (1, 2, 0, 3)),
                    a_tab.astype(h.dtype),
                    b_tab.astype(h.dtype),
                    conv.kernel,
                    conv.bias,
                    f=f,
                    fb=fb,
                )
            compact = self.pallas_compact_heads and c % 128 == 0
            if compact:
                a_tab, b_tab = spade.folded_affine_tables_compact_flat(seg, f)
            else:
                a_tab, b_tab = spade.folded_affine_tables(seg, f)
            return spade_few_out_conv(
                h,
                a_tab.astype(h.dtype),
                b_tab.astype(h.dtype),
                conv.kernel,
                conv.bias,
                f=f,
                compact=compact,
            )
        return conv(nn.relu(spade(h, seg, ura)))

    def __call__(self, hidden, global_h, train: bool):
        ura = not train
        seg = hidden  # (B, 8, 8, 64)

        g = jnp.broadcast_to(
            global_h[:, None, None, :], (global_h.shape[0], 8, 8, global_h.shape[-1])
        )
        h = jnp.concatenate([hidden, g.astype(hidden.dtype)], axis=-1)
        h = self.c0_new(h)
        h = self.spade_0(h, seg, ura)
        h = nn.relu(h)
        if ura and self.phase_dc:
            from aglayout_tpu.ops.phase_deconv import conv_transpose_phase

            dtype = self.dtype or h.dtype
            h = conv_transpose_phase(h, self.dc1.kernel, dtype=dtype)
            h = self.spade_1(h, seg, ura)
            h = nn.relu(h)
            h = conv_transpose_phase(h, self.dc2.kernel, dtype=dtype)
            h = self.spade_2(h, seg, ura)
            h = nn.relu(h)
            h = conv_transpose_phase(h, self.dc3.kernel, dtype=dtype)
        else:
            h = self.dc1(h)
            h = self.spade_1(h, seg, ura)
            h = nn.relu(h)
            h = self.dc2(h)
            h = self.spade_2(h, seg, ura)
            h = nn.relu(h)
            h = self.dc3(h)
        h_64 = self._head(self.spade_3, self.c4, h, seg, ura)
        if self.image_size == 64:
            return h_64

        # 128: nearest 2x upsample of the 64-res RGB, then refine
        if ura and self.phase_dc:
            # upsample folded into c5: per-parity k=4 conv with pair-summed
            # taps on the 64^2 RGB (ops/phase_deconv.conv_up2_phase)
            from aglayout_tpu.ops.phase_deconv import conv_up2_phase

            h = conv_up2_phase(h_64, self.c5.kernel, dtype=self.dtype or h_64.dtype)
        else:
            up = jnp.repeat(jnp.repeat(h_64, 2, axis=1), 2, axis=2)
            h = self.c5(up)
        # NOTE int8_serving does NOT reroute c6: the fused int8 kernel
        # (ops/pallas_spade_c6_int8.py) measures 16.3 ms/stage vs 12.3 ms
        # for the exact XLA path — Mosaic's s8xs8->s32 dot runs at only
        # ~1.25x the bf16 MXU rate at c6's (4096, 3200)x(3200, 128) shapes
        # (measured: int8 dot 20.7 us vs bf16 24.8 us per row chunk), so
        # the 2x int8 MXU headline rate is unreachable here and the exact
        # path's free SPADE-into-conv-read fusion wins. The int8 route
        # stays where it measures faster: the wide ConvLSTM gate conv
        # (models/convlstm.py). Kernel + measurements kept in ROOFLINE.md.
        f = h.shape[1] // seg.shape[1]
        if (
            self.pallas_apply8
            and self.pallas_heads
            and ura
            and f >= 5
            and h.shape[1] == f * seg.shape[1]
            and h.shape[2] == f * seg.shape[2]
            and h.shape[0] % 8 == 0
            and h.shape[-1] % 128 == 0
        ):
            # Pallas [SPADE-apply -> relu] on the (H,W,B,C) transposed view
            # with 8-image sublane blocks and fully-compact class tables:
            # the full-res gamma/beta (and their measured 3.3 ms assembly
            # copy) never exist, and both transposes are free bitcasts
            # against c5/c6's {3,0,2,1} conv layouts (no (B,C) fold — the
            # fold variant, spade_apply_t, measured a net loss).
            from aglayout_tpu.ops.pallas_spade_conv import spade_apply8

            a_tab, b_tab = self.spade_4.folded_affine_tables_compact(seg, f)
            h_t = spade_apply8(
                jnp.transpose(h, (1, 2, 0, 3)),
                a_tab.astype(h.dtype),
                b_tab.astype(h.dtype),
                f=f,
            )
            h = jnp.transpose(h_t, (2, 0, 1, 3))
        else:
            h = self.spade_4(h, seg, ura)
            h = nn.relu(h)
        h = self.c6(h)
        return self._head(self.spade_5, self.c7, h, seg, ura)


class Generator(nn.Module):
    """Full generator orchestrator (reference models/generator_obj_att.py:603-647).

    One forward computes: real-crop VAE encoding, GT/estimated attribute
    codes, three layouts (rec / rand / shift), three decoded images with
    global context, and re-encodings of the fake crops. Returns a dict.
    """

    num_classes: int
    attribute_dim: int = 106
    embedding_dim: int = 64
    z_dim: int = 64
    image_size: int = 64
    object_size: int = 32
    clstm_layers: int = 3
    resi_num: int = 6
    # base width; every hard-coded width of the reference is conv_dim (64),
    # 2x (attribute-MLP hidden, global vector, SPADE nhidden) or 4..16x of
    # it. Non-default values give a width-scaled but semantically identical
    # model (used by the multi-chip CPU dry run).
    conv_dim: int = 64
    # fused_layout: masks are guaranteed to be rasterizations of the boxes
    # (true for the VG pipeline and generate()); the layout encoder then
    # takes its exact fused rectangular-mask path in BOTH train and eval.
    # Set False when feeding hand-made non-rectangular masks.
    fused_layout: bool = True
    # Pallas fused RGB heads on the TPU eval path (ops/pallas_spade_conv.py)
    pallas_heads: bool = False
    # opt-in approximate int8 serving (wide ConvLSTM gate convs; see
    # models/convlstm.py ConvLSTMCell)
    int8_serving: bool = False
    # Pallas SPADE-4 apply kernel at 128^2 eval (Config.pallas_apply8)
    pallas_apply8: bool = False
    # compact class-resolution RGB-head tables (Config.pallas_compact_heads)
    pallas_compact_heads: bool = False
    # grouped transposed RGB heads (Config.pallas_grouped_heads)
    pallas_grouped_heads: bool = False
    # fused 8x8 residual-trunk kernel (Config.pallas_trunk)
    pallas_trunk: bool = False
    # phase-decomposed eval dc1..dc3 (Config.phase_dc)
    phase_dc: bool = False
    # eval-mode lax.scan unroll for the object-axis ConvLSTM (exact)
    clstm_eval_unroll: int = 1
    dtype: jnp.dtype | None = None

    def setup(self):
        cd = self.conv_dim
        self.crop_encoder = CropEncoder(
            self.num_classes, self.z_dim, conv_dim=cd, dtype=self.dtype
        )
        self.layout_encoder = LayoutEncoder(
            self.num_classes,
            image_size=self.image_size,
            conv_dim=cd,
            resi_num=self.resi_num,
            clstm_dims=clstm_hidden_dims(self.clstm_layers, cd),
            z_dim=self.z_dim,
            pallas_typed=self.pallas_heads,
            pallas_trunk=self.pallas_trunk,
            int8_serving=self.int8_serving,
            clstm_eval_unroll=self.clstm_eval_unroll,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            image_size=self.image_size,
            conv_dim=cd,
            pallas_heads=self.pallas_heads,
            pallas_apply8=self.pallas_apply8,
            pallas_compact_heads=self.pallas_compact_heads,
            pallas_grouped_heads=self.pallas_grouped_heads,
            phase_dc=self.phase_dc,
            dtype=self.dtype,
        )
        self.global_encoder = GlobalEncoder(dim=2 * cd, dtype=self.dtype)
        self.attribute_encoder = AttributeEncoder(
            self.num_classes,
            attribute_dim=self.attribute_dim,
            embedding_dim=self.embedding_dim,
            conv_dim=cd,
            dtype=self.dtype,
        )

    def __call__(
        self,
        imgs,
        objs,
        boxes,
        masks,
        valid,
        z_rand,
        attribute,
        masks_shift,
        boxes_shift,
        attribute_est,
        train: bool = True,
    ):
        b, o = objs.shape
        objs_f = objs.reshape(-1)
        mask_f = valid.reshape(-1)
        s = self.object_size

        def flat(x):
            return x.reshape((b * o,) + x.shape[2:])

        crops_input = crop_bbox_dense(imgs, boxes, s)
        z_rec, mu, logvar = self.crop_encoder(flat(crops_input), objs_f, mask_f, train)

        objs_att = self.attribute_encoder(objs_f, flat(attribute), mask_f, train)
        objs_att_est = self.attribute_encoder(objs_f, flat(attribute_est), mask_f, train)
        objs_att = objs_att.reshape(b, o, -1)
        objs_att_est = objs_att_est.reshape(b, o, -1)
        z_rec_d = z_rec.reshape(b, o, -1)

        m, ms = (None, None) if self.fused_layout else (masks, masks_shift)
        h_rec = self.layout_encoder(
            objs_att_est, m, valid, z_rec_d, objs, train, boxes=boxes
        )
        h_rand = self.layout_encoder(objs_att, m, valid, z_rand, objs, train, boxes=boxes)
        h_shift = self.layout_encoder(
            objs_att, ms, valid, z_rand, objs, train, boxes=boxes_shift
        )

        h_rec_global = self.global_encoder(h_rec, train)
        h_rand_global = self.global_encoder(h_rand, train)
        h_shift_global = self.global_encoder(h_shift, train)

        img_rec = self.decoder(h_rec, h_rec_global, train)
        img_rand = self.decoder(h_rand, h_rand_global, train)
        img_shift = self.decoder(h_shift, h_shift_global, train)

        crops_rand = crop_bbox_dense(img_rand, boxes, s)
        _, z_rand_rec, _ = self.crop_encoder(flat(crops_rand), objs_f, mask_f, train)
        crops_input_rec = crop_bbox_dense(img_rec, boxes, s)
        crops_shift = crop_bbox_dense(img_shift, boxes_shift, s)
        _, z_rand_shift, _ = self.crop_encoder(flat(crops_shift), objs_f, mask_f, train)

        return {
            "crops_input": crops_input,
            "crops_input_rec": crops_input_rec,
            "crops_rand": crops_rand,
            "crops_shift": crops_shift,
            "img_rec": img_rec,
            "img_rand": img_rand,
            "img_shift": img_shift,
            "mu": mu,
            "logvar": logvar,
            "z_rand_rec": z_rand_rec,
            "z_rand_shift": z_rand_shift,
        }

    def generate(self, objs, boxes, valid, z, attribute, masks=None, train: bool = False):
        """Inference-only path: layout -> image (no real image required).

        This is the serving hot path for the throughput benchmark: one
        layout-encode + global-encode + decode. With `masks=None` the layout
        encoder takes its exact fused rectangular-mask fast path (no mask
        rasterization, no full-resolution per-object planes).
        """
        b, o = objs.shape
        if masks is None and train:
            from aglayout_tpu.ops.rasterize import rasterize_boxes

            masks = rasterize_boxes(boxes, self.image_size, self.image_size)[..., None]
        objs_f = objs.reshape(-1)
        mask_f = valid.reshape(-1)
        att = self.attribute_encoder(objs_f, attribute.reshape(b * o, -1), mask_f, train)
        h = self.layout_encoder(
            att.reshape(b, o, -1), masks, valid, z, objs, train, boxes=boxes
        )
        g = self.global_encoder(h, train)
        return self.decoder(h, g, train)
