"""Normalization layers with exact torch-BatchNorm semantics + masking.

The reference model is BatchNorm everywhere (plain, class-conditional, and
SPADE's parameter-free BN). Three requirements drive this implementation:

1. **torch semantics** for checkpoint parity: train mode normalizes with the
   biased batch variance and updates running stats with the *unbiased*
   variance at momentum 0.1; eval mode uses running stats
   (ConditionalBatchNorm at reference models/generator_obj_att.py:31-44,
   SPADE at models/spade/networks/normalization.py:66-108).
2. **masking**: the reference's object-level tensors contain only real
   objects; our dense (B, O_max) layout contains padded slots that must not
   contaminate batch statistics.
3. **cross-replica stats**: under GSPMD data parallelism the batch axis is
   sharded, and the global sums below are computed with XLA collectives
   automatically — the TPU-native upgrade of the reference's vendored,
   never-wired SyncBatchNorm (models/spade/networks/sync_batchnorm/).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all leading axes with optional per-row validity mask.

    x: (N, ..., C). mask: (N,) float/bool or None. Works for both 2-D
    (BatchNorm1d) and 4-D NHWC (BatchNorm2d) inputs.
    """

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    affine: bool = True
    dtype: jnp.dtype | None = None

    def setup(self):
        self.ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        self.ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        if self.affine:
            self.scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
            self.bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

    def eval_affine(self):
        """(a, b) such that eval-mode BN(x) == a * x + b (per channel)."""
        a = jax.lax.rsqrt(self.ra_var.value + self.epsilon)
        b = -self.ra_mean.value * a
        if self.affine:
            a = a * self.scale
            b = b * self.scale + self.bias
        return a, b

    def train_affine(self, mean, var, cnt):
        """(a, b) for train-mode BN given externally computed batch moments
        (fused paths compute them analytically); updates running stats with
        exactly the semantics of __call__ (momentum, unbiased var)."""
        if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
            mom = self.momentum
            unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
            self.ra_mean.value = (1 - mom) * self.ra_mean.value + mom * mean
            self.ra_var.value = (1 - mom) * self.ra_var.value + mom * unbiased
        a = jax.lax.rsqrt(var + self.epsilon)
        b = -mean * a
        if self.affine:
            a = a * self.scale
            b = b * self.scale + self.bias
        return a, b

    def __call__(self, x, mask=None, use_running_average: bool = False):
        ra_mean, ra_var = self.ra_mean, self.ra_var
        reduce_axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                cnt = jnp.asarray(
                    jnp.prod(jnp.asarray(x.shape[:-1])), jnp.float32
                )
                mean = jnp.mean(xf, axis=reduce_axes)
                mean2 = jnp.mean(xf * xf, axis=reduce_axes)
            else:
                m = mask.astype(jnp.float32).reshape(
                    mask.shape + (1,) * (x.ndim - mask.ndim)
                )
                per_row = jnp.asarray(
                    jnp.prod(jnp.asarray(x.shape[mask.ndim : -1])), jnp.float32
                )
                cnt = jnp.sum(m) * per_row
                mean = jnp.sum(xf * m, axis=reduce_axes) / cnt
                mean2 = jnp.sum(xf * xf * m, axis=reduce_axes) / cnt
            var = mean2 - mean * mean  # biased, used for normalization (torch)
            if not self.is_initializing():
                mom = self.momentum
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - mom) * ra_mean.value + mom * mean
                ra_var.value = (1 - mom) * ra_var.value + mom * unbiased

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            y = y * self.scale + self.bias
        return y.astype(self.dtype or x.dtype)


def _cbn_embed_init(key, shape, dtype=jnp.float32):
    """Scale half ~ N(1, 0.02), bias half zero (reference
    generator_obj_att.py:37-38)."""
    num_classes, twoc = shape
    c = twoc // 2
    scale = 1.0 + 0.02 * jax.random.normal(key, (num_classes, c), dtype)
    return jnp.concatenate([scale, jnp.zeros((num_classes, c), dtype)], axis=1)


class ConditionalBatchNorm(nn.Module):
    """BN (affine-free) + per-class affine from an embedding table.

    Reference: models/generator_obj_att.py:31-44. Conditioned on object
    class everywhere in the generator encoders.
    """

    features: int
    num_classes: int
    dtype: jnp.dtype | None = None

    def setup(self):
        self.bn = MaskedBatchNorm(self.features, affine=False, dtype=self.dtype)
        self.embed = nn.Embed(
            self.num_classes,
            2 * self.features,
            embedding_init=_cbn_embed_init,
            param_dtype=jnp.float32,
        )

    def eval_affine(self, y):
        """Per-row (a, b) with eval-mode CBN(x, y) == a * x + b (channelwise)."""
        a0, b0 = self.bn.eval_affine()
        gamma, beta = jnp.split(self.embed(y), 2, axis=-1)
        return gamma * a0, gamma * b0 + beta

    def train_affine(self, y, mean, var, cnt):
        """Per-row (a, b) for train-mode CBN given analytic batch moments;
        updates the underlying BN running stats."""
        a0, b0 = self.bn.train_affine(mean, var, cnt)
        gamma, beta = jnp.split(self.embed(y), 2, axis=-1)
        return gamma * a0, gamma * b0 + beta

    def __call__(self, x, y, mask=None, use_running_average: bool = False):
        out = self.bn(x, mask, use_running_average)
        gamma, beta = jnp.split(self.embed(y), 2, axis=-1)
        shape = gamma.shape[:1] + (1,) * (x.ndim - 2) + gamma.shape[-1:]
        return out * gamma.reshape(shape).astype(out.dtype) + beta.reshape(shape).astype(out.dtype)


class SPADE(nn.Module):
    """Spatially-adaptive denormalization conditioned on the layout feature.

    Reference: models/spade/networks/normalization.py:66-108 with
    param_free_norm_type='batch', ks=3, nhidden=128. The segmap here is the
    generator's own 8x8 layout feature, nearest-resized to x's spatial size.

    TPU fast path (eval, upscale factor f >= 5): the nearest-upsampled seg is
    piecewise block-constant, so conv3x3 outputs take one of 3 row-classes x
    3 col-classes of values per block (top/interior/bottom rows of a block),
    and the second conv takes 5x5 classes. Both mlp convs are therefore
    computed EXACTLY on the 8x8 grid with class-aggregated kernels, and the
    full-resolution gamma/beta are assembled by a gather — eliminating the
    dominant full-resolution convs of the 128^2 decoder.
    """

    norm_features: int
    seg_features: int = 64
    nhidden: int = 128
    dtype: jnp.dtype | None = None

    def setup(self):
        from aglayout_tpu.models.layers import Conv2d

        self.param_free_norm = MaskedBatchNorm(
            self.norm_features, affine=False, dtype=self.dtype
        )
        self.mlp_shared = Conv2d(
            self.nhidden, 3, padding=1, dtype=self.dtype, in_features=self.seg_features
        )
        self.mlp_gamma = Conv2d(
            self.norm_features, 3, padding=1, dtype=self.dtype, in_features=self.nhidden
        )
        self.mlp_beta = Conv2d(
            self.norm_features, 3, padding=1, dtype=self.dtype, in_features=self.nhidden
        )

    def _block_class_grid(self, segmap):
        """Exact (gamma ++ beta) values for an f-upsampled seg (f >= 5), by
        (row class, col class): 5x5 nested list of (B, h, w, 2*norm) arrays.

        Classes per axis: 0: u%f==0, 1: u%f==1, 2: interior, 3: u%f==f-2,
        4: u%f==f-1 (valid for any f >= 5 — the tap pattern of two stacked
        3x3 convs on block-constant input depends only on these offsets).
        """
        b, h, w, _ = segmap.shape
        dtype = self.dtype or segmap.dtype
        seg = segmap.astype(dtype)

        # ---- first conv: 3 row-classes (T/M/B) x 3 col-classes.
        # R[class][delta+1, dy] marks which kernel taps hit block offset delta.
        R = jnp.asarray(
            [
                [[1, 0, 0], [0, 1, 1], [0, 0, 0]],  # T: y%f==0
                [[0, 0, 0], [1, 1, 1], [0, 0, 0]],  # M: interior
                [[0, 0, 0], [1, 1, 0], [0, 0, 1]],  # B: y%f==f-1
            ],
            dtype,
        )
        w1 = self.mlp_shared.kernel.astype(dtype)  # (3,3,cin,nh)
        b1 = self.mlp_shared.bias.astype(dtype)
        # aggregated kernels A[r,c]: (3,3) block-offset kernels
        A = jnp.einsum("rad,sbe,deco->rsabco", R, R, w1)  # (3,3,3,3,cin,nh)
        A = A.transpose(2, 3, 4, 0, 1, 5).reshape(3, 3, seg.shape[-1], 9 * self.nhidden)
        v_all = jax.lax.conv_general_dilated(
            seg, A, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        v_all = nn.relu(v_all.reshape(b, h, w, 3, 3, self.nhidden) + b1)
        # V[r][c]: (B,h,w,nh)
        V = [[v_all[:, :, :, r, c] for c in range(3)] for r in range(3)]

        # ---- second conv: 5 output classes per axis.
        # tap spec per class s: for dy in 0..2 -> (first-conv class r, block shift)
        TAP = {
            0: [(2, -1), (0, 0), (1, 0)],      # y%f==0: B(i-1), T(i), M(i)
            1: [(0, 0), (1, 0), (1, 0)],       # y%f==1: T, M, M
            2: [(1, 0), (1, 0), (1, 0)],       # interior
            3: [(1, 0), (1, 0), (2, 0)],       # y%f==f-2: M, M, B
            4: [(1, 0), (2, 0), (0, 1)],       # y%f==f-1: M, B, T(i+1)
        }
        w2 = jnp.concatenate(
            [self.mlp_gamma.kernel, self.mlp_beta.kernel], axis=-1
        ).astype(dtype)  # (3,3,nh,2*norm)
        b2 = jnp.concatenate([self.mlp_gamma.bias, self.mlp_beta.bias]).astype(dtype)

        O2 = [[None] * 5 for _ in range(5)]
        for s in range(5):
            for t in range(5):
                acc = 0.0
                for dy in range(3):
                    r, sy = TAP[s][dy]
                    for dx in range(3):
                        c, sx = TAP[t][dx]
                        acc = acc + jnp.einsum(
                            "bhwc,co->bhwo", _shift2d(V[r][c], sy, sx), w2[dy, dx]
                        )
                O2[s][t] = acc + b2  # (B, h, w, 2*norm)
        return O2

    def folded_affine_tables(self, segmap, f: int):
        """Per-pixel affine (A, B) with SPADE_eval(x) == x * A + B, folded
        with the parameter-free BN, as row-class-expanded tables for the
        fused Pallas head (ops/pallas_spade_conv.py).

        Returns (A, B) each (batch, h, 5, w*f, norm_features): indexed by
        (row block, row class, full-res column, channel).
        """
        O2 = self._block_class_grid(segmap)
        b, h, w, _ = segmap.shape
        # (B, h, 5rc, 5cc, w, 2n)
        X = jnp.stack([jnp.stack(row, 0) for row in O2], 0).transpose(2, 3, 0, 1, 4, 5)

        def cls_of(u):
            return 0 if u == 0 else 1 if u == 1 else 3 if u == f - 2 else 4 if u == f - 1 else 2

        # Column expansion with STATIC slices only (a dynamic gather here
        # lowers to a while-loop of dynamic-update-slices — measured 30 ms
        # per batch): the per-block column pattern [cls(0..f-1)] is the same
        # for every block, so stack f class-slices and fold into the w axis.
        cols = jnp.stack(
            [X[:, :, :, cls_of(u)] for u in range(f)], axis=4
        )  # (B, h, 5rc, w, f, 2n)
        T = cols.reshape(b, h, 5, w * f, cols.shape[-1])  # (B, h, 5rc, w*f, 2n)
        gamma, beta = jnp.split(T, 2, axis=-1)
        a0, b0 = self.param_free_norm.eval_affine()  # (C,) f32
        a0 = a0.astype(gamma.dtype)
        b0 = b0.astype(gamma.dtype)
        return a0 * (1 + gamma), b0 * (1 + gamma) + beta

    def folded_affine_tables_compact(self, segmap, f: int):
        """Fully-compact folded affine tables for the 8-image-sublane Pallas
        apply kernel (ops/pallas_spade_conv.spade_apply8): no W expansion at
        all — both axes stay at class resolution, and the image axis is
        moved into the sublane position so the kernel's per-column lookup is
        one contiguous (8, C) tile copy.

        Returns (A, B) each (batch//8, h, 5, w*5, 8, norm_features):
        indexed by (image-group, row block, row class, col block*5 + col
        class, image-in-group, channel). batch must be a multiple of 8.
        """
        O2 = self._block_class_grid(segmap)
        b, h, w, _ = segmap.shape
        assert b % 8 == 0, "compact tables need batch % 8 == 0"
        # (B, h, 5rc, 5cc, w, 2n)
        X = jnp.stack([jnp.stack(row, 0) for row in O2], 0).transpose(2, 3, 0, 1, 4, 5)
        # -> (B//8, h, 5rc, w*5cc, 8, 2n)
        T = (
            X.transpose(0, 1, 2, 4, 3, 5)
            .reshape(b // 8, 8, h, 5, w * 5, 2 * self.norm_features)
            .transpose(0, 2, 3, 4, 1, 5)
        )
        gamma, beta = jnp.split(T, 2, axis=-1)
        a0, b0 = self.param_free_norm.eval_affine()  # (C,) f32
        a0 = a0.astype(gamma.dtype)
        b0 = b0.astype(gamma.dtype)
        return a0 * (1 + gamma), b0 * (1 + gamma) + beta

    def folded_affine_tables_compact_flat(self, segmap, f: int):
        """Per-image compact folded affine tables for the fused RGB-head
        kernel's compact mode (ops/pallas_spade_conv.spade_few_out_conv
        with compact=True): both axes stay at class resolution — the fold
        arithmetic runs on ~f/5x less data than `folded_affine_tables` and
        the W expansion happens in-kernel as one one-hot matmul.

        Returns (A, B) each (batch, w*5, h, 5, norm_features): indexed by
        (col block*5 + col class, row block, row class, channel) — col
        blocks MAJOR so the kernel's one-hot W-expansion matmul reads the
        table as a (w*5, h*5*C) matrix without an in-kernel transpose.
        """
        O2 = self._block_class_grid(segmap)
        b, h, w, _ = segmap.shape
        # (5rc, 5cc, B, h, w, 2n) -> (B, w, 5cc, h, 5rc, 2n) -> flat cols
        X = jnp.stack([jnp.stack(row, 0) for row in O2], 0).transpose(2, 4, 1, 3, 0, 5)
        T = X.reshape(b, w * 5, h, 5, 2 * self.norm_features)
        gamma, beta = jnp.split(T, 2, axis=-1)
        a0, b0 = self.param_free_norm.eval_affine()  # (C,) f32
        a0 = a0.astype(gamma.dtype)
        b0 = b0.astype(gamma.dtype)
        return a0 * (1 + gamma), b0 * (1 + gamma) + beta

    def _gamma_beta_fused(self, segmap, f: int):
        """Exact gamma/beta for an f-times nearest-upsampled seg, f >= 5.

        Returns (gamma, beta) at full resolution (B, h*f, w*f, norm_features).
        """
        b, h, w, _ = segmap.shape
        O2 = self._block_class_grid(segmap)

        # ---- assemble full resolution: static tile placement (one write)
        def cls_of(u):
            return 0 if u == 0 else 1 if u == 1 else 3 if u == f - 2 else 4 if u == f - 1 else 2

        S = [cls_of(u) for u in range(f)]
        rows = []
        for u in range(f):
            cols = jnp.stack([O2[S[u]][S[v]] for v in range(f)], axis=3)  # (B,h,w,f,2n)
            rows.append(cols)
        full = jnp.stack(rows, axis=2)  # (B, h, f, w, f, 2n)
        full = full.reshape(b, h * f, w * f, 2 * self.norm_features)
        gamma, beta = jnp.split(full, 2, axis=-1)
        return gamma, beta

    def __call__(self, x, segmap, use_running_average: bool = False):
        normalized = self.param_free_norm(x, None, use_running_average)

        h, w = segmap.shape[1], segmap.shape[2]
        H, W = x.shape[1], x.shape[2]
        if use_running_average and H % h == 0 and H // h >= 5 and W == H and w == h:
            # (A blocked 6-D apply that fuses the class-stack with the
            # elementwise apply was measured SLOWER — it moves the layout
            # copy onto `normalized` instead of gamma/beta.)
            gamma, beta = self._gamma_beta_fused(segmap, H // h)
            return normalized * (1 + gamma) + beta

        # classic path: nearest-resize then conv (exact torch
        # F.interpolate(mode='nearest') for integer factors)
        if H % h == 0 and W % w == 0:
            seg = jnp.repeat(jnp.repeat(segmap, H // h, axis=1), W // w, axis=2)
        else:
            idx_h = (jnp.arange(H) * h) // H
            idx_w = (jnp.arange(W) * w) // W
            seg = segmap[:, idx_h][:, :, idx_w]

        actv = nn.relu(self.mlp_shared(seg))
        gamma = self.mlp_gamma(actv)
        beta = self.mlp_beta(actv)
        return normalized * (1 + gamma) + beta


def _shift2d(x, dy: int, dx: int):
    """Shift (B, H, W, C) with zero fill: out[i, j] = x[i+dy, j+dx] or 0."""
    if dy == 0 and dx == 0:
        return x
    _, h, w, _ = x.shape
    pad = [(0, 0), (max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)), (0, 0)]
    xp = jnp.pad(x, pad)
    y0, x0 = max(dy, 0), max(dx, 0)
    return xp[:, y0 : y0 + h, x0 : x0 + w, :]
