"""Phase-decomposed transposed convolution (exact, XLA-only).

The decoder's dc1..dc3 are ConvTranspose2d(k=4, s=2, p=1) at tiny spatial
sizes (8^2 -> 64^2). Lowered as an lhs-dilated convolution (the standard
form, models/layers.py:129), the TPU conv walks a 4x4 window over a
2x-dilated input in which 3 of every 4 taps read structural zeros — at
these spatial sizes the op is latency-bound, not FLOP-bound.

This module rewrites it exactly: a stride-2 k=4 p=1 transposed conv equals
FOUR k=2 forward convs, one per output parity phase (py, px), because for
output row oy = 2m + py only kernel rows ky with (oy + ky) even hit a real
input sample:

    py = 0:  ky in {0, 2}  ->  x[m-1] * W[0] + x[m] * W[2]
    py = 1:  ky in {1, 3}  ->  x[m]   * W[1] + x[m+1] * W[3]

(same along columns). All four phases are computed by ONE k=2 VALID conv
with 4*C_out output channels over the once-padded input — a single dense
(B*(S+1)^2, 4*C_in) x (4*C_in, 4*C_out) matmul shape that tiles the MXU —
followed by a parity interleave (pure layout, fused by XLA). The summands
per output pixel are exactly the nonzero taps of the dilated form, so the
result is element-wise identical up to f32-accumulator reassociation.

Reference behavior matched: torch.nn.ConvTranspose2d(C_in, C_out, 4, 2, 1)
as used at models/generator_obj_att.py:529-537 (decoder dc1..dc3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv_transpose_phase(x: jax.Array, kernel: jax.Array, dtype=None) -> jax.Array:
    """Exact ConvTranspose2d(k=4, s=2, p=1) via per-parity k=2 convs.

    x: (B, S, S, C_in) NHWC. kernel: (4, 4, C_in, C_out) in the forward-conv
    HWIO layout stored by models.layers.ConvTranspose2d. Returns
    (B, 2S, 2S, C_out). No bias (dc1..dc3 are bias-free).
    """
    k = kernel.shape[0]
    if k != 4 or kernel.shape[1] != 4:
        raise ValueError(f"phase path is specialized to k=4, got {kernel.shape}")
    b, s, s2, cin = x.shape
    cout = kernel.shape[-1]
    dtype = dtype or x.dtype

    # Wbig[dy, dx, i, (py*2+px)*C_out + o] = W[2*dy+py, 2*dx+px, i, o]
    w = kernel.astype(dtype).reshape(2, 2, 2, 2, cin, cout)  # (dy,py,dx,px,i,o)
    w = jnp.transpose(w, (0, 2, 4, 1, 3, 5)).reshape(2, 2, cin, 4 * cout)

    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    t = jax.lax.conv_general_dilated(
        xp,
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, S+1, S+1, 4*C_out)

    # out[b, 2m+py, 2n+px, o] = t[b, m+py, n+px, (py*2+px)*C_out + o]
    return _parity_interleave(t, s, cout)


def _parity_interleave(t: jax.Array, s: int, cout: int) -> jax.Array:
    """(B, S+1, S+1, 4*C) phase stack -> (B, 2S, 2S, C) parity interleave.

    out[b, 2m+py, 2n+px, o] = t[b, m+py, n+px, (py*2+px)*C + o] — pure
    layout; XLA fuses the slices + stacks into one copy.
    """
    b = t.shape[0]
    t = t.reshape(b, s + 1, s + 1, 2, 2, cout)
    rows = jnp.stack(
        [
            jnp.stack(
                [t[:, py : py + s, px : px + s, py, px, :] for px in (0, 1)], axis=3
            )
            for py in (0, 1)
        ],
        axis=2,
    )  # (B, S, 2, S, 2, C_out)
    return rows.reshape(b, 2 * s, 2 * s, cout)


def conv_up2_phase(x: jax.Array, kernel: jax.Array, dtype=None) -> jax.Array:
    """Exact [nearest-2x-upsample -> conv k=7 p=3] via per-parity k=4 convs.

    The decoder's c5 runs a 7x7 conv over the 2x-nearest-upsampled 64^2 RGB
    (reference models/generator_obj_att128.py:560-565: F.interpolate
    scale_factor=2 then conv7x7). Because up[t] = x[t >> 1], output parity
    phase p reads each original row 1-2 times with adjacent kernel taps, so
    the 7 taps COLLAPSE to 4 per axis with pair-summed weights:

        p = 0:  x[m-2]*W0, x[m-1]*(W1+W2), x[m]*(W3+W4), x[m+1]*(W5+W6)
        p = 1:  x[m-1]*(W0+W1), x[m]*(W2+W3), x[m+1]*(W4+W5), x[m+2]*W6

    All four (py, px) phases run as ONE k=4 VALID conv with 4*C_out output
    channels on the once-padded 64^2 input — (16/49)x the dense FLOPs at
    half the spatial footprint — followed by the same parity interleave as
    conv_transpose_phase. Exact up to bf16 rounding of the f32 tap-pair
    sums (the dense path rounds each tap separately).

    x: (B, S, S, C_in); kernel: (7, 7, C_in, C_out). Returns
    (B, 2S, 2S, C_out). No bias (c5 is bias-free).
    """
    if kernel.shape[0] != 7 or kernel.shape[1] != 7:
        raise ValueError(f"up2-phase path is specialized to k=7, got {kernel.shape}")
    b, s, _, cin = x.shape
    cout = kernel.shape[-1]
    dtype = dtype or x.dtype

    # per-axis tap-collapse matrices A[p] (4 collapsed taps x 7 original)
    a = np.zeros((2, 4, 7), np.float32)
    a[0, 0, 0] = 1
    a[0, 1, 1] = a[0, 1, 2] = 1
    a[0, 2, 3] = a[0, 2, 4] = 1
    a[0, 3, 5] = a[0, 3, 6] = 1
    a[1, 0, 0] = a[1, 0, 1] = 1
    a[1, 1, 2] = a[1, 1, 3] = 1
    a[1, 2, 4] = a[1, 2, 5] = 1
    a[1, 3, 6] = 1
    am = jnp.asarray(a)
    # Wbig[dy, dx, i, (py*2+px)*C_out + o] = sum_ky,kx A[py,dy,ky] A[px,dx,kx] W[ky,kx,i,o]
    w = jnp.einsum(
        "pdk,qel,klio->depqio", am, am, kernel.astype(jnp.float32)
    )  # (dy, dx, py, px, i, o); fold in f32, round once below
    w = w.reshape(4, 4, 2 * 2, cin, cout)
    w = jnp.transpose(w, (0, 1, 3, 2, 4)).reshape(4, 4, cin, 4 * cout).astype(dtype)

    xp = jnp.pad(x.astype(dtype), ((0, 0), (2, 2), (2, 2), (0, 0)))
    t = jax.lax.conv_general_dilated(
        xp,
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, S+1, S+1, 4*C_out)
    return _parity_interleave(t, s, cout)
