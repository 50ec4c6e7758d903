"""MXU-efficient exact rewrites of channel-skewed convolutions.

The decoder's RGB-adjacent convs are MXU-hostile: a KxK conv with 3 output
channels pads N=3 to the 128-wide MXU (2.5% utilization), and a conv FROM
3-channel (upsampled RGB) input pads K=3. Both are rewritten exactly:

* `conv_few_out`: out[y,x,o] = sum_{dy,dx} Y[y+dy-r, x+dx-r, (dy,dx,o)]
  where Y = x @ W_flat is a full-MXU 1x1 conv to K*K*O merged channels,
  followed by a K^2 shifted-slice summation (each Y element is consumed
  exactly once, so the reduction is one extra memory pass).
  Used for decoder c4 (7x7, 64->3) and c7 (7x7, 128->3).

* `conv_up2_rgb`: conv(W, nearest_up2(rgb)) decomposed into 2x2 output
  phases; each phase is a 5x5-support conv expressed as a shifted-stack of
  the low-res RGB (75 merged input channels) hitting one full-MXU 1x1 conv,
  then depth-to-space. Used for decoder c5 (7x7 on 2x-upsampled 64^2 RGB).

Both are bit-exact reformulations (tests vs lax.conv); gradients flow
through plain jnp ops.

STATUS: measured on TPU v5e via XLA, the shifted-slice reductions do NOT
fuse well (128^2 serving regressed 1670 -> 1478 img/s) — XLA materializes
the shifted partials. The profitable form is the Pallas kernel in
ops/pallas_conv_nchw.py (matmul + in-VMEM shifted reduction in one pass,
1.46x the XLA conv), which the decoder uses on TPU for c4/c7. conv_up2_rgb alone was also measured in-model (1835 -> 1571 img/s: the
shifted-stack materialization loses to XLA fusing the 2x repeat into the
conv input read). These jnp-level rewrites remain as the readable spec and
the CPU-testable reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift2d(x, dy: int, dx: int):
    if dy == 0 and dx == 0:
        return x
    _, h, w, _ = x.shape
    pad = [(0, 0), (max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)), (0, 0)]
    xp = jnp.pad(x, pad)
    y0, x0 = max(dy, 0), max(dx, 0)
    return xp[:, y0 : y0 + h, x0 : x0 + w, :]


def conv_few_out(x, kernel, bias=None):
    """Exact KxK same-padding conv for small output-channel counts.

    x: (B, H, W, C); kernel: (K, K, C, O) with O small (e.g. 3).
    Returns (B, H, W, O).
    """
    k = kernel.shape[0]
    r = k // 2
    c_in, c_out = kernel.shape[2], kernel.shape[3]
    w_flat = kernel.reshape(k * k, c_in, c_out).transpose(1, 0, 2).reshape(c_in, k * k * c_out)
    y = x @ w_flat.astype(x.dtype)  # (B, H, W, K*K*O) — full-MXU matmul
    out = 0.0
    for dy in range(k):
        for dx in range(k):
            idx = (dy * k + dx) * c_out
            out = out + _shift2d(y[..., idx : idx + c_out], dy - r, dx - r)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_few_in(x, kernel, bias=None):
    """Exact KxK same-padding conv for small INPUT-channel counts.

    Merges the K*K taps into the contraction dim via a shifted-stack
    (im2col), turning a K=3-channel conv (2.5% MXU) into one K^2*C_in-deep
    full-MXU matmul. x: (B, H, W, C_in); kernel: (K, K, C_in, O).
    Used for the crop encoder's 7x7 RGB stem (c1).
    """
    k = kernel.shape[0]
    r = k // 2
    c_in, c_out = kernel.shape[2], kernel.shape[3]
    stack = jnp.concatenate(
        [_shift2d(x, dy - r, dx - r) for dy in range(k) for dx in range(k)], axis=-1
    )  # (B, H, W, K*K*C_in); channel order (dy, dx, c)
    w_flat = kernel.reshape(k * k * c_in, c_out)
    out = stack @ w_flat.astype(stack.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_up2_rgb(rgb, kernel, bias=None):
    """Exact `conv(K=7, pad=3)(nearest_up2(rgb))` without materializing the
    upsampled image or running a K=3 conv.

    rgb: (B, h, w, 3); kernel: (7, 7, 3, O). Returns (B, 2h, 2w, O).
    """
    k = kernel.shape[0]
    assert k == 7, "specialized for the decoder's 7x7 c5"
    c_in, c_out = kernel.shape[2], kernel.shape[3]
    b, h, w, _ = rgb.shape

    # phase (u, v) of the output reads rgb at offset a = floor((u + dy - 3)/2)
    # for tap dy; aggregate kernel taps per (phase, offset in [-2, 2])
    def offs(u, d):
        return (u + d - 3) // 2

    # build per-phase aggregated kernels A[u][v]: (5, 5, 3, O)
    A = [[None for _ in range(2)] for _ in range(2)]
    for u in range(2):
        for v in range(2):
            acc = jnp.zeros((5, 5, c_in, c_out), kernel.dtype)
            for dy in range(k):
                for dx in range(k):
                    acc = acc.at[offs(u, dy) + 2, offs(v, dx) + 2].add(kernel[dy, dx])
            A[u][v] = acc

    # shifted-stack of the low-res image: channels ordered (a, b, c)
    stack = jnp.concatenate(
        [_shift2d(rgb, a, bb) for a in range(-2, 3) for bb in range(-2, 3)], axis=-1
    )  # (B, h, w, 25 * c_in)
    w_all = jnp.concatenate(
        [A[u][v].reshape(25 * c_in, c_out) for u in range(2) for v in range(2)], axis=-1
    )  # (25*c_in, 4*O)
    y = stack @ w_all.astype(stack.dtype)  # (B, h, w, 4*O) — one big matmul

    y = y.reshape(b, h, w, 2, 2, c_out)  # (..., u, v, O)
    out = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c_out)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
