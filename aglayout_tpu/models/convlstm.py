"""ConvLSTM layout fusion as a masked `lax.scan` over the object axis.

TPU-native replacement for the reference's LayoutConvLSTM
(models/generator_obj_att.py:232-364), which runs a doubly-nested Python
loop (per image x per object x per layer) over a ragged object list — the
reference's single biggest XLA-hostility. Here every image carries a static
O_max object slots with a validity mask; invalid slots carry the LSTM state
through unchanged (h/c unchanged ⇒ final state equals the reference's state
after its last real object), and the whole batch advances in one scan step,
so each step is a large batched 5x5 conv on the MXU.

Layer interleaving note: the reference finishes layer l over the full
sequence before starting layer l+1; we apply all layers within one timestep.
The dependence structure is causal in both (h_t^l needs h_t^{l-1} and
h_{t-1}^l), so the results are identical.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from aglayout_tpu.models.layers import Conv2d

# int8 gate conv engages only above this cin*cout (see ConvLSTMCell doc).
_INT8_MIN_CINCOUT = 512 * 512


class ConvLSTMCell(nn.Module):
    """Standard 4-gate conv LSTM cell: conv(cat(x, h)) -> i, f, o, g.

    Gate order matches the reference's torch.split (i, f, o, g) at
    models/generator_obj_att.py:99-114 for checkpoint-importer parity.

    int8_serving: run the gate conv through the Pallas int8 kernel
    (ops/pallas_conv8_int8.py) — the gate convs are 92% of bf16 MXU peak
    and only the 2x int8 MXU rate goes faster. Approximate (the saturating
    gate nonlinearities damp the sub-1% pre-activation error); serving
    only, never set for training. Only wide cells pay off: measured in-scan
    at b=128 8x8, 640->512 runs 0.82 -> 0.62 ms/conv while 192->256 and
    128->256 regress (kernel overhead-bound), so the int8 route engages
    only when cin*cout clears _INT8_MIN_CINCOUT.
    """

    hidden_dim: int
    kernel_size: int = 5
    int8_serving: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        inp = jnp.concatenate([x, h], axis=-1)
        conv = Conv2d(
            4 * self.hidden_dim,
            self.kernel_size,
            padding=self.kernel_size // 2,
            use_bias=True,
            dtype=self.dtype,
            name="conv",
            in_features=inp.shape[-1],
        )
        cin, cout = inp.shape[-1], 4 * self.hidden_dim
        if self.int8_serving and cin * cout >= _INT8_MIN_CINCOUT:
            from aglayout_tpu.ops.pallas_conv8_int8 import conv_small_int8
            from aglayout_tpu.ops.pallas_spade_c6_int8 import quantize_conv_weights

            # weight quantization is loop-invariant across the object scan
            # (params are scan-broadcast; XLA's while-loop LICM hoists it)
            wq, sw = quantize_conv_weights(conv.kernel)
            z = conv_small_int8(inp, wq, sw, k=self.kernel_size)
            z = z + conv.bias.astype(z.dtype)
        else:
            z = conv(inp)
        i, f, o, g = jnp.split(z, 4, axis=-1)
        c_next = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h_next = nn.sigmoid(o) * jnp.tanh(c_next)
        return (h_next, c_next), h_next


class _FuserStep(nn.Module):
    hidden_dims: Tuple[int, ...]
    kernel_size: int
    int8_serving: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, carry, xs):
        xt, vt = xs  # (B, H, W, C), (B,)
        m = vt.astype(xt.dtype)[:, None, None, None]
        new_carry = []
        inp = xt
        for li, hd in enumerate(self.hidden_dims):
            h, c = carry[li]
            (h2, c2), _ = ConvLSTMCell(
                hd,
                self.kernel_size,
                int8_serving=self.int8_serving,
                dtype=self.dtype,
                name=f"cell_{li}",
            )((h, c), inp)
            h2 = m * h2 + (1 - m) * h
            c2 = m * c2 + (1 - m) * c
            new_carry.append((h2, c2))
            inp = h2
        return tuple(new_carry), None


class LayoutFuser(nn.Module):
    """Fuse (B, O, H, W, C) per-object features into (B, H, W, hidden[-1]).

    Returns the final hidden state of the last layer — the reference's
    "last hidden state per image" (models/generator_obj_att.py:341-346).
    Hidden dims by clstm_layers: 1 -> (64,), 2 -> (64, 64), 3 -> (128, 64, 64)
    (reference models/generator_obj_att.py:459-464), kernel 5x5.
    """

    hidden_dims: Tuple[int, ...] = (128, 64, 64)
    kernel_size: int = 5
    int8_serving: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, valid, unroll: int = 1):
        b, o, h, w, _ = x.shape
        dtype = self.dtype or x.dtype
        carry = tuple(
            (
                jnp.zeros((b, h, w, hd), dtype),
                jnp.zeros((b, h, w, hd), dtype),
            )
            for hd in self.hidden_dims
        )
        scan = nn.scan(
            _FuserStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            unroll=min(max(int(unroll), 1), o),
        )
        carry, _ = scan(
            self.hidden_dims,
            self.kernel_size,
            self.int8_serving,
            self.dtype,
            name="step",
        )(carry, (x, valid))
        return carry[-1][0]
