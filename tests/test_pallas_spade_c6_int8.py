"""spade_c6_int8 kernel vs the dense composition, with an explicit
quantization-error bound (the kernel is approximate by design: int8
activations with per-chunk dynamic scales, per-out-channel int8 weights,
exact s32 accumulation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.ops.pallas_spade_c6_int8 import (
    K6,
    quantize_conv_weights,
    spade_c6_int8,
)

pytestmark = pytest.mark.quick


def dense_reference(x, a_tab, b_tab, w, f):
    """relu(x * A + B) -> 5x5 conv, all f32, with the table expansion."""
    b, h, wid, c = x.shape

    def cls_of(u):
        return 0 if u == 0 else 1 if u == 1 else 3 if u == f - 2 else 4 if u == f - 1 else 2

    rows_a = np.stack([a_tab[:, g // f, cls_of(g % f)] for g in range(h)], 1)
    rows_b = np.stack([b_tab[:, g // f, cls_of(g % f)] for g in range(h)], 1)
    y = np.maximum(x * rows_a + rows_b, 0.0)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(y),
        jnp.asarray(w),
        (1, 1),
        [(K6 // 2, K6 // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return np.asarray(out)


def test_spade_c6_int8_close_to_dense():
    rng = np.random.RandomState(0)
    b, h, w, c, f = 2, 32, 32, 128, 8
    ch = 16
    x = rng.randn(b, h, w, c).astype(np.float32)
    a_tab = rng.uniform(0.5, 1.5, (b, h // f, 5, w, c)).astype(np.float32)
    b_tab = rng.randn(b, h // f, 5, w, c).astype(np.float32) * 0.2
    wk = (rng.randn(K6, K6, c, c) * 0.05).astype(np.float32)

    wq, sw = quantize_conv_weights(jnp.asarray(wk))
    got = spade_c6_int8(
        jnp.asarray(x),
        jnp.asarray(a_tab),
        jnp.asarray(b_tab),
        wq,
        sw,
        f=f,
        ch=ch,
        interpret=True,
    )
    want = dense_reference(x, a_tab, b_tab, wk, f)

    err = np.abs(np.asarray(got, np.float32) - want)
    scale_ref = np.abs(want).mean()
    # int8 with exact s32 accumulation: relative error well under 2%
    assert err.mean() / scale_ref < 0.02, (err.mean(), scale_ref)
    assert np.quantile(err, 0.999) / scale_ref < 0.15


def test_quantize_conv_weights_roundtrip():
    rng = np.random.RandomState(1)
    w = (rng.randn(5, 5, 16, 32) * 0.1).astype(np.float32)
    wq, sw = quantize_conv_weights(jnp.asarray(w))
    back = np.asarray(wq, np.float32) * np.asarray(sw)
    assert np.abs(back - w).max() <= np.asarray(sw).max() * 0.5 + 1e-7
    assert np.asarray(wq).min() >= -127 and np.asarray(wq).max() <= 127
