"""conv_small_int8 kernel vs a dense f32 conv (quantization-bounded)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.ops.pallas_conv8_int8 import conv_small_int8
from aglayout_tpu.ops.pallas_spade_c6_int8 import quantize_conv_weights

pytestmark = pytest.mark.quick


def test_conv_small_int8_close_to_dense():
    rng = np.random.RandomState(0)
    b, s, cin, cout, k = 8, 8, 192, 256, 5
    x = rng.randn(b, s, s, cin).astype(np.float32)
    w = (rng.randn(k, k, cin, cout) * 0.05).astype(np.float32)

    wq, sw = quantize_conv_weights(jnp.asarray(w))
    got = conv_small_int8(jnp.asarray(x), wq, sw, k=k, gb=4, interpret=True)

    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want))
    ref = np.abs(np.asarray(want)).mean()
    assert err.mean() / ref < 0.02, (err.mean(), ref)
    assert np.quantile(err, 0.999) / ref < 0.15
