"""Pallas conv kernel: interpret-mode exactness (device run is gated on TPU
VMEM work — see module STATUS note)."""

import jax
import jax.numpy as jnp
import numpy as np

from aglayout_tpu.ops.pallas_conv import pallas_conv_few_out


def test_pallas_conv_few_out_interpret():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    out = pallas_conv_few_out(x, k, b, interpret=True)
    ref = (
        jax.lax.conv_general_dilated(
            x, k, (1, 1), [(3, 3)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + b
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pallas_conv_3x3_interpret():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 16, 2).astype(np.float32))
    out = pallas_conv_few_out(x, k, interpret=True)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pallas_conv_nchw_interpret():
    from aglayout_tpu.ops.pallas_conv_nchw import pallas_conv_few_out_nchw

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    out = pallas_conv_few_out_nchw(x, k, b, interpret=True)
    ref = (
        jax.lax.conv_general_dilated(
            x, k, (1, 1), [(3, 3)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + b
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
