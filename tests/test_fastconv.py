"""fastconv rewrites must be exact vs lax.conv."""

import jax
import jax.numpy as jnp
import numpy as np

from aglayout_tpu.ops.fastconv import conv_few_out, conv_up2_rgb


def ref_conv(x, kernel, pad):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(pad, pad)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_conv_few_out_exact():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    out = conv_few_out(x, k, b)
    ref = ref_conv(x, k, 3) + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_conv_few_out_5x5():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 10, 12, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(5, 5, 8, 2).astype(np.float32))
    out = conv_few_out(x, k)
    ref = ref_conv(x, k, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_conv_up2_rgb_exact():
    rng = np.random.RandomState(2)
    rgb = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, 3, 24).astype(np.float32))
    up = jnp.repeat(jnp.repeat(rgb, 2, axis=1), 2, axis=2)
    ref = ref_conv(up, k, 3)
    out = conv_up2_rgb(rgb, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_gradients_flow():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, 4, 3).astype(np.float32))

    g1 = jax.grad(lambda k: jnp.sum(conv_few_out(x, k) ** 2))(k)
    g2 = jax.grad(lambda k: jnp.sum(ref_conv(x, k, 3) ** 2))(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-3)


def test_conv_few_in_exact():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 12, 12, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, 3, 16).astype(np.float32))
    out = __import__("aglayout_tpu.ops.fastconv", fromlist=["conv_few_in"]).conv_few_in(x, k)
    ref = ref_conv(x, k, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
