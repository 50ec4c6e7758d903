"""conv_transpose_phase == the lhs-dilated ConvTranspose2d lowering.

The phase decomposition sums exactly the nonzero taps of the dilated form
(ops/phase_deconv.py), so outputs must match to f32-reassociation noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.ops.phase_deconv import conv_transpose_phase


def _dilated_reference(x, kernel, dtype):
    pad = 4 - 1 - 1  # k - 1 - p, matching models/layers.py ConvTranspose2d
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(1, 1),
        padding=[(pad, pad)] * 2,
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.quick
@pytest.mark.parametrize("s,cin,cout", [(8, 16, 16), (16, 16, 8), (5, 4, 4)])
def test_phase_equals_dilated_f32(s, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, s, s, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, cin, cout).astype(np.float32) * 0.1)
    ref = _dilated_reference(x, w, jnp.float32)
    got = conv_transpose_phase(x, w)
    assert got.shape == ref.shape == (3, 2 * s, 2 * s, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_phase_equals_dilated_bf16():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 32, 16).astype(np.float32) * 0.1)
    ref = _dilated_reference(x, w, jnp.bfloat16).astype(np.float32)
    got = conv_transpose_phase(x.astype(jnp.bfloat16), w, dtype=jnp.bfloat16).astype(
        np.float32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


@pytest.mark.quick
@pytest.mark.parametrize("s,cin,cout", [(8, 3, 16), (16, 4, 8)])
def test_up2_phase_equals_dense_f32(s, cin, cout):
    from aglayout_tpu.ops.phase_deconv import conv_up2_phase

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, s, s, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, cin, cout).astype(np.float32) * 0.1)
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ref = jax.lax.conv_general_dilated(
        up, w, (1, 1), [(3, 3)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = conv_up2_phase(x, w)
    assert got.shape == ref.shape == (2, 2 * s, 2 * s, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_up2_phase_equals_dense_bf16():
    from aglayout_tpu.ops.phase_deconv import conv_up2_phase

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 16).astype(np.float32) * 0.1)
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2).astype(jnp.bfloat16)
    ref = jax.lax.conv_general_dilated(
        up,
        w.astype(jnp.bfloat16),
        (1, 1),
        [(3, 3)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(np.float32)
    got = conv_up2_phase(x.astype(jnp.bfloat16), w, dtype=jnp.bfloat16).astype(
        np.float32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-2, atol=3e-2)


@pytest.mark.quick
def test_decoder_phase_dc_matches_dense():
    """Decoder eval with phase_dc on == off (same params), 128^2 config."""
    from aglayout_tpu.models.generator import Decoder

    rng = np.random.RandomState(2)
    hidden = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    glob = jnp.asarray(rng.randn(2, 32).astype(np.float32))

    kw = dict(image_size=128, conv_dim=16)
    dec_off = Decoder(**kw, phase_dc=False)
    dec_on = Decoder(**kw, phase_dc=True)
    params = dec_off.init(jax.random.PRNGKey(0), hidden, glob, train=False)
    out_off = dec_off.apply(params, hidden, glob, train=False)
    out_on = dec_on.apply(params, hidden, glob, train=False)
    np.testing.assert_allclose(
        np.asarray(out_on), np.asarray(out_off), rtol=1e-5, atol=1e-5
    )
