"""typed_c3_expand Pallas kernel vs the reference einsum composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.ops.pallas_typed_expand import KW, NA, NL, typed_c3_expand


@pytest.mark.parametrize("n,s3,c2,c4", [(8, 32, 128, 256), (6, 16, 128, 256)])
def test_typed_c3_expand_matches_einsum(n, s3, c2, c4):
    rng = np.random.RandomState(0)
    z2p = rng.randn(n, NL, NL, c2).astype(np.float32)
    z2p[:, NL - 1] = 0.0
    z2p[:, :, NL - 1] = 0.0
    idxR = rng.randint(0, NL, (n, NA, KW)).astype(np.int32)
    # hc: one-hot over l per (g, w) with some all-zero (OOB) columns
    lsel = rng.randint(0, NL + 1, (n, NA, KW))
    hc = (lsel[..., None, :] == np.arange(NL)[None, None, :, None]).astype(np.float32)
    hc = hc.reshape(n, NA, NL * KW)
    er = (rng.randint(0, NA, (n, s3, 1)) == np.arange(NA)).astype(np.float32)
    ec = (rng.randint(0, NA, (n, s3, 1)) == np.arange(NA)).astype(np.float32)
    ab = rng.randn(n, 2, c4).astype(np.float32) * 0.5
    w3 = rng.randn(KW, KW, c2, c4).astype(np.float32) * 0.05
    w3t = w3.transpose(0, 2, 1, 3).reshape(KW * c2, KW * c4)

    got = typed_c3_expand(
        jnp.asarray(z2p), jnp.asarray(idxR), jnp.asarray(hc),
        jnp.asarray(er), jnp.asarray(ec), jnp.asarray(ab), jnp.asarray(w3t),
        interpret=True,
    )

    # reference composition
    Z1 = np.take_along_axis(
        z2p[:, :, None], idxR.reshape(n, NA * KW, 1, 1, 1), axis=1
    ).reshape(n, NA, KW, NL, c2)
    W3z = np.einsum("nahlc,hwcC->nalwC", Z1.transpose(0, 1, 2, 3, 4), w3)
    # hc as (n, g, l, w)
    hclw = hc.reshape(n, NA, NL, KW)
    V3 = np.einsum("nglw,nalwC->ngaC", hclw, W3z)
    V3 = np.maximum(V3 * ab[:, None, None, 0] + ab[:, None, None, 1], 0.0)
    T = np.einsum("nxg,ngaC->nxaC", ec, V3)
    want = np.einsum("nya,nxaC->nyxC", er, T)

    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
