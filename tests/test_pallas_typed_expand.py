"""typed_c3_expand Pallas kernel vs the reference einsum composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.ops.pallas_typed_expand import (
    KW,
    NA,
    NL,
    typed_c3_expand,
    typed_c3_expand_v4,
    typed_c3_expand_v5,
    typed_c3_expand_v6,
)

pytestmark = pytest.mark.quick


@pytest.mark.parametrize(
    "kernel",
    [typed_c3_expand, typed_c3_expand_v4, typed_c3_expand_v5, typed_c3_expand_v6],
)
@pytest.mark.parametrize("n,s3,c2,c4,group", [(8, 32, 128, 256, 8), (6, 16, 128, 256, 4)])
def test_typed_c3_expand_matches_einsum(n, s3, c2, c4, group, kernel):
    rng = np.random.RandomState(0)
    z2p = rng.randn(n, NL, NL, c2).astype(np.float32)
    z2p[:, NL - 1] = 0.0
    z2p[:, :, NL - 1] = 0.0
    idxR = rng.randint(0, NL, (n, NA, KW)).astype(np.int32)
    # col-window source types; NL = OOB (contributes zero)
    lsel = rng.randint(0, NL + 1, (n, NA, KW)).astype(np.int32)
    selR = rng.randint(0, NA, (n, s3)).astype(np.int32)
    selC = rng.randint(0, NA, (n, s3)).astype(np.int32)
    ab = rng.randn(n, 2, c4).astype(np.float32) * 0.5
    w3 = rng.randn(KW, KW, c2, c4).astype(np.float32) * 0.05
    w3t = w3.transpose(0, 2, 1, 3).reshape(KW * c2, KW * c4)

    got = kernel(
        jnp.asarray(z2p), jnp.asarray(idxR), jnp.asarray(lsel),
        jnp.asarray(selR), jnp.asarray(selC), jnp.asarray(ab), jnp.asarray(w3t),
        interpret=True, group=group,
    )

    # reference composition
    Z1 = np.take_along_axis(
        z2p[:, :, None], idxR.reshape(n, NA * KW, 1, 1, 1), axis=1
    ).reshape(n, NA, KW, NL, c2)
    W3z = np.einsum("nahlc,hwcC->nalwC", Z1, w3)
    # hc as one-hot over l per (b, w), zero row when OOB
    hclw = (lsel[..., None, :] == np.arange(NL)[None, None, :, None]).astype(
        np.float32
    )  # (n, NA, NL, KW)
    V3 = np.einsum("nglw,nalwC->ngaC", hclw, W3z)
    V3 = np.maximum(V3 * ab[:, None, None, 0] + ab[:, None, None, 1], 0.0)
    er = (selR[..., None] == np.arange(NA)).astype(np.float32)
    ec = (selC[..., None] == np.arange(NA)).astype(np.float32)
    T = np.einsum("nxg,ngaC->nxaC", ec, V3)
    want = np.einsum("nya,nxaC->nyxC", er, T)

    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
