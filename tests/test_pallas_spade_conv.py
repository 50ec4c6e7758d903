"""Fused SPADE + few-out conv Pallas head vs the dense composition.

The kernel (ops/pallas_spade_conv.py) must reproduce, element-wise:
  conv(relu(SPADE_eval(x, seg)))
for the decoder's RGB heads (reference models/generator_obj_att128.py:549-604).
Runs in interpret mode on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.models.norms import SPADE
from aglayout_tpu.ops.pallas_spade_conv import spade_few_out_conv


@pytest.mark.parametrize(
    "b,H,C,O,K,hs,seg_c",
    [
        (2, 128, 128, 3, 7, 8, 64),  # decoder c7 shape (f=16)
        (2, 64, 64, 3, 7, 8, 64),    # decoder c4 shape (f=8)
        (1, 64, 128, 3, 5, 4, 64),   # f=16 on a 4x4 seg, K=5 generality
    ],
)
def test_fused_head_matches_dense(b, H, C, O, K, hs, seg_c):
    rng = np.random.RandomState(0)
    f = H // hs

    spade = SPADE(C, seg_features=seg_c)
    seg = jnp.asarray(rng.randn(b, hs, hs, seg_c).astype(np.float32))
    x = jnp.asarray(rng.randn(b, H, H, C).astype(np.float32))
    variables = spade.init(jax.random.PRNGKey(0), x, seg, True)
    # non-trivial running stats
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.1 * jnp.asarray(rng.rand(*v.shape), v.dtype) if v.ndim else v,
        variables,
    )

    kern = jnp.asarray(0.1 * rng.randn(K, K, C, O).astype(np.float32))
    bias = jnp.asarray(rng.randn(O).astype(np.float32))

    def dense(x):
        y = jax.nn.relu(spade.apply(variables, x, seg, True))
        out = jax.lax.conv_general_dilated(
            y,
            kern,
            (1, 1),
            [(K // 2, K // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias

    a_tab, b_tab = spade.apply(
        variables, seg, f, method=SPADE.folded_affine_tables
    )
    assert a_tab.shape == (b, hs, 5, H, C)
    got = spade_few_out_conv(x, a_tab, b_tab, kern, bias, f=f, interpret=True)
    want = dense(x)
    # f32 with different contraction order (kn2row vs direct conv): tiny
    # re-association differences on O(100) outputs
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=5e-3)

    # the transposed-x entry point (serving path) is the same math
    if C % 128:
        return  # transposed path requires a 128-aligned channel fold
    got_t = spade_few_out_conv(
        jnp.transpose(x, (1, 2, 0, 3)),
        a_tab,
        b_tab,
        kern,
        bias,
        f=f,
        interpret=True,
        transposed=True,
    )
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(got), rtol=0, atol=0)

    # compact class-resolution tables (in-kernel one-hot W expansion):
    # exactly the same coefficients, so bit-equal to the expanded-table run
    a_c, b_c = spade.apply(
        variables, seg, f, method=SPADE.folded_affine_tables_compact_flat
    )
    assert a_c.shape == (b, hs * 5, hs, 5, C)
    got_c = spade_few_out_conv(
        x, a_c, b_c, kern, bias, f=f, interpret=True, compact=True
    )
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(got), rtol=0, atol=0)


@pytest.mark.parametrize("b,H,C,hs,K", [(8, 128, 128, 8, 7), (8, 64, 128, 8, 7), (16, 64, 128, 4, 5)])
def test_head8_matches_dense(b, H, C, hs, K):
    """spade_few_out_conv8 ((H,W,B,C) input, 8-image sublane groups, halo
    DMA, fully compact class tables) == the dense composition, incl. the
    clipped edge row-blocks."""
    from aglayout_tpu.ops.pallas_spade_conv import spade_few_out_conv8

    rng = np.random.RandomState(1)
    f = H // hs
    O, seg_c = 3, 64
    spade = SPADE(C, seg_features=seg_c)
    seg = jnp.asarray(rng.randn(b, hs, hs, seg_c).astype(np.float32))
    x = jnp.asarray(rng.randn(b, H, H, C).astype(np.float32))
    variables = spade.init(jax.random.PRNGKey(0), x, seg, True)
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.1 * jnp.asarray(rng.rand(*v.shape), v.dtype) if v.ndim else v,
        variables,
    )
    kern = jnp.asarray(0.1 * rng.randn(K, K, C, O).astype(np.float32))
    bias = jnp.asarray(rng.randn(O).astype(np.float32))

    y = jax.nn.relu(spade.apply(variables, x, seg, True))
    want = (
        jax.lax.conv_general_dilated(
            y, kern, (1, 1), [(K // 2, K // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + bias
    )
    a_c, b_c = spade.apply(
        variables, seg, f, method=SPADE.folded_affine_tables_compact
    )
    assert a_c.shape == (b // 8, hs, 5, hs * 5, 8, C)
    got = spade_few_out_conv8(
        jnp.transpose(x, (1, 2, 0, 3)), a_c, b_c, kern, bias, f=f, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=5e-3)

    # multi-row-block variant (fb=2): same math, halved halo amplification
    if hs % 2 == 0:
        got2 = spade_few_out_conv8(
            jnp.transpose(x, (1, 2, 0, 3)),
            a_c, b_c, kern, bias, f=f, fb=2, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got2), np.asarray(got), rtol=0, atol=0
        )


def test_spade_apply_t_matches_dense():
    """spade_apply_t == relu(SPADE_eval(x, seg)) on the (H,W,B,C) view."""
    from aglayout_tpu.ops.pallas_spade_conv import spade_apply_t

    rng = np.random.RandomState(2)
    b, hs, C, seg_c, f = 2, 8, 128, 64, 16
    H = hs * f
    spade = SPADE(C, seg_features=seg_c)
    seg = jnp.asarray(rng.randn(b, hs, hs, seg_c).astype(np.float32))
    x = jnp.asarray(rng.randn(b, H, H, C).astype(np.float32))
    variables = spade.init(jax.random.PRNGKey(0), x, seg, True)
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.1 * jnp.asarray(rng.rand(*v.shape), v.dtype) if v.ndim else v,
        variables,
    )

    want = jax.nn.relu(spade.apply(variables, x, seg, True))
    a_tab, b_tab = spade.apply(variables, seg, f, method=SPADE.folded_affine_tables)
    got_t = spade_apply_t(
        jnp.transpose(x, (1, 2, 0, 3)), a_tab, b_tab, f=f, interpret=True
    )
    got = jnp.transpose(got_t, (2, 0, 1, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spade_apply8_matches_dense():
    """spade_apply8 (compact tables, 8-image sublane) == relu(SPADE_eval)."""
    from aglayout_tpu.ops.pallas_spade_conv import spade_apply8

    rng = np.random.RandomState(3)
    b, hs, C, seg_c, f = 8, 8, 128, 64, 16
    H = hs * f
    spade = SPADE(C, seg_features=seg_c)
    seg = jnp.asarray(rng.randn(b, hs, hs, seg_c).astype(np.float32))
    x = jnp.asarray(rng.randn(b, H, H, C).astype(np.float32))
    variables = spade.init(jax.random.PRNGKey(0), x, seg, True)
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.1 * jnp.asarray(rng.rand(*v.shape), v.dtype) if v.ndim else v,
        variables,
    )

    want = jax.nn.relu(spade.apply(variables, x, seg, True))
    a_tab, b_tab = spade.apply(
        variables, seg, f, method=SPADE.folded_affine_tables_compact
    )
    assert a_tab.shape == (1, hs, 5, hs * 5, 8, C)
    got_t = spade_apply8(
        jnp.transpose(x, (1, 2, 0, 3)), a_tab, b_tab, f=f, interpret=True
    )
    got = jnp.transpose(got_t, (2, 0, 1, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_folded_tables_match_full_gamma_beta():
    """The row-class-expanded tables must agree with the assembled full-res
    gamma/beta: A == a0*(1+gamma_full), B == b0*(1+gamma_full)+beta_full."""
    rng = np.random.RandomState(1)
    b, hs, C, seg_c, f = 2, 8, 32, 64, 16
    spade = SPADE(C, seg_features=seg_c)
    seg = jnp.asarray(rng.randn(b, hs, hs, seg_c).astype(np.float32))
    x = jnp.asarray(rng.randn(b, hs * f, hs * f, C).astype(np.float32))
    variables = spade.init(jax.random.PRNGKey(0), x, seg, True)

    gamma, beta = spade.apply(variables, seg, f, method=SPADE._gamma_beta_fused)
    a_tab, b_tab = spade.apply(variables, seg, f, method=SPADE.folded_affine_tables)

    mean = variables["batch_stats"]["param_free_norm"]["mean"]
    var = variables["batch_stats"]["param_free_norm"]["var"]
    a0 = 1.0 / np.sqrt(np.asarray(var) + 1e-5)
    b0 = -np.asarray(mean) * a0

    def cls_of(u):
        return 0 if u == 0 else 1 if u == 1 else 3 if u == f - 2 else 4 if u == f - 1 else 2

    # expand tables to full res and compare on a sample of rows
    for row in [0, 1, 2, f - 2, f - 1, f, 5 * f + 7, hs * f - 1]:
        blk, cls = row // f, cls_of(row % f)
        np.testing.assert_allclose(
            np.asarray(a_tab[:, blk, cls]),
            a0 * (1 + np.asarray(gamma[:, row])),
            rtol=1e-5,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(b_tab[:, blk, cls]),
            b0 * (1 + np.asarray(gamma[:, row])) + np.asarray(beta[:, row]),
            rtol=1e-5,
            atol=1e-5,
        )
