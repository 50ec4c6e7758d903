"""End-to-end CPU coverage of the decoder's Pallas serving wiring.

The kernels (ops/pallas_spade_conv.py) have interpret-mode parity tests,
but the DECODER wiring around them — folded-table construction, dtype
casts, the (1,2,0,3) transposes, and the gating conditions — previously
ran only on real TPU via bench.py. This test drives the whole 128^2
decoder eval path with pallas_heads + pallas_apply8 ON (kernels forced to
interpret mode) against the dense composition, so a wiring bug can never
ship behind the flags.

Slow (interpret-mode Pallas on a 1-core host) — not in the quick tier.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aglayout_tpu.models.generator import Decoder
from aglayout_tpu.ops import pallas_spade_conv as psc


@pytest.fixture()
def interpret_kernels(monkeypatch):
    # the decoder imports these names from the module at call time, so
    # patching the module attributes reroutes it through interpret mode
    monkeypatch.setattr(
        psc,
        "spade_few_out_conv",
        functools.partial(psc.spade_few_out_conv, interpret=True),
    )
    monkeypatch.setattr(
        psc, "spade_apply8", functools.partial(psc.spade_apply8, interpret=True)
    )
    monkeypatch.setattr(
        psc,
        "spade_few_out_conv8",
        functools.partial(psc.spade_few_out_conv8, interpret=True),
    )


def test_decoder_128_pallas_wiring_matches_dense(interpret_kernels):
    rng = np.random.RandomState(0)
    b = 8  # minimum for the apply8 8-image sublane grouping
    hidden = jnp.asarray(rng.randn(b, 8, 8, 64).astype(np.float32))
    global_h = jnp.asarray(rng.randn(b, 128).astype(np.float32))

    dec_pallas = Decoder(
        image_size=128,
        pallas_heads=True,
        pallas_apply8=True,
        pallas_compact_heads=True,
    )
    dec_grouped = Decoder(
        image_size=128, pallas_heads=True, pallas_grouped_heads=True
    )
    dec_dense = Decoder(image_size=128, pallas_heads=False)
    variables = dec_pallas.init(jax.random.PRNGKey(0), hidden, global_h, False)
    # perturb BN stats so the folded tables are non-trivial
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 * jnp.asarray(rng.rand(*v.shape), v.dtype)
        if v.ndim
        else v,
        variables,
    )

    want = dec_dense.apply(variables, hidden, global_h, False)
    got = dec_pallas.apply(variables, hidden, global_h, False)
    assert got.shape == want.shape == (b, 128, 128, 3)
    # f32 end-to-end; kn2row reassociation in the heads gives tiny deltas
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=5e-3)

    got_g = dec_grouped.apply(variables, hidden, global_h, False)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want), rtol=1e-3, atol=5e-3)
