"""Pin the serving-kernel default policy.

Round 4 shipped phase_dc default-on in its final hour without a TPU
measurement; a same-chip A/B then showed a 19% serving regression
(artifacts/phase_dc_ab_r5.json: 2,539 on vs 3,139/3,150 off). The rule
adopted in round 5: no default-on serving change without a recorded
same-session TPU A/B. This test pins the resolved defaults so a silent
flip can never ship again — changing a default requires editing this test
alongside the committed measurement that justifies it.
"""

import jax
import pytest

from aglayout_tpu.config import Config
from aglayout_tpu.train.state import Models

pytestmark = pytest.mark.quick


def _tiny(**kw):
    return Config(
        batch_size=2, max_objects=2, image_size=128, object_size=64,
        num_classes=7, clstm_layers=1, resi_num=1, conv_dim=8, d_conv_dim=8,
        **kw,
    )


def test_phase_dc_defaults_off_everywhere():
    # None must resolve to OFF on every backend (A/B-measured regression)
    models = Models(_tiny())
    assert models.generator.phase_dc is False
    # and explicit opt-in still works
    assert Models(_tiny(phase_dc=True)).generator.phase_dc is True


def test_tpu_auto_kernels_follow_backend():
    # the verified-positive kernels stay auto: on iff the backend is TPU
    models = Models(_tiny())
    on_tpu = jax.default_backend() == "tpu"
    for flag in ("pallas_heads", "pallas_apply8", "pallas_compact_heads",
                 "pallas_grouped_heads", "pallas_trunk"):
        assert getattr(models.generator, flag) is on_tpu, flag
    # int8 serving is approximate and must never default on
    assert Models(_tiny()).generator.int8_serving is False
