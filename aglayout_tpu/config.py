"""One dataclass config shared by train/test at both resolutions.

Replaces the reference's per-script argparse forks (train64.py:419-467,
train128.py, test64.py, test128.py): resolution is a parameter, not a file
fork, and the exp-name convention for artifact addressing is preserved.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass
class Config:
    # data
    dataset: str = "vg"
    vg_dir: str = "data/vg"
    image_dir: str = ""  # defaults to <vg_dir>/images
    batch_size: int = 8
    max_objects: int = 10  # O_max: dense object slots per image (incl. mask)
    attribute_dim: int = 106
    num_classes: int = 179  # overridden from vocab at load time

    # model
    image_size: int = 64
    object_size: int = 32
    embedding_dim: int = 64
    z_dim: int = 64
    clstm_layers: int = 3
    resi_num: int = 6
    # width knobs (defaults reproduce the reference exactly; every other
    # width in the model is a fixed multiple of these — see
    # models/generator.py). Small values give a semantically identical
    # model for cheap multi-device dry runs on CPU meshes.
    conv_dim: int = 64  # generator base width
    d_conv_dim: int = 64  # discriminator base width

    # optimization (train64.py:427-446 defaults)
    niter: int = 900_000
    learning_rate: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    lambda_img_adv: float = 1.0
    lambda_obj_adv: float = 1.0
    lambda_obj_cls: float = 1.0
    lambda_z_rec: float = 8.0
    lambda_img_rec: float = 1.0
    lambda_kl: float = 0.01
    lambda_att_cls: float = 2.0

    # runtime
    seed: int = 0
    data_axis: str = "data"
    num_devices: int = 0  # 0 = all visible
    bf16: bool = False  # bf16 compute (f32 params/BN accumulators)
    # Pallas fused decoder RGB heads on the eval path; None = auto (TPU only)
    pallas_heads: bool | None = None
    # Pallas SPADE-4 apply kernel (spade_apply8) on the 128^2 eval path;
    # None = auto (TPU only). TPU-verified exact (tools/verify_serving_tpu.py
    # end-to-end delta 1e-5) and measured +3.8 ms/batch at 128^2 b=128.
    pallas_apply8: bool | None = None
    # compact class-resolution RGB-head tables (in-kernel W expansion) for
    # C%128==0 heads; None = auto (TPU only). TPU-verified exact; measured
    # +1.4 ms/batch (kills the XLA-side W-expanded table assembly).
    pallas_compact_heads: bool | None = None
    # 8-image-sublane RGB head (spade_few_out_conv8): consumes the
    # conv-native (H,W,B,C) layout via halo DMA (no input relayout) with
    # fully compact class tables; None = auto (TPU only). TPU-verified
    # exact (tools/verify_serving_tpu.py --variants grouped: end-to-end
    # delta 0 vs the flat-head path) and measured 2,826 -> 2,868 img/s at
    # 128^2 b=128; engages only where B%8==0 and C%128==0 (the c7 head).
    pallas_grouped_heads: bool | None = None
    # fused 8x8 residual-trunk kernel on the eval path (the layout
    # encoder's 6 post-ConvLSTM resblocks in one Pallas program; at serving
    # shapes the 12-conv XLA graph is per-op-latency tail). None = auto
    # (TPU only). Exact-parity: skip chain f32, convs bf16, as dense.
    pallas_trunk: bool | None = None
    # phase-decomposed eval dc1..dc3 (ops/phase_deconv.py): the lhs-dilated
    # ConvTranspose lowering reads 4x structural zeros at 8^2..32^2 spatial;
    # the parity split is one MXU-shaped k=2 conv + layout interleave (exact
    # for dc1..dc3; the folded-upsample c5 path is exact only up to bf16
    # rounding of its f32 pair-summed taps). None = OFF: a round-4 TPU A/B
    # measured the auto-on default a 19% serving REGRESSION at 128^2 b=128
    # (2,550 vs 3,162 img/s — the parity-interleave relayouts dominate);
    # kept as an opt-in knob for other shapes. Never affects training.
    phase_dc: bool | None = None
    # eval-mode lax.scan unroll factor for the object-axis ConvLSTM (exact
    # math). None = 1. Measured on TPU v5e at the 128^2 serving shapes:
    # full unroll is a slight LOSS (2,837 vs 2,857 img/s) — the while-loop
    # bookkeeping is negligible and the scan is peak-bound; kept as a knob
    # for other shapes.
    clstm_unroll: int | None = None
    # opt-in APPROXIMATE int8 serving: the wide ConvLSTM gate convs run
    # through a Pallas int8 kernel (ops/pallas_conv8_int8.py; sub-1%
    # pre-activation error damped by the saturating gate nonlinearities).
    # Never affects training; default off = exact serving.
    int8_serving: bool = False
    # accept uniform attribute-swap sampling when matrix_obj_vs_att.npy is
    # missing (otherwise training refuses to start; see train/loop.py)
    allow_uniform_matrix: bool = False
    # libjpeg DCT-domain scaled decode in the native input path (up to 16x
    # less decode CPU per image; composed-resample error vs the full-res
    # PIL-parity path: mean <1/255, hard-edge ringing up to ~30/255 —
    # tests/test_native.py). Off = bit-parity decode path.
    fast_decode: bool = True
    # rasterize layout masks ON DEVICE inside the train step (from the
    # uploaded boxes; exact round-half-even parity with the loader's
    # rasterizer). Cuts the per-step host->device upload from ~3 MB to
    # ~0.4 MB (the tunneled transport uploads at ~1 MB/s) and skips the
    # host-side rasterization entirely. Off = masks built and uploaded by
    # the loader (the reference's host-side model, vg_custom_mask.py:136).
    device_masks: bool = True
    # rematerialize the generator forward in the G phase (larger batches)
    remat: bool = False
    # run the generator forward TWICE per step like the reference driver
    # (train64.py:191,280 — the torch code needs a second forward because
    # the D phase detached the first). Default False: one forward + vjp
    # pullback. The only semantic deltas (documented in train/step.py) are
    # that the VAE reparameterization eps is shared between phases instead
    # of redrawn, and BN running stats update once per step instead of
    # twice — training-mode math uses batch stats, so the dynamics are
    # statistically identical; ~15% faster steps.
    double_g_forward: bool = False

    # logging / checkpointing (train64.py:449-454)
    resume: str = "l"  # 'l' latest / 's' scratch / explicit step
    log_step: int = 10
    tensorboard_step: int = 100
    save_step: int = 500
    save_num: int = 2
    path: str = "checkpoints"

    @property
    def exp_name(self) -> str:
        # mirrors the reference exp_name hyperparameter string (train64.py:457-467)
        return (
            f"est_change_att_{self.dataset}_bs{self.batch_size}e{self.embedding_dim}"
            f"z{self.z_dim}clstm{self.clstm_layers}li{self.lambda_img_adv}"
            f"lo{self.lambda_obj_adv}lc{self.lambda_obj_cls}lz{self.lambda_z_rec}"
            f"lc{self.lambda_img_rec}lk{self.lambda_kl}"
        )

    @property
    def clstm_dims(self) -> Tuple[int, ...]:
        cd = self.conv_dim
        return {0: (), 1: (cd,), 2: (cd, cd), 3: (2 * cd, cd, cd)}[self.clstm_layers]


def config_for(image_size: int = 64, **kw) -> Config:
    """train64/train128-equivalent presets: 128 uses 64^2 object crops and
    the extra-block attribute discriminator."""
    base = dict(image_size=image_size, object_size=32 if image_size == 64 else 64)
    base.update(kw)
    return Config(**base)
