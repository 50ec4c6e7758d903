"""aglayout_tpu — TPU-native attribute-guided image generation from layout.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
ubc-vision/attribute-guided-image-generation-from-layout (BMVC 2020):
given a layout — (object class, bounding box, multi-hot attribute vector)
triples — a VAE-GAN generates 64x64 or 128x128 images with per-object
attribute editing and object re-positioning.

Design stance (TPU-first, not a port):
  * dense padded object representation (B, O_max) + validity masks instead of
    the reference's ragged flattened tensors (static shapes, no host sync)
  * masked `lax.scan` ConvLSTM instead of per-image Python loops
  * MXU-friendly interpolation-matrix ROI crop (einsum) + Pallas kernels
  * one resolution-parameterized model instead of forked 64/128 files
  * functional jitted GAN train step, GSPMD data parallelism over a
    `jax.sharding.Mesh` (cross-replica BatchNorm stats come for free from
    global-batch reductions under GSPMD)
"""

__version__ = "0.1.0"
