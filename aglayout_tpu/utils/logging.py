"""Metrics logging: stdout lines + TensorBoard scalars/images.

Capability parity with the reference's logging (train64.py:384-402): the
same metric names printed every log_step, TensorBoard scalars + deprocessed
image grids every tensorboard_step. TensorBoard writing is gated on the
`tensorboard` package being importable (it ships with the baked-in torch).
"""

from __future__ import annotations

import numpy as np


class MetricLogger:
    def __init__(self, log_dir: str | None, use_tensorboard: bool = True):
        self.writer = None
        if use_tensorboard and log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(log_dir)
            except Exception:
                self.writer = None

    def log_stdout(self, step: int, niter: int, metrics: dict):
        line = f"iter [{step:06d}/{niter:06d}]"
        for tag, value in metrics.items():
            line += f", {tag}: {float(value):.4f}"
        print(line, flush=True)

    def log_scalars(self, step: int, metrics: dict):
        if self.writer is None:
            return
        for tag, value in metrics.items():
            self.writer.add_scalar(tag, float(value), step)

    def log_images(self, step: int, images: dict):
        """images: name -> uint8 NHWC array (already deprocessed)."""
        if self.writer is None:
            return
        for tag, arr in images.items():
            arr = np.asarray(arr)
            self.writer.add_images(tag, arr, step, dataformats="NHWC")

    def close(self):
        if self.writer is not None:
            self.writer.close()
