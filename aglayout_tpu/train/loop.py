"""Training loop driver: data -> sharded step -> logging -> checkpoints.

The train64.py/train128.py-equivalent 'CLI' layer (one binary, resolution
switched by config). Artifact directories follow the reference's exp_name
convention (train64.py:69-79): {path}/all/{logs,models,samples,results}/{exp}.
"""

from __future__ import annotations

import os
import signal
import time

import jax
import numpy as np

from aglayout_tpu.config import Config
from aglayout_tpu.data.vocab import attribute_pos_weight
from aglayout_tpu.parallel import make_mesh, make_sharded_train_step, replicated, shard_batch
from aglayout_tpu.train.state import Models, create_train_state
from aglayout_tpu.train.step import make_train_step
from aglayout_tpu.utils.checkpoint import restore_state, save_state
from aglayout_tpu.utils.logging import MetricLogger


def prepare_dirs(cfg: Config):
    dirs = {}
    for kind in ("logs", "models", "samples", "results"):
        d = os.path.join(cfg.path, "all", kind, cfg.exp_name)
        os.makedirs(d, exist_ok=True)
        dirs[kind] = d
    return dirs


def load_cooccurrence(cfg: Config):
    """Object<->attribute co-occurrence counts (matrix_obj_vs_att.pt
    equivalent; built by aglayout_tpu.data.cooccurrence)."""
    path = os.path.join(cfg.vg_dir, "matrix_obj_vs_att.npy")
    if os.path.exists(path):
        return np.load(path)
    # A missing matrix changes training semantics (attribute swaps sample
    # uniformly instead of from co-occurrence statistics) — refuse unless
    # explicitly allowed rather than degrade silently.
    if not cfg.allow_uniform_matrix:
        raise FileNotFoundError(
            f"co-occurrence matrix not found at {path}. Build it with "
            "`python -m aglayout_tpu.data.cooccurrence` over the train h5, "
            "or pass --allow_uniform_matrix true to accept uniform "
            "attribute-swap sampling (changes training semantics)."
        )
    import warnings

    warnings.warn(
        f"co-occurrence matrix missing at {path}: attribute swaps will "
        "sample UNIFORMLY (allow_uniform_matrix=true). Not equivalent to "
        "the reference's matrix_obj_vs_att.pt sampling.",
        stacklevel=2,
    )
    return np.ones((cfg.num_classes, cfg.attribute_dim), np.float32)


def train(cfg: Config, loader=None, niter: int | None = None, use_tensorboard: bool = True,
          window_rates: list | None = None):
    """Run training. `loader` defaults to the VG pipeline; pass any iterator
    of dense batches (e.g. a synthetic one) for smoke runs. If
    `window_rates` is a list, per-log-window steps/s are appended to it
    (consumed by tools/vg_scale_rehearsal.py for steady-state reporting)."""
    dirs = prepare_dirs(cfg)

    if loader is None:
        from aglayout_tpu.data.dataset import get_dataloaders

        loader, _, vocab = get_dataloaders(cfg)
        cfg.num_classes = len(vocab["object_idx_to_name"])

    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(cfg.seed))
    state, start = restore_state(dirs["models"], state, cfg.resume)

    matrix = load_cooccurrence(cfg)
    # VG's 106-attribute pos-weight table (train64.py:24-28); non-VG vocab
    # sizes (synthetic smoke configs) fall back to uniform weights
    pos_weight = (
        attribute_pos_weight()
        if cfg.attribute_dim == 106
        else np.ones(cfg.attribute_dim, np.float32)
    )
    step_fn = make_train_step(cfg, models, matrix, pos_weight)

    mesh = make_mesh(cfg.num_devices)
    state = jax.device_put(state, replicated(mesh))
    sharded_step = make_sharded_train_step(step_fn, mesh)

    logger = MetricLogger(dirs["logs"], use_tensorboard)
    niter = niter or cfg.niter
    it = iter(loader)
    t0 = time.time()
    metrics = {}

    # Preemption-signal save (SURVEY.md §5.3): the reference's elasticity
    # model is SLURM 24h-limit + resubmit (reference script.py:20), losing up
    # to save_step=500 steps per preemption. Here SIGTERM/SIGINT set a flag;
    # the loop finishes the in-flight step, saves a final checkpoint, and
    # returns cleanly so `--resume l` continues at the interrupted step.
    preempted = {"sig": None}

    def _on_signal(signum, frame):
        preempted["sig"] = signum

    prev_handlers = {
        s: signal.signal(s, _on_signal) for s in (signal.SIGTERM, signal.SIGINT)
    }

    # Config.device_masks: the step rasterizes layout masks on device from
    # the boxes (exact parity), so the 2.6 MB/batch of masks — 85% of the
    # upload bytes on a ~1 MB/s tunneled transport — never leave the host.
    drop = ("masks", "masks_shift") if getattr(cfg, "device_masks", False) else ()

    def prep(b):
        return shard_batch({k: v for k, v in b.items() if k not in drop}, mesh)

    # one-batch device prefetch: device_put is async, so the next batch's
    # host->device transfer overlaps the current step's compute
    pending = prep(next(it))
    for i in range(start, niter):
        batch = pending
        state, metrics = sharded_step(state, batch)
        if preempted["sig"] is not None:
            save_state(dirs["models"], i + 1, state, cfg.save_num)
            print(
                f"[preempt] signal {preempted['sig']}: saved checkpoint at "
                f"step {i + 1}, exiting",
                flush=True,
            )
            break
        if i + 1 < niter:
            pending = prep(next(it))

        if (i + 1) % cfg.log_step == 0:
            m = {k: float(v) for k, v in metrics.items() if k != "images"}
            m["steps_per_sec"] = cfg.log_step / (time.time() - t0)
            if window_rates is not None:
                window_rates.append(m["steps_per_sec"])
            t0 = time.time()
            logger.log_stdout(i + 1, niter, m)
        if (i + 1) % cfg.tensorboard_step == 0:
            logger.log_scalars(
                i + 1, {k: float(v) for k, v in metrics.items() if k != "images"}
            )
            # real + generated grids, same tags as the reference
            # (train64.py:394-402); the fakes come out of the train step's
            # own G forward, so the grids show exactly what trained. The
            # step deprocesses to uint8 and caps to 8 images ON DEVICE, so
            # only small uint8 grids cross the (slow) device->host link.
            fake = metrics["images"]
            logger.log_images(
                i + 1, {f"Result/{k}": np.asarray(v) for k, v in fake.items()}
            )
        if (i + 1) % cfg.save_step == 0:
            save_state(dirs["models"], i + 1, state, cfg.save_num)

    for s, h in prev_handlers.items():
        signal.signal(s, h)
    logger.close()
    return state, metrics
