"""GSPMD data parallelism over a device mesh.

The reference has no multi-device execution (hardcoded single GPU,
train64.py:85; its vendored SyncBatchNorm is never wired in — SURVEY.md
§2.17/§5.8). This module is the TPU-native scaling story:

  * a 1-D `jax.sharding.Mesh(('data',))` over ICI
  * batch arrays sharded on axis 0, parameters/optimizer state replicated
  * the train step jitted with those shardings — XLA inserts all gradient
    psums AND computes BatchNorm statistics over the *global* batch (the
    semantic upgrade of SyncBN), because every batch reduction in the step
    is a global reduction under GSPMD
  * `jax.distributed.initialize` is the documented path to multi-host DCN;
    a single call-site hook is provided (`maybe_init_distributed`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed():
    """Multi-host init over DCN when launched under a multi-process runtime.

    Cluster launchers (SLURM, GKE) are auto-detected by
    `jax.distributed.initialize()`; for manual launches set
    JAX_COORDINATOR_ADDRESS plus JAX_NUM_PROCESSES / JAX_PROCESS_ID (jax
    itself only auto-reads the coordinator address — the process count and
    id must be passed explicitly, which this hook does from the env).
    Exercised by tests/test_multihost.py with a real 2-process CPU cluster.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        num = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            num_processes=int(num) if num is not None else None,
            process_id=int(pid) if pid is not None else None,
        )


def make_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(jax.numpy.asarray(v), sh) for k, v in batch.items()}


def make_sharded_generate(generator, mesh: Mesh, axis: str = "data"):
    """jit `Generator.generate` with params replicated and inputs sharded.

    Data-parallel serving over ICI: each device decodes its batch shard
    (eval-mode generate is per-sample independent — no cross-batch
    reductions — so the sharded output matches single-device exactly).
    The reference serves on one hardcoded GPU (test64.py:76-265); this is
    the scale-out story its README only hints at (README.md:42).
    """
    from aglayout_tpu.models.generator import Generator

    repl = replicated(mesh)
    data = batch_sharding(mesh, axis)

    def fn(variables, objs, boxes, valid, z, attribute):
        return generator.apply(
            variables, objs, boxes, valid, z, attribute, method=Generator.generate
        )

    return jax.jit(
        fn, in_shardings=(repl, data, data, data, data, data), out_shardings=data
    )


def make_sharded_train_step(train_step, mesh: Mesh, axis: str = "data", donate: bool = True):
    """jit the functional train step with state replicated and batch sharded.

    Every per-batch reduction inside (loss means, BN moments) becomes a
    global cross-replica reduction — data-parallel training with exact
    global-batch semantics at any device count.
    """
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis)
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
