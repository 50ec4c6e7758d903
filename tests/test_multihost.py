"""Exercise the jax.distributed multi-host path (SURVEY.md §5.8).

`parallel/mesh.py::maybe_init_distributed` documents multi-host DCN scaling;
until now no test spawned a real multi-process cluster. This launches TWO
processes on this host (CPU backend, one device each), initializes
`jax.distributed` against a local coordinator, builds the 2-device global
mesh, and runs one data-parallel train step — gradient psums and
global-batch BN reductions cross a real process boundary.

The reference has no multi-device story at all (train64.py:85 hardcodes one
GPU); this is upgrade-completeness, not parity.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

CHILD = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

port = sys.argv[1]
pid = int(sys.argv[2])
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(pid)

from aglayout_tpu.parallel import make_mesh, make_sharded_train_step, replicated, batch_sharding
from aglayout_tpu.parallel.mesh import maybe_init_distributed

maybe_init_distributed()  # the hook under test (parallel/mesh.py)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.devices()

from aglayout_tpu.config import Config
from aglayout_tpu.data.synthetic import synthetic_batch, synthetic_cooccurrence
from aglayout_tpu.train.state import Models, create_train_state_fast
from aglayout_tpu.train.step import make_train_step

cfg = Config(
    batch_size=2, max_objects=2, image_size=64, object_size=32,
    num_classes=8, attribute_dim=16, embedding_dim=8, z_dim=8,
    clstm_layers=1, resi_num=1, conv_dim=8, d_conv_dim=8,
)
models = Models(cfg)
# deterministic on both processes -> identical replicated state
state = create_train_state_fast(cfg, models, seed=0)

rng = np.random.RandomState(0)
matrix = synthetic_cooccurrence(rng, cfg.num_classes, cfg.attribute_dim)
step = make_train_step(cfg, models, matrix, np.ones(cfg.attribute_dim, np.float32))

mesh = make_mesh()  # all 2 global devices
repl = replicated(mesh)
data = batch_sharding(mesh)

def globalize(tree, sharding):
    # every process holds the same full value (deterministic construction),
    # so each addressable shard is a slice of it
    return jax.tree.map(
        lambda x: jax.make_array_from_callback(
            np.shape(x), sharding, lambda idx, x=np.asarray(x): x[idx]
        ),
        tree,
    )

state = globalize(state, repl)
batch = globalize(
    synthetic_batch(rng, cfg.batch_size, cfg.max_objects, cfg.image_size,
                    cfg.num_classes, attribute_dim=cfg.attribute_dim),
    data,
)

sharded_step = make_sharded_train_step(step, mesh, donate=False)
new_state, metrics = sharded_step(state, batch)
g = float(np.asarray(jax.device_get(metrics["G/loss"])))
d = float(np.asarray(jax.device_get(metrics["D/loss"])))
assert np.isfinite(g) and np.isfinite(d), (g, d)
print(f"MULTIHOST_OK pid={pid} G/loss={g:.4f} D/loss={d:.4f}", flush=True)
jax.distributed.shutdown()
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    port = _free_port()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    cache = os.path.join(repo, ".jax_cache")
    env["JAX_COMPILATION_CACHE_DIR"] = cache
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} rc={p.returncode}\n{out[-4000:]}"
        assert f"MULTIHOST_OK pid={pid}" in out, out[-4000:]

    # both replicas computed the same global-batch losses
    l0 = [ln for ln in outs[0].splitlines() if "MULTIHOST_OK" in ln][0].split("pid=0 ")[1]
    l1 = [ln for ln in outs[1].splitlines() if "MULTIHOST_OK" in ln][0].split("pid=1 ")[1]
    assert l0 == l1, (l0, l1)
