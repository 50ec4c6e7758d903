"""Preemption-signal checkpoint save (SURVEY.md §5.3).

The reference's elasticity model is SLURM resubmit (reference script.py:20):
a preempted run loses up to save_step=500 steps. Our loop installs a
SIGTERM/SIGINT handler that saves a final checkpoint after the in-flight
step. This test sends SIGTERM to a real training subprocess mid-run and
asserts (a) a checkpoint landed at the interrupted step (not a save_step
multiple), and (b) `--resume l` continues from exactly that step.
"""

import os
import re
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow

CHILD = """
import numpy as np
from aglayout_tpu.config import Config
from aglayout_tpu.data.synthetic import synthetic_batch
from aglayout_tpu.train.loop import train

cfg = Config(**{cfg_kw})
rng = np.random.RandomState(0)

def loader():
    while True:
        yield synthetic_batch(
            rng, cfg.batch_size, cfg.max_objects, cfg.image_size,
            cfg.num_classes, attribute_dim=cfg.attribute_dim,
        )

train(cfg, loader=loader(), niter=100000, use_tensorboard=False)
print("CHILD_EXITED_CLEANLY", flush=True)
"""


def _cfg_kw(tmp_path):
    return dict(
        batch_size=3,
        max_objects=2,
        image_size=64,
        object_size=32,
        num_classes=6,
        attribute_dim=8,
        embedding_dim=8,
        z_dim=8,
        clstm_layers=1,
        resi_num=1,
        conv_dim=8,
        d_conv_dim=8,
        allow_uniform_matrix=True,
        num_devices=1,
        log_step=1,
        save_step=10_000,  # periodic saves never fire in this test
        path=str(tmp_path),
        pallas_heads=False,
    )


def test_sigterm_saves_checkpoint_and_resume_continues(tmp_path):
    cfg_kw = _cfg_kw(tmp_path)
    script = tmp_path / "child.py"
    script.write_text(CHILD.format(cfg_kw=repr(cfg_kw)))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # share the suite's persistent compile cache so the child's compile is warm
    cache = os.path.join(repo, ".jax_cache")
    env["JAX_COMPILATION_CACHE_DIR"] = cache
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"

    proc = subprocess.Popen(
        [sys.executable, str(script)],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
    )
    lines = []
    try:
        # wait until a few steps have executed (loop + handler live)
        deadline = time.time() + 600
        steps_seen = 0
        for line in proc.stdout:
            lines.append(line)
            if line.startswith("iter ["):
                steps_seen += 1
                if steps_seen >= 3:
                    break
            assert time.time() < deadline, "".join(lines[-30:])
        assert steps_seen >= 3, "".join(lines[-30:])

        proc.send_signal(signal.SIGTERM)
        rest, _ = proc.communicate(timeout=300)
        lines.append(rest)
    finally:
        if proc.poll() is None:
            proc.kill()
    out = "".join(lines)

    m = re.search(r"\[preempt\] signal 15: saved checkpoint at step (\d+)", out)
    assert m, out[-3000:]
    saved_step = int(m.group(1))
    assert saved_step >= 3
    assert saved_step % cfg_kw["save_step"] != 0  # not a periodic save
    assert "CHILD_EXITED_CLEANLY" in out  # clean return, not a crash
    assert proc.returncode == 0, proc.returncode

    # resume: the checkpoint restores at the interrupted step and one more
    # train step advances it to saved_step + 1
    from aglayout_tpu.config import Config
    from aglayout_tpu.data.synthetic import synthetic_batch
    from aglayout_tpu.train.loop import prepare_dirs, train

    cfg = Config(**cfg_kw)
    model_dir = prepare_dirs(cfg)["models"]
    assert os.listdir(model_dir), model_dir

    rng = np.random.RandomState(1)

    def loader():
        while True:
            yield synthetic_batch(
                rng, cfg.batch_size, cfg.max_objects, cfg.image_size,
                cfg.num_classes, attribute_dim=cfg.attribute_dim,
            )

    state, _ = train(cfg, loader=loader(), niter=saved_step + 1, use_tensorboard=False)
    assert int(state.step) == saved_step + 1
