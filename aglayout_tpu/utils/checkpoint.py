"""Checkpointing: Orbax-backed save/restore of the full train state.

Capability parity with the reference's utils/model_saver_iter.py
(load_model/save_model with keep-2 rotation and 'l'/'s'/explicit resume
modes), upgraded per SURVEY.md §5.4: one checkpoint holds ALL four nets'
params + BN/SN stats + optimizer moments + RNG key + step, fixing the
reference's silent Adam reset on resume.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _manager(model_dir: str, save_num: int = 2):
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(max_to_keep=save_num, create=True)
    return ocp.CheckpointManager(os.path.abspath(model_dir), options=options)


def save_state(model_dir: str, step: int, state: Any, save_num: int = 2):
    import orbax.checkpoint as ocp

    mgr = _manager(model_dir, save_num)
    mgr.save(step, args=ocp.args.StandardSave(jax.tree.map(np.asarray, state)))
    mgr.wait_until_finished()
    mgr.close()


def restore_state(model_dir: str, state_template: Any, resume: str = "l"):
    """resume: 'l' latest / 's' scratch / explicit step string.

    Returns (state, start_step). Mirrors the reference's resume contract
    (utils/model_saver_iter.py:6-65)."""
    if resume == "s":
        return state_template, 0
    import orbax.checkpoint as ocp

    if not os.path.isdir(model_dir):
        return state_template, 0
    mgr = _manager(model_dir)
    step = mgr.latest_step() if resume == "l" else int(resume)
    if step is None:
        mgr.close()
        return state_template, 0
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(jax.tree.map(np.asarray, state_template))
    )
    mgr.close()
    state = jax.tree.map(lambda t, r: jax.numpy.asarray(r), state_template, restored)
    return state, step
