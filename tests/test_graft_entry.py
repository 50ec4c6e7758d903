"""The driver-graded multi-chip dry run must pass, run exactly as graded.

Rounds 1 and 2 both shipped a `dryrun_multichip` that failed only in the
driver's environment (platform forcing, then the 40 s CPU collective
rendezvous window at full width). This test runs the REAL entry point in a
fresh subprocess — same file, same function, same single-core constraints —
so a regression can never ship silently again.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_subprocess():
    env = dict(os.environ)
    # The entry point must do its own platform forcing; give it a clean env.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr[-3000:]}"
    assert "OK" in proc.stdout, proc.stdout
