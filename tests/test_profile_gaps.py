"""Unit test for tools/profile_ops.py's compute-hole gap analysis.

Builds a tiny synthetic XSpace proto (two compute fusions separated by a
device-idle window, with an async copy-start spanning the whole range) and
checks that `gaps` attributes the hole to the right op pair and excludes
the async DMA event from busy time.
"""

import io
import sys
import contextlib

import pytest

sys.path.insert(0, "tools")

pytestmark = pytest.mark.quick


def _build_space(tmp_path):
    from profile_ops import _xplane_pb2

    pb2 = _xplane_pb2()
    space = pb2.XSpace()
    plane = space.planes.add()
    plane.name = "/device:TPU:0"
    names = {
        1: "%fusion.1 = bf16[8,8]{1,0} fusion(...)",
        2: "%fusion.2 = bf16[8,8]{1,0} fusion(...)",
        3: "%copy-start.9 = (f32[4]{0}) copy-start(...)",
    }
    for mid, name in names.items():
        plane.event_metadata[mid].id = mid
        plane.event_metadata[mid].name = name
    line = plane.lines.add()
    line.name = "XLA Ops"
    # fusion.1: [0, 100us), fusion.2: [150us, 200us) -> 50us compute hole;
    # copy-start spans everything (must not close the hole)
    for mid, off_us, dur_us in ((1, 0, 100), (2, 150, 50), (3, 0, 200)):
        ev = line.events.add()
        ev.metadata_id = mid
        ev.offset_ps = int(off_us * 1e6)
        ev.duration_ps = int(dur_us * 1e6)
    d = tmp_path / "plugins" / "profile" / "run"
    d.mkdir(parents=True)
    (d / "vm.xplane.pb").write_bytes(space.SerializeToString())
    return tmp_path


def test_gap_analysis_finds_compute_hole(tmp_path):
    from profile_ops import gaps

    logdir = _build_space(tmp_path)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        gaps(str(logdir), min_gap_us=5.0)
    out = buf.getvalue()
    assert "busy 0.150 ms" in out, out
    assert "idle 0.050 ms" in out, out
    assert "%fusion.1" in out and "%fusion.2" in out, out
    # the async copy must not be treated as compute
    assert "copy-start" not in out.split("gap between")[1], out
