"""tools/import_reference_artifacts.py against the actual reference files."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "data", "vocab.json")),
    reason="reference checkout not present",
)
def test_import_reference_artifacts(tmp_path):
    out = str(tmp_path / "vg")
    subprocess.check_call(
        [
            sys.executable,
            os.path.join(REPO, "tools", "import_reference_artifacts.py"),
            "--vocab", os.path.join(REF, "data", "vocab.json"),
            "--matrix", os.path.join(REF, "matrix_obj_vs_att.pt"),
            "--out", out,
        ]
    )
    with open(os.path.join(out, "vocab.json")) as f:
        vocab = json.load(f)
    assert len(vocab["object_idx_to_name"]) == 179
    assert len(vocab["attribute_idx_to_name"]) == 106
    assert len(vocab["pred_idx_to_name"]) == 46
    m = np.load(os.path.join(out, "matrix_obj_vs_att.npy"))
    assert m.shape == (179, 106) and m.sum() > 0
    # the imported matrix satisfies train/loop.load_cooccurrence
    from aglayout_tpu.config import Config
    from aglayout_tpu.train.loop import load_cooccurrence

    cfg = Config(vg_dir=out)
    got = load_cooccurrence(cfg)
    np.testing.assert_array_equal(got, m)
