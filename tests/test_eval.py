"""Golden-value tests for the evaluation metric math."""

import numpy as np
import pytest

from aglayout_tpu.eval.consistency import consistency_l1, random_pair_baseline
from aglayout_tpu.eval.fid import compute_statistics, frechet_distance
from aglayout_tpu.eval.inception_score import inception_score_from_probs

pytestmark = pytest.mark.quick


def test_frechet_distance_identical_is_zero():
    rng = np.random.RandomState(0)
    x = rng.randn(500, 8)
    mu, s = compute_statistics(x)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-6


def test_frechet_distance_mean_shift():
    """For equal covariance, FID == ||mu1 - mu2||^2."""
    rng = np.random.RandomState(1)
    x = rng.randn(100000, 4)
    mu, s = compute_statistics(x)
    shift = np.array([1.0, 0.0, 2.0, 0.0])
    d = frechet_distance(mu, s, mu + shift, s)
    np.testing.assert_allclose(d, np.sum(shift**2), rtol=1e-5)


def test_frechet_distance_analytic_1d():
    """1-D Gaussians: d = (m1-m2)^2 + (s1 - s2)^2 (std devs)."""
    d = frechet_distance(np.array([0.0]), np.array([[4.0]]), np.array([3.0]), np.array([[1.0]]))
    np.testing.assert_allclose(d, 9.0 + (2.0 - 1.0) ** 2, rtol=1e-6)


def test_inception_score_bounds():
    n, c = 300, 10
    uniform = np.full((n, c), 1.0 / c)
    mean, std = inception_score_from_probs(uniform, splits=3)
    np.testing.assert_allclose(mean, 1.0, atol=1e-5)

    onehot = np.eye(c)[np.arange(n) % c] * 0.999 + 0.001 / c
    onehot /= onehot.sum(1, keepdims=True)
    mean, _ = inception_score_from_probs(onehot, splits=3)
    assert mean > c * 0.9  # confident + diverse -> IS near num_classes


def test_consistency_l1_semantics():
    b, o, h, w = 2, 1, 8, 8
    img1 = np.zeros((b, h, w, 3), np.float32)
    img2 = np.zeros((b, h, w, 3), np.float32)
    masks = np.zeros((b, o, h, w, 1), np.float32)
    masks[:, 0, :4] = 1  # top half = foreground
    masks_shift = masks.copy()
    valid = np.ones((b, o), np.float32)
    img2[:, :4] += 1.0  # change only the foreground
    out = consistency_l1(img1, img2, masks, masks_shift, valid)
    assert out["background_l1"] == 0.0
    np.testing.assert_allclose(out["foreground_l1"], 1.0)


def test_random_pair_baseline_positive():
    rng = np.random.RandomState(0)
    imgs = rng.randn(6, 8, 8, 3).astype(np.float32)
    assert random_pair_baseline(imgs) > 0


def test_consistency_cli_on_pickles(tmp_path):
    """The standalone consistency driver over generation pickles."""
    import json
    import pickle
    import subprocess
    import sys

    rng = np.random.RandomState(0)
    b, o, h = 2, 3, 16
    rec = {
        "imgs_rand": rng.randn(b, h, h, 3).astype(np.float32),
        "imgs_shift": rng.randn(b, h, h, 3).astype(np.float32),
        "boxes": np.tile(np.array([0.1, 0.1, 0.5, 0.5], np.float32), (b, o, 1)),
        "boxes_shift": np.tile(np.array([0.4, 0.1, 0.8, 0.5], np.float32), (b, o, 1)),
        "valid": np.ones((b, o), np.float32),
    }
    with open(tmp_path / "batch_00000.pkl", "wb") as f:
        pickle.dump(rec, f)
    out = subprocess.run(
        [sys.executable, "-m", "aglayout_tpu.eval.consistency", str(tmp_path)],
        capture_output=True, text=True, timeout=300,
        env={"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": "/root/repo"},
    )
    assert out.returncode == 0, out.stderr
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert set(stats) == {"background_l1", "foreground_l1", "random_pair_l1"}
    assert all(np.isfinite(v) and v >= 0 for v in stats.values())
