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


# ---------------------------------------------------------------------------
# Real LPIPS v0.1 (AlexNet backbone + trained linear heads)
# ---------------------------------------------------------------------------

# torchvision AlexNet `features` conv stack; LPIPS taps the 5 relu outputs
_ALEX_SPECS = [
    (64, 11, 4, 2),  # features.0
    (192, 5, 1, 2),  # features.3
    (384, 3, 1, 1),  # features.6
    (256, 3, 1, 1),  # features.8
    (256, 3, 1, 1),  # features.10
]
_ALEX_KEYS = ["features.0", "features.3", "features.6", "features.8", "features.10"]
# LPIPS input normalization (richzhang ScalingLayer)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def load_alexnet_lpips(alexnet_pth: str, lpips_pth: str):
    """(torchvision alexnet state_dict, richzhang lpips alex.pth) -> params.

    Returns (convs, lins): convs = [(kernel HWIO, bias)] x5,
    lins = [per-channel weight (C,)] x5.
    """
    import torch

    asd = torch.load(alexnet_pth, map_location="cpu", weights_only=True)
    convs = []
    for key in _ALEX_KEYS:
        w = asd[f"{key}.weight"].numpy().transpose(2, 3, 1, 0)
        b = asd[f"{key}.bias"].numpy()
        convs.append((jnp.asarray(w), jnp.asarray(b)))

    lsd = torch.load(lpips_pth, map_location="cpu", weights_only=True)
    lins = []
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lsd:
                lins.append(jnp.asarray(lsd[key].numpy().reshape(-1)))
                break
        else:
            raise ValueError(f"lin{i} weight not found in {lpips_pth}")
    return convs, lins


def _alex_features(x, convs):
    """x: (N, H, W, 3) in [-1, 1], LPIPS-normalized inside. Returns the 5
    relu feature maps (torchvision AlexNet with maxpools after stages 1, 2)."""
    h = (x - _SHIFT) / _SCALE
    feats = []
    for i, ((w, b), (cout, k, s, p)) in enumerate(zip(convs, _ALEX_SPECS)):
        h = jax.lax.conv_general_dilated(
            h, w, (s, s), [(p, p), (p, p)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        h = jax.nn.relu(h)
        feats.append(h)
        if i < 2:  # maxpool(3, 2) after relu1 and relu2
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0), (0, 0), (0, 0), (0, 0)],
            )
    return feats


def lpips_alex(x, y, convs, lins):
    """True LPIPS v0.1: unit-normalize, squared diff, trained per-channel
    linear weight, spatial average, sum over the 5 layers. (N,) distances."""
    fx = _alex_features(x, convs)
    fy = _alex_features(y, convs)
    total = 0.0
    for a, b, w in zip(fx, fy, lins):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        total = total + jnp.mean(jnp.sum((a - b) ** 2 * w, axis=-1), axis=(1, 2))
    return total


def compute_dists_dirs(
    dir1: str,
    dir2: str,
    image_size: int = 64,
    seed: int = 0,
    alexnet_weights: str | None = None,
    lpips_weights: str | None = None,
):
    """Pairwise distance between same-named images in two directories
    (reference compute_dists_dirs.py protocol). With both weights files the
    distance is true LPIPS v0.1; otherwise the random-pyramid stand-in."""
    from PIL import Image

    files1 = sorted(glob.glob(os.path.join(dir1, "*.png")))
    if bool(alexnet_weights) != bool(lpips_weights):
        raise ValueError(
            "real LPIPS needs BOTH --alexnet_weights and --lpips_weights; "
            "got only one — refusing to silently fall back to the "
            "random-pyramid stand-in"
        )
    real = alexnet_weights and lpips_weights
    if real:
        convs, lins = load_alexnet_lpips(alexnet_weights, lpips_weights)
        dist_fn = jax.jit(lambda a, b: lpips_alex(a, b, convs, lins))
    else:
        params = _random_pyramid_params(seed)
        dist_fn = jax.jit(lambda a, b: perceptual_distance(a, b, params))
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
        d = dist_fn(jnp.asarray(ims[0])[None], jnp.asarray(ims[1])[None])
        dists.append(float(d[0]))
    return float(np.mean(dists)), float(np.std(dists)), len(dists)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dir1")
    p.add_argument("dir2")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--alexnet_weights", default=None, help="torchvision alexnet .pth")
    p.add_argument("--lpips_weights", default=None, help="richzhang lpips alex.pth (linear heads)")
    args = p.parse_args()
    mean, std, n = compute_dists_dirs(
        args.dir1, args.dir2, args.image_size,
        alexnet_weights=args.alexnet_weights, lpips_weights=args.lpips_weights,
    )
    real = args.alexnet_weights and args.lpips_weights
    print(
        json.dumps(
            {
                "mean_dist": mean,
                "std_dist": std,
                "pairs": n,
                "backbone": "lpips-v0.1-alexnet"
                if real
                else "random-pyramid (not comparable to published LPIPS)",
            }
        )
    )


if __name__ == "__main__":
    main()
