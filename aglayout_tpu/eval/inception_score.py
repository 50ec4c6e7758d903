"""Inception Score with splits.

Capability parity with the reference's evaluation/compute_inception_score.py
(get_inception_score :111-148): IS = exp(E_x KL(p(y|x) || p(y))) computed
over `splits` equal chunks (default 3, reference :35), reported mean/std.

The classifier producing p(y|x) is pluggable (the reference uses the TF1
Inception graph, unavailable offline). `classifier_probs_from_state` uses
our trained ObjectDiscriminator's 179-way head on whole images as an
offline-safe stand-in (documented deviation; not comparable to published
Inception-Score numbers).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def inception_score_from_probs(probs: np.ndarray, splits: int = 3):
    """probs: (N, num_classes) softmax outputs."""
    scores = []
    n = probs.shape[0]
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(np.maximum(part, 1e-12)) - np.log(np.maximum(py, 1e-12)))
        scores.append(float(np.exp(kl.sum(axis=1).mean())))
    return float(np.mean(scores)), float(np.std(scores))


def inception_score_from_dir(
    image_dir: str, weights: str, image_size: int = 299, splits: int = 3
):
    """Published-comparable IS: softmax of the flax InceptionV3 logits
    (eval/inception.py) over a directory of images; needs a torch .pth
    weights file (reference protocol: compute_inception_score.py:111-148).

    Images are loaded at 299^2 directly: `preprocess` performs the single
    protocol (bilinear-to-299) resize, so any other `image_size` would add
    a second resample the pytorch-fid/IS protocol does not have."""
    from aglayout_tpu.eval.fid import load_images
    from aglayout_tpu.eval.inception import InceptionExtractor

    if image_size != 299:
        raise ValueError(
            f"image_size={image_size}: the IS protocol resizes to 299 exactly "
            "once; loading at another size would double-resample"
        )
    ext = InceptionExtractor(weights)
    imgs = load_images(image_dir, image_size)
    logits = ext.logits(imgs)
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    return inception_score_from_probs(probs, splits)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("probs_npy", help=".npy of (N, C) class probabilities, OR an image directory when --weights is given")
    p.add_argument("--splits", type=int, default=3)
    p.add_argument("--weights", default=None, help="InceptionV3 torch .pth -> published-comparable IS over an image dir")
    p.add_argument("--image_size", type=int, default=299)
    args = p.parse_args()
    if args.weights:
        mean, std = inception_score_from_dir(
            args.probs_npy, args.weights, args.image_size, args.splits
        )
    else:
        mean, std = inception_score_from_probs(np.load(args.probs_npy), args.splits)
    print(json.dumps({"inception_score_mean": mean, "inception_score_std": std}))


if __name__ == "__main__":
    main()
