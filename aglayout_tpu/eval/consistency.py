"""Position-consistency evaluation.

Capability parity with the reference's evaluation/consistency.py (:155-211):
for each sample, L1 distance between img_rand and img_shift over

  * background: pixels outside the union of the original and shifted
    object masks (should be identical — the background must not change when
    an object is moved), and
  * foreground: pixels inside the union,

plus a random-pair baseline (L1 between img_rand of different samples) to
calibrate the scale. Lower background L1 = better consistency.
"""

from __future__ import annotations

import numpy as np


def consistency_l1(img_rand, img_shift, masks, masks_shift, valid):
    """img_*: (B, H, W, 3); masks: (B, O, H, W, 1); valid: (B, O).

    Returns dict of per-batch mean background/foreground L1.
    """
    img_rand = np.asarray(img_rand, np.float32)
    img_shift = np.asarray(img_shift, np.float32)
    v = np.asarray(valid)[:, :, None, None, None]
    union = ((np.asarray(masks) * v + np.asarray(masks_shift) * v).sum(1) > 0).astype(np.float32)
    diff = np.abs(img_rand - img_shift).mean(-1, keepdims=True)  # (B,H,W,1)
    bg = (diff * (1 - union)).sum((1, 2, 3)) / np.maximum((1 - union).sum((1, 2, 3)), 1)
    fg = (diff * union).sum((1, 2, 3)) / np.maximum(union.sum((1, 2, 3)), 1)
    return {
        "background_l1": float(bg.mean()),
        "foreground_l1": float(fg.mean()),
    }


def random_pair_baseline(imgs, rng: np.random.RandomState | None = None):
    """Mean L1 between randomly paired different images (reference baseline)."""
    rng = rng or np.random.RandomState(0)
    imgs = np.asarray(imgs, np.float32)
    perm = rng.permutation(len(imgs))
    # ensure derangement-ish pairing
    perm = np.where(perm == np.arange(len(imgs)), (perm + 1) % len(imgs), perm)
    return float(np.abs(imgs - imgs[perm]).mean())


def evaluate_consistency(cfg, models, state, loader, max_batches: int = 50, seed: int = 0):
    """Drive the generator over a loader and accumulate consistency stats."""
    import jax
    import jax.numpy as jnp

    g_vars = {"params": state.g.params, "batch_stats": state.g.stats}

    @jax.jit
    def forward(batch, z, rng):
        return models.generator.apply(
            g_vars,
            batch["imgs"],
            batch["objs"],
            batch["boxes"],
            batch["masks"],
            batch["valid"],
            z,
            batch["attribute"],
            batch["masks_shift"],
            batch["boxes_shift"],
            batch["attribute"],
            train=False,
            rngs={"reparam": rng},
        )

    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.RandomState(seed)
    agg = {"background_l1": [], "foreground_l1": [], "random_pair_l1": []}
    for bi, batch_np in enumerate(loader):
        if bi >= max_batches:
            break
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        b, o = batch["objs"].shape
        rng, kz, kr = jax.random.split(rng, 3)
        z = jax.random.normal(kz, (b, o, cfg.z_dim))
        out = forward(batch, z, kr)
        stats = consistency_l1(
            out["img_rand"], out["img_shift"], batch_np["masks"], batch_np["masks_shift"],
            batch_np["valid"],
        )
        agg["background_l1"].append(stats["background_l1"])
        agg["foreground_l1"].append(stats["foreground_l1"])
        agg["random_pair_l1"].append(random_pair_baseline(np.asarray(out["img_rand"]), np_rng))
    return {k: float(np.mean(v)) for k, v in agg.items()}


def main():
    """Standalone driver over generation pickles (reference
    evaluation/consistency.py ran as its own script): masks are
    re-rasterized from the pickled boxes/boxes_shift."""
    import argparse
    import glob
    import json
    import os
    import pickle

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("pickle_dir", help="directory of batch_*.pkl from eval.gen_pickle")
    p.add_argument("--max_batches", type=int, default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from aglayout_tpu.ops.rasterize import rasterize_boxes

    files = sorted(glob.glob(os.path.join(args.pickle_dir, "batch_*.pkl")))
    if args.max_batches:
        files = files[: args.max_batches]
    if not files:
        raise SystemExit(f"no batch_*.pkl under {args.pickle_dir}")
    rng = np.random.RandomState(0)
    agg = {"background_l1": [], "foreground_l1": [], "random_pair_l1": []}
    for f in files:
        with open(f, "rb") as fh:
            rec = pickle.load(fh)
        h, w = rec["imgs_rand"].shape[1:3]
        masks = np.asarray(rasterize_boxes(jnp.asarray(rec["boxes"]), h, w))[..., None]
        masks_shift = np.asarray(
            rasterize_boxes(jnp.asarray(rec["boxes_shift"]), h, w)
        )[..., None]
        stats = consistency_l1(
            rec["imgs_rand"], rec["imgs_shift"], masks, masks_shift, rec["valid"]
        )
        agg["background_l1"].append(stats["background_l1"])
        agg["foreground_l1"].append(stats["foreground_l1"])
        agg["random_pair_l1"].append(random_pair_baseline(rec["imgs_rand"], rng))
    print(json.dumps({k: float(np.mean(v)) for k, v in agg.items()}))


if __name__ == "__main__":
    main()
