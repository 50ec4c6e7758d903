"""One-command evaluation report over a trained run.

    python -m aglayout_tpu.eval.report --path checkpoints --image_size 64

drives one generation pass and produces a single `report.json` with every
metric the reference's scattered evaluation/*.py drivers compute in
sequence (fid.py:361-386, compute_inception_score.py:111-148,
consistency.py:155-211, PerceptualSimilarity diversity, plus test.py's
attribute precision/recall + edit success):

  * fid_rand / fid_shift  — real vs generated Fréchet distance
  * inception_score       — over the generated (random-z) images
  * lpips_diversity       — mean perceptual distance between two z-samples
                            of the SAME layout (higher = more diverse)
  * consistency           — background/foreground L1 between rand and
                            shifted generations + random-pair baseline
  * attributes            — per-object attribute P/R + edit success rate

Extractors: real InceptionV3 / LPIPS-AlexNet when weight files are given
(--inception_weights / --alexnet_weights + --lpips_weights), otherwise the
labeled offline stand-ins (pixel-projection FID, random-feature IS,
random-pyramid perceptual distance) — each report entry carries the
extractor name so the two regimes can never be confused.
"""

from __future__ import annotations

import json
import os

import numpy as np


def _deprocess_u8(imgs) -> np.ndarray:
    import jax.numpy as jnp

    from aglayout_tpu.ops.image import imagenet_deprocess_batch

    return np.asarray(imagenet_deprocess_batch(jnp.asarray(imgs)))


def evaluate_run(
    cfg,
    models,
    state,
    data_factory,
    out_dir: str,
    *,
    max_batches: int = 5,
    seed: int = 0,
    inception_weights: str | None = None,
    alexnet_weights: str | None = None,
    lpips_weights: str | None = None,
    keep_pickles: bool = True,
) -> dict:
    """Run the full metric suite; returns (and writes) the report dict.

    `data_factory()` must return a fresh batch iterator each call (the
    attribute pass re-drives the loader from the start so its P/R is
    computed on the same samples as the distribution metrics).
    """
    import jax
    import jax.numpy as jnp

    from aglayout_tpu.eval.consistency import consistency_l1, random_pair_baseline
    from aglayout_tpu.eval.fid import compute_statistics, frechet_distance, make_extractor
    from aglayout_tpu.eval.gen_pickle import dump_generation_pickles
    from aglayout_tpu.eval.inception_score import (
        RandomFeatureClassifier,
        inception_score_from_probs,
    )
    from aglayout_tpu.infer.generate import run_inference

    os.makedirs(out_dir, exist_ok=True)
    report: dict = {"config": {"image_size": cfg.image_size, "max_batches": max_batches}}

    # -- 1. one generation pass -> pickles (real/rand/shift + layout) -------
    pkl_dir = os.path.join(out_dir, "pickles")
    dump_generation_pickles(
        cfg, models, state, data_factory(), pkl_dir, max_batches=max_batches, seed=seed
    )
    import glob as _glob
    import pickle as _pickle

    real, rand, shift, boxes, boxes_shift, valid = [], [], [], [], [], []
    for f in sorted(_glob.glob(os.path.join(pkl_dir, "batch_*.pkl"))):
        with open(f, "rb") as fh:
            rec = _pickle.load(fh)
        real.append(rec["imgs"])
        rand.append(rec["imgs_rand"])
        shift.append(rec["imgs_shift"])
        boxes.append(rec["boxes"])
        boxes_shift.append(rec["boxes_shift"])
        valid.append(rec["valid"])
    real_n = np.concatenate(real)
    rand_n = np.concatenate(rand)
    shift_n = np.concatenate(shift)
    real_u8 = _deprocess_u8(real_n)
    rand_u8 = _deprocess_u8(rand_n)
    shift_u8 = _deprocess_u8(shift_n)

    # -- 2. FID (real vs rand, real vs shift) --------------------------------
    extractor = make_extractor(
        "inception" if inception_weights else "pixel", weights=inception_weights
    )
    mu_r, s_r = compute_statistics(extractor(real_u8))
    mu_g, s_g = compute_statistics(extractor(rand_u8))
    mu_s, s_s = compute_statistics(extractor(shift_u8))
    report["fid"] = {
        "rand": frechet_distance(mu_r, s_r, mu_g, s_g),
        "shift": frechet_distance(mu_r, s_r, mu_s, s_s),
        "extractor": extractor.name,
        "n_images": int(len(real_u8)),
    }

    # -- 3. Inception Score over the generated images ------------------------
    if inception_weights:
        from aglayout_tpu.eval.inception import InceptionExtractor

        logits = InceptionExtractor(inception_weights).logits(rand_u8)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
        is_name = "inception-v3 logits"
    else:
        probs = RandomFeatureClassifier(num_classes=cfg.num_classes, seed=0)(rand_u8)
        is_name = RandomFeatureClassifier.name
    splits = min(3, max(1, len(probs) // 2))
    is_mean, is_std = inception_score_from_probs(probs, splits=splits)
    report["inception_score"] = {
        "mean": is_mean, "std": is_std, "splits": splits, "classifier": is_name,
    }

    # -- 4. LPIPS-form diversity: two z draws on the same layouts ------------
    g_vars = {"params": state.g.params, "batch_stats": state.g.stats}

    @jax.jit
    def forward(batch, z, rng):
        return models.generator.apply(
            g_vars, batch["imgs"], batch["objs"], batch["boxes"], batch["masks"],
            batch["valid"], z, batch["attribute"], batch["masks_shift"],
            batch["boxes_shift"], batch["attribute"], train=False,
            rngs={"reparam": rng},
        )

    if alexnet_weights and lpips_weights:
        from aglayout_tpu.eval.lpips import load_alexnet_lpips, lpips_alex

        convs, lins = load_alexnet_lpips(alexnet_weights, lpips_weights)
        dist_fn = jax.jit(lambda x, y: lpips_alex(x, y, convs, lins))
        div_name = "lpips-v0.1-alexnet"
    else:
        from aglayout_tpu.eval.lpips import _random_pyramid_params, perceptual_distance

        pyr = _random_pyramid_params()
        dist_fn = jax.jit(lambda x, y: perceptual_distance(x, y, pyr))
        div_name = "random-pyramid (not comparable to published LPIPS)"

    rng = jax.random.PRNGKey(seed + 1)
    dists = []
    for bi, batch_np in enumerate(data_factory()):
        if bi >= max_batches:
            break
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        b, o = batch["objs"].shape
        rng, k1, k2, kr1, kr2 = jax.random.split(rng, 5)
        z1 = jax.random.normal(k1, (b, o, cfg.z_dim))
        z2 = jax.random.normal(k2, (b, o, cfg.z_dim))
        x1 = forward(batch, z1, kr1)["img_rand"]
        x2 = forward(batch, z2, kr2)["img_rand"]
        # perceptual inputs are [-1,1]-range pixels
        u1 = _deprocess_u8(x1).astype(np.float32) / 127.5 - 1.0
        u2 = _deprocess_u8(x2).astype(np.float32) / 127.5 - 1.0
        dists.append(np.asarray(dist_fn(jnp.asarray(u1), jnp.asarray(u2))))
    d = np.concatenate(dists)
    report["lpips_diversity"] = {
        "mean": float(d.mean()), "std": float(d.std()), "pairs": int(len(d)),
        "backbone": div_name,
    }

    # -- 5. consistency (from the pickled generations) ------------------------
    from aglayout_tpu.ops.rasterize import rasterize_boxes

    np_rng = np.random.RandomState(0)
    agg = {"background_l1": [], "foreground_l1": [], "random_pair_l1": []}
    h, w = rand_n.shape[1:3]
    for bx, bxs, vld, ir, ish in zip(boxes, boxes_shift, valid, rand, shift):
        masks = np.asarray(rasterize_boxes(jnp.asarray(bx), h, w))[..., None]
        masks_s = np.asarray(rasterize_boxes(jnp.asarray(bxs), h, w))[..., None]
        stats = consistency_l1(ir, ish, masks, masks_s, vld)
        agg["background_l1"].append(stats["background_l1"])
        agg["foreground_l1"].append(stats["foreground_l1"])
        agg["random_pair_l1"].append(random_pair_baseline(ir, np_rng))
    report["consistency"] = {k: float(np.mean(v)) for k, v in agg.items()}

    # -- 6. attribute P/R + edit success (test.py protocol) -------------------
    report["attributes"] = run_inference(
        cfg, models, state, data_factory(), os.path.join(out_dir, "attr"),
        max_batches=max_batches, save_images=False, seed=seed,
    )

    if not keep_pickles:
        import shutil

        shutil.rmtree(pkl_dir, ignore_errors=True)

    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


def main():
    import argparse

    import jax

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_size", type=int, default=64, choices=[64, 128])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--vg_dir", type=str, default="data/vg")
    p.add_argument("--path", type=str, default="checkpoints")
    p.add_argument("--resume", type=str, default="l")
    p.add_argument("--max_batches", type=int, default=50)
    p.add_argument("--out_dir", default=None, help="default: <results>/eval_report")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--inception_weights", default=None)
    p.add_argument("--alexnet_weights", default=None)
    p.add_argument("--lpips_weights", default=None)
    # width/debug knobs (must match the checkpoint being evaluated)
    p.add_argument("--conv_dim", type=int, default=64)
    p.add_argument("--d_conv_dim", type=int, default=64)
    p.add_argument("--clstm_layers", type=int, default=3)
    p.add_argument("--max_objects", type=int, default=10)
    args = p.parse_args()

    from aglayout_tpu.config import config_for
    from aglayout_tpu.train.loop import prepare_dirs
    from aglayout_tpu.train.state import Models, create_train_state
    from aglayout_tpu.utils.checkpoint import restore_state

    cfg = config_for(
        args.image_size,
        batch_size=args.batch_size,
        vg_dir=args.vg_dir,
        path=args.path,
        conv_dim=args.conv_dim,
        d_conv_dim=args.d_conv_dim,
        clstm_layers=args.clstm_layers,
        max_objects=args.max_objects,
    )

    if args.synthetic:
        from aglayout_tpu.data.synthetic import synthetic_batch

        def data_factory():
            rng = np.random.RandomState(0)
            while True:
                yield synthetic_batch(
                    rng, cfg.batch_size, cfg.max_objects, cfg.image_size, cfg.num_classes
                )
    else:
        from aglayout_tpu.data.dataset import get_dataloaders

        _, val_loader, vocab = get_dataloaders(cfg)
        cfg.num_classes = len(vocab["object_idx_to_name"])

        def data_factory():
            return val_loader.epoch(0)

    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    dirs = prepare_dirs(cfg)
    state, step = restore_state(dirs["models"], state, args.resume)
    print(f"restored checkpoint at step {step}")

    out_dir = args.out_dir or os.path.join(dirs["results"], "eval_report")
    report = evaluate_run(
        cfg, models, state, data_factory, out_dir,
        max_batches=args.max_batches,
        inception_weights=args.inception_weights,
        alexnet_weights=args.alexnet_weights,
        lpips_weights=args.lpips_weights,
    )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
