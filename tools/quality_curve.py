"""Quality-tracking curve: train -> checkpoint every N steps -> eval each.

Round-4 verdict item 4: BASELINE.md's quality gate (FID within +-2 of the
reference) had no tracking signal — training-dynamics evidence existed but
no run tied a sequence of checkpoints to the eval-report pipeline. This
tool trains the real config on the VG-scale synthetic corpus (the same one
tools/vg_scale_rehearsal.py builds; Visual Genome itself is unreachable in
the zero-egress image), keeps EVERY periodic checkpoint, then drives
`aglayout_tpu.eval.report.evaluate_run` per checkpoint with the offline
extractors and writes:

  artifacts/quality_curve.json   — per-checkpoint metric table
  artifacts/quality_curve.png    — FID-proxy / IS / diversity / consistency
                                   vs training step

The offline extractors (pixel-projection FID, random-feature IS,
random-pyramid perceptual distance) are deterministic and fixed across
checkpoints, so RELATIVE movement across the curve is a valid quality
signal even though the absolute numbers are not comparable to published
Inception-based values (each entry carries its extractor name).

Usage:
  python tools/quality_curve.py --corpus /tmp/vg_rehearsal_r5 \
      --image_size 128 --batch_size 16 --steps 30000 --ckpt_every 5000
"""

import argparse
import json
import os
import sys
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(TOOLS))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True, help="corpus dir with train.h5/test.h5/vocab.json")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--steps", type=int, default=30_000)
    p.add_argument("--ckpt_every", type=int, default=5_000)
    p.add_argument("--eval_batches", type=int, default=16)
    p.add_argument("--ckpt_dir", default="/tmp/quality_curve_ckpt")
    p.add_argument("--skip_train", action="store_true", help="evaluate existing checkpoints only")
    p.add_argument("--out", default=os.path.join(os.path.dirname(TOOLS), "artifacts", "quality_curve"))
    args = p.parse_args()

    import jax
    import numpy as np

    from aglayout_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from aglayout_tpu.config import config_for
    from aglayout_tpu.data.dataset import get_dataloaders
    from aglayout_tpu.eval.report import evaluate_run
    from aglayout_tpu.train.loop import prepare_dirs, train
    from aglayout_tpu.train.state import Models, create_train_state
    from aglayout_tpu.utils.checkpoint import restore_state

    with open(os.path.join(args.corpus, "vocab.json")) as f:
        vocab = json.load(f)

    cfg = config_for(
        args.image_size,
        batch_size=args.batch_size,
        vg_dir=args.corpus,
        image_dir=os.path.join(args.corpus, "images"),
        num_classes=len(vocab["object_idx_to_name"]),
        attribute_dim=len(vocab["attribute_idx_to_name"]),
        path=args.ckpt_dir,
        save_step=args.ckpt_every,
        save_num=10_000,  # keep every checkpoint for the curve
        tensorboard_step=10**9,
        log_step=100,
    )

    if not args.skip_train:
        t0 = time.time()
        rates: list = []
        train(cfg, niter=args.steps, use_tensorboard=False, window_rates=rates)
        wall = time.time() - t0
        print(f"trained {args.steps} steps in {wall/60:.1f} min "
              f"({args.steps/wall:.2f} steps/s incl. compile)", flush=True)

    # ---- evaluate every kept checkpoint -----------------------------------
    models = Models(cfg)
    base_state = create_train_state(cfg, models, jax.random.PRNGKey(cfg.seed))
    dirs = prepare_dirs(cfg)
    import re

    steps = sorted(
        int(m.group(1))
        for d in os.listdir(dirs["models"])
        if (m := re.match(r"^(\d+)$", d))
    )
    print(f"checkpoints: {steps}", flush=True)

    _, val_loader, _ = get_dataloaders(cfg)

    def data_factory():
        return val_loader.epoch(0)

    curve = []
    for s in steps:
        state, got = restore_state(dirs["models"], base_state, str(s))
        assert got == s, (got, s)
        rep = evaluate_run(
            cfg, models, state, data_factory,
            os.path.join(args.ckpt_dir, f"eval_{s}"),
            max_batches=args.eval_batches, keep_pickles=False,
        )
        row = {
            "step": s,
            "fid_rand": rep["fid"]["rand"],
            "fid_shift": rep["fid"]["shift"],
            "fid_extractor": rep["fid"]["extractor"],
            "inception_score": rep["inception_score"]["mean"],
            "lpips_diversity": rep["lpips_diversity"]["mean"],
            "consistency_background_l1": rep["consistency"]["background_l1"],
            "consistency_random_pair_l1": rep["consistency"]["random_pair_l1"],
            "attr_precision": rep["attributes"].get("average_precision"),
            "attr_recall": rep["attributes"].get("average_recall"),
            "edit_success_rate": rep["attributes"].get("edit_success_rate"),
        }
        curve.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "corpus": args.corpus,
        "image_size": args.image_size,
        "batch_size": args.batch_size,
        "steps": args.steps,
        "ckpt_every": args.ckpt_every,
        "eval_batches": args.eval_batches,
        "note": (
            "offline extractors (named per entry): absolute values are NOT "
            "comparable to published Inception-based FID/IS; the curve's "
            "relative movement across checkpoints is the quality signal"
        ),
        "curve": curve,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out + ".json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out + ".json", flush=True)

    # ---- plot --------------------------------------------------------------
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = [r["step"] for r in curve]
    fig, axes = plt.subplots(2, 2, figsize=(10, 7), constrained_layout=True)
    panels = [
        ("fid_rand", "FID proxy (real vs rand)", False),
        ("inception_score", "IS proxy (rand)", False),
        ("lpips_diversity", "perceptual diversity proxy", False),
        ("consistency_background_l1", "background L1 (rand vs shift)", True),
    ]
    for ax, (key, title, add_baseline) in zip(axes.flat, panels):
        ax.plot(xs, [r[key] for r in curve], marker="o")
        if add_baseline:
            ax.plot(
                xs, [r["consistency_random_pair_l1"] for r in curve],
                marker=".", linestyle="--", label="random-pair baseline",
            )
            ax.legend()
        ax.set_title(title)
        ax.set_xlabel("train step")
        ax.grid(True, alpha=0.3)
    fig.suptitle(
        f"{args.image_size}x{args.image_size} quality curve, b={args.batch_size}, "
        f"80k-image synthetic VG corpus (offline extractors)"
    )
    fig.savefig(args.out + ".png", dpi=120)
    print("wrote", args.out + ".png", flush=True)


if __name__ == "__main__":
    main()
