"""Quality-tracking curve: train -> eval the live state every N steps.

Round-4 verdict item 4: BASELINE.md's quality gate (FID within +-2 of the
reference) had no tracking signal — training-dynamics evidence existed but
no run tied a sequence of training states to the eval-report pipeline.
This tool trains the real config on the VG-scale synthetic corpus (the
same one tools/vg_scale_rehearsal.py builds; Visual Genome itself is
unreachable in the zero-egress image) and, every `--eval_every` steps,
drives `aglayout_tpu.eval.report.evaluate_run` against the IN-MEMORY train
state with the offline extractors, writing:

  artifacts/quality_curve.json   — per-evaluation metric table
  artifacts/quality_curve.png    — FID-proxy / IS / diversity / consistency
                                   vs training step

Why inline instead of checkpoint-restore: the tunneled TPU transport
fetches device arrays at ~0.4 MB/s, so saving the ~1 GB train state per
checkpoint costs ~45 minutes each — evaluating the live state moves only
the generated eval images. (On a directly-attached TPU the
checkpoint-every-N + eval-per-checkpoint flow via eval/report.py works
unchanged.)

The offline extractors (pixel-projection FID, random-feature IS,
random-pyramid perceptual distance) are deterministic and fixed across
evaluation points, so RELATIVE movement across the curve is a valid
quality signal even though the absolute numbers are not comparable to
published Inception-based values (each entry carries its extractor name).

Usage:
  python tools/quality_curve.py --corpus /tmp/vg_rehearsal_r5 \
      --image_size 128 --batch_size 8 --steps 25000 --eval_every 5000
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
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--steps", type=int, default=25_000)
    p.add_argument("--eval_every", type=int, default=5_000)
    p.add_argument("--eval_batches", type=int, default=8)
    p.add_argument("--eval_at_init", action="store_true", default=True)
    p.add_argument("--work_dir", default="/tmp/quality_curve_work")
    p.add_argument("--out", default=os.path.join(os.path.dirname(TOOLS), "artifacts", "quality_curve"))
    args = p.parse_args()

    import jax
    import numpy as np

    from aglayout_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from aglayout_tpu.config import config_for
    from aglayout_tpu.data.dataset import get_dataloaders
    from aglayout_tpu.data.vocab import attribute_pos_weight
    from aglayout_tpu.eval.report import evaluate_run
    from aglayout_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        replicated,
        shard_batch,
    )
    from aglayout_tpu.train.state import Models, create_train_state
    from aglayout_tpu.train.step import make_train_step

    with open(os.path.join(args.corpus, "vocab.json")) as f:
        vocab = json.load(f)

    cfg = config_for(
        args.image_size,
        batch_size=args.batch_size,
        vg_dir=args.corpus,
        image_dir=os.path.join(args.corpus, "images"),
        num_classes=len(vocab["object_idx_to_name"]),
        attribute_dim=len(vocab["attribute_idx_to_name"]),
        path=args.work_dir,
    )

    train_loader, val_loader, _ = get_dataloaders(cfg)

    def data_factory():
        return val_loader.epoch(0)

    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(cfg.seed))

    matrix = np.load(os.path.join(args.corpus, "matrix_obj_vs_att.npy"))
    pos_weight = (
        attribute_pos_weight()
        if cfg.attribute_dim == 106
        else np.ones(cfg.attribute_dim, np.float32)
    )
    step_fn = make_train_step(cfg, models, matrix, pos_weight)
    mesh = make_mesh(cfg.num_devices)
    state = jax.device_put(state, replicated(mesh))
    sharded_step = make_sharded_train_step(step_fn, mesh)

    drop = ("masks", "masks_shift") if cfg.device_masks else ()

    def prep(b):
        return shard_batch({k: v for k, v in b.items() if k not in drop}, mesh)

    curve = []

    def eval_point(step_no, st):
        t0 = time.time()
        rep = evaluate_run(
            cfg, models, st, data_factory,
            os.path.join(args.work_dir, f"eval_{step_no}"),
            max_batches=args.eval_batches, keep_pickles=False,
        )
        row = {
            "step": step_no,
            "fid_rand": rep["fid"]["rand"],
            "fid_shift": rep["fid"]["shift"],
            "fid_extractor": rep["fid"]["extractor"],
            "inception_score": rep["inception_score"]["mean"],
            "lpips_diversity": rep["lpips_diversity"]["mean"],
            "consistency_background_l1": rep["consistency"]["background_l1"],
            "consistency_foreground_l1": rep["consistency"]["foreground_l1"],
            "consistency_random_pair_l1": rep["consistency"]["random_pair_l1"],
            "attr_precision": rep["attributes"].get("average_precision"),
            "attr_recall": rep["attributes"].get("average_recall"),
            "edit_success_rate": rep["attributes"].get("edit_success_rate"),
            "eval_wall_s": round(time.time() - t0, 1),
        }
        curve.append(row)
        print("EVAL " + json.dumps(row), flush=True)
        _write(curve)

    def _write(curve):
        out = {
            "corpus": args.corpus,
            "image_size": args.image_size,
            "batch_size": args.batch_size,
            "steps": args.steps,
            "eval_every": args.eval_every,
            "eval_batches": args.eval_batches,
            "note": (
                "offline extractors (named per entry): absolute values are NOT "
                "comparable to published Inception-based FID/IS; the curve's "
                "relative movement across evaluation points is the quality "
                "signal. Inline eval of the live train state (see module "
                "docstring for why not checkpoint-restore on this transport)."
            ),
            "curve": curve,
        }
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out + ".json", "w") as f:
            json.dump(out, f, indent=2)

    if args.eval_at_init:
        eval_point(0, state)

    it = iter(train_loader)
    pending = prep(next(it))
    t0 = time.time()
    for i in range(args.steps):
        batch = pending
        state, metrics = sharded_step(state, batch)
        if i + 1 < args.steps:
            pending = prep(next(it))
        if (i + 1) % 500 == 0:
            g = float(metrics["G/loss"])
            d = float(metrics["D/loss"])
            rate = 500 / (time.time() - t0)
            t0 = time.time()
            print(f"step {i+1}/{args.steps} G/loss={g:.3f} D/loss={d:.3f} "
                  f"{rate:.2f} steps/s", flush=True)
        if (i + 1) % args.eval_every == 0:
            eval_point(i + 1, state)
            t0 = time.time()
            if i + 1 < args.steps:
                pending = prep(next(it))

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
