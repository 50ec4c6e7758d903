"""VG-scale data-path rehearsal: ETL -> h5 -> loader -> ~1k REAL train steps.

Round-3 verdict item 7: the loader was only ever benched standalone; prove
the full pipeline (dataset-scale h5 + threaded JPEG decode + native batch
assembly + device prefetch) holds up FEEDING the production train loop, not
just in isolation. Visual Genome itself cannot be downloaded here (zero
egress), so this uses the synthetic VG-shaped corpus from
tools/bench_loader.py (real JPEGs at VG resolutions, real VG JSON schema)
at 80k images — the reference's train split is 86,463
(data/Datasets/vg/vg_splits.json, SURVEY.md §6).

Pipeline exercised end-to-end (all production code, no shortcuts):
  build_corpus -> preprocess_vg ETL -> cooccurrence matrix ->
  train.py's train() loop (jitted sharded step, device prefetch,
  TB logging off) for --steps steps at 64^2 b=8.

Writes artifacts/vg_scale_rehearsal.json with the achieved steps/s vs the
compute-only steps/s from artifacts/train_bench.json — the delta IS the
loader stall. Run on the TPU host.

Usage: python tools/vg_scale_rehearsal.py [--n_images 80000] [--steps 1000]
       [--keep DIR]  (reuse a previously built corpus dir)
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(TOOLS))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_images", type=int, default=80_000)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--keep", default=None, help="reuse/keep corpus dir")
    p.add_argument("--out", default=os.path.join(os.path.dirname(TOOLS),
                                                 "artifacts", "vg_scale_rehearsal.json"))
    args = p.parse_args()

    import numpy as np

    from aglayout_tpu.data import preprocess_vg
    from tools.bench_loader import build_corpus

    results = {"n_images": args.n_images, "steps": args.steps,
               "batch_size": args.batch_size, "image_size": args.image_size}

    root = args.keep or tempfile.mkdtemp(prefix="vg_rehearsal_")
    if not os.path.exists(os.path.join(root, "train.h5")):
        print(f"building {args.n_images}-image corpus in {root} ...", flush=True)
        t0 = time.time()
        build_corpus(root, args.n_images)
        results["corpus_build_s"] = round(time.time() - t0, 1)
        etl = preprocess_vg.build_parser().parse_args([
            "--splits_json", os.path.join(root, "vg_splits.json"),
            "--images_json", os.path.join(root, "image_data.json"),
            "--objects_json", os.path.join(root, "objects.json"),
            "--attributes_json", os.path.join(root, "attributes.json"),
            "--relationships_json", os.path.join(root, "relationships.json"),
            "--object_aliases", "",
            "--relationship_aliases", "",
            "--min_image_size", "100",
            "--min_object_instances", "5",
            "--min_attribute_instances", "1",
            "--min_object_size", "16",
            "--min_objects_per_image", "2",
            "--min_relationship_instances", "1",
            "--use_counted_attributes",
            "--output_vocab_json", os.path.join(root, "vocab.json"),
            "--output_h5_dir", root,
        ])
        t0 = time.time()
        preprocess_vg.main(etl)
        results["etl_s"] = round(time.time() - t0, 1)
        print(f"corpus {results.get('corpus_build_s')}s, "
              f"ETL {results.get('etl_s')}s", flush=True)

    # co-occurrence matrix from the train h5 (the reference builds
    # matrix_obj_vs_att.pt the same way: evaluation/get_att_vs_obj_matrix.py)
    if not os.path.exists(os.path.join(root, "matrix_obj_vs_att.npy")):
        with open(os.path.join(root, "vocab.json")) as f:
            vocab = json.load(f)
        from aglayout_tpu.data.cooccurrence import build_matrix

        m = build_matrix(os.path.join(root, "train.h5"),
                         len(vocab["object_idx_to_name"]),
                         len(vocab["attribute_idx_to_name"]))
        np.save(os.path.join(root, "matrix_obj_vs_att.npy"), m)

    with open(os.path.join(root, "vocab.json")) as f:
        vocab = json.load(f)

    # the production loop: real loader, jitted sharded step, prefetch
    from aglayout_tpu.config import config_for
    from aglayout_tpu.train.loop import train

    ckpt_dir = tempfile.mkdtemp(prefix="vg_rehearsal_ckpt_")
    cfg = config_for(
        args.image_size,
        batch_size=args.batch_size,
        vg_dir=root,
        image_dir=os.path.join(root, "images"),
        num_classes=len(vocab["object_idx_to_name"]),
        attribute_dim=len(vocab["attribute_idx_to_name"]),
        path=ckpt_dir,
        save_step=10**9,       # no checkpoints in the timing window
        tensorboard_step=10**9,
        log_step=50,
    )
    t0 = time.time()
    _, metrics = train(cfg, niter=args.steps, use_tensorboard=False,
                       window_rates=(rates := []))
    wall = time.time() - t0
    results["train_wall_s"] = round(wall, 1)
    results["steps_per_sec_incl_compile"] = round(args.steps / wall, 2)
    # steady state: drop the first two log windows (step compile + loader
    # warm-up land there) and average the rest
    steady = rates[2:] if len(rates) > 4 else rates
    if steady:
        results["steps_per_sec_steady"] = round(sum(steady) / len(steady), 2)
        results["steps_per_sec_steady_min"] = round(min(steady), 2)
        results["steps_per_sec_steady_max"] = round(max(steady), 2)
    results["final_G_loss"] = float(metrics["G/loss"])
    results["final_D_loss"] = float(metrics["D/loss"])

    # compute-only rate for the stall accounting, if measured
    tb = os.path.join(os.path.dirname(TOOLS), "artifacts", "train_bench.json")
    if os.path.exists(tb):
        with open(tb) as f:
            tbj = json.load(f)
        key = f"steps_per_sec_{args.image_size}_b{args.batch_size}"
        if key in tbj:
            results["compute_only_steps_per_sec"] = tbj[key]

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
