"""Input-pipeline benchmark: can the loader feed the TPU train step?

Builds a synthetic Visual Genome corpus (N real JPEGs at VG-like sizes +
the VG JSON), runs the actual ETL (preprocess_vg -> h5), and times the
runtime Loader (threaded JPEG decode + dense batch assembly,
aglayout_tpu/data/dataset.py) end-to-end. Compares against the measured
train-step consumption rate. Writes artifacts/loader_bench.json.

Usage: python tools/bench_loader.py [--n_images 2000] [--batch_size 8]
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

import numpy as np  # noqa: E402


def build_corpus(root: str, n_images: int, seed: int = 0):
    from PIL import Image

    from aglayout_tpu.data.split_vg import make_splits

    img_dir = os.path.join(root, "images", "VG_100K")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    names = [f"cls{i}" for i in range(40)]
    atts = [f"att{i}" for i in range(20)]
    images, objects, attributes, relationships = [], [], [], []
    oid = 1000
    for i in range(n_images):
        image_id = i + 1
        w, h = 500, 375  # typical VG resolution
        # structured image (JPEG of pure noise decodes unrealistically slowly)
        base = np.zeros((h, w, 3), np.uint8)
        base[:] = rng.randint(0, 255, 3, dtype=np.uint8)
        for _ in range(6):
            x0, y0 = rng.randint(0, w - 60), rng.randint(0, h - 60)
            base[y0 : y0 + 60, x0 : x0 + 60] = rng.randint(0, 255, 3, dtype=np.uint8)
        Image.fromarray(base).save(os.path.join(img_dir, f"{image_id}.jpg"), quality=85)
        images.append({"image_id": image_id, "width": w, "height": h,
                       "url": f"https://x/VG_100K/{image_id}.jpg"})
        objs, rels, att_recs = [], [], []
        for j in range(6):
            objs.append({"object_id": oid, "names": [names[(i + j) % len(names)]],
                         "x": 10 + 40 * j, "y": 15 + 30 * j, "w": 100, "h": 110})
            att_recs.append({"object_id": oid, "attributes": [atts[(i + j) % len(atts)]]})
            oid += 1
        for j in range(3):
            rels.append({"relationship_id": oid * 10 + j, "predicate": "on",
                         "subject": {"object_id": objs[j]["object_id"]},
                         "object": {"object_id": objs[j + 1]["object_id"]}})
        objects.append({"image_id": image_id, "objects": objs})
        attributes.append({"image_id": image_id, "attributes": att_recs})
        relationships.append({"image_id": image_id, "relationships": rels})

    for name, data in [("image_data.json", images), ("objects.json", objects),
                       ("attributes.json", attributes), ("relationships.json", relationships)]:
        with open(os.path.join(root, name), "w") as f:
            json.dump(data, f)
    with open(os.path.join(root, "vg_splits.json"), "w") as f:
        json.dump(make_splits([im["image_id"] for im in images], seed=0, train_frac=0.9), f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_images", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--min_object_instances", type=int, default=5)
    p.add_argument("--keep", default=None, help="reuse/keep corpus dir")
    args = p.parse_args()

    from aglayout_tpu.data import preprocess_vg
    from aglayout_tpu.data.dataset import Loader, VgDataset

    root = args.keep or tempfile.mkdtemp(prefix="vg_bench_")
    if not os.path.exists(os.path.join(root, "train.h5")):
        print(f"building {args.n_images}-image corpus in {root} ...", flush=True)
        t0 = time.time()
        build_corpus(root, args.n_images)
        t_corpus = time.time() - t0
        etl = preprocess_vg.build_parser().parse_args([
            "--splits_json", os.path.join(root, "vg_splits.json"),
            "--images_json", os.path.join(root, "image_data.json"),
            "--objects_json", os.path.join(root, "objects.json"),
            "--attributes_json", os.path.join(root, "attributes.json"),
            "--relationships_json", os.path.join(root, "relationships.json"),
            "--object_aliases", "",
            "--relationship_aliases", "",
            "--min_image_size", "100",
            "--min_object_instances", str(args.min_object_instances),
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
        t_etl = time.time() - t0
        print(f"corpus {t_corpus:.1f}s, ETL {t_etl:.1f}s", flush=True)

    results = {"n_images": args.n_images, "workers": args.workers,
               "batch_size": args.batch_size}
    with open(os.path.join(root, "vocab.json")) as f:
        vocab = json.load(f)
    for image_size in (64, 128):
        ds = VgDataset(
            os.path.join(root, "train.h5"),
            os.path.join(root, "images"),
            vocab,
            image_size=image_size,
        )
        loader = Loader(ds, args.batch_size, shuffle=True, seed=0,
                        num_threads=args.workers, drop_last=True)
        # warm one epoch pass segment then time
        it = iter(loader)
        for _ in range(4):
            next(it)
        t0 = time.time()
        n_batches = max(1, min(100, len(loader) - 5))
        for _ in range(n_batches):
            next(it)
        dt = time.time() - t0
        img_s = n_batches * args.batch_size / dt
        results[f"loader_imgs_per_sec_{image_size}"] = round(img_s, 1)
        print(f"{image_size}^2: loader {img_s:.1f} img/s "
              f"({n_batches} batches, {args.workers} workers)", flush=True)

    # Train-step consumption for the headroom figure: read the measured
    # steps/s from the committed train-bench artifact when present, else
    # fall back to the PARITY.md reference constant (21.2 steps/s @ 64^2
    # b=8, measured at commit 6cc0cb9) and label it as such.
    train_bench = os.path.join(os.path.dirname(TOOLS), "artifacts", "train_bench.json")
    steps_per_sec, source = 21.2, "constant:PARITY.md@6cc0cb9"
    if os.path.exists(train_bench):
        try:
            with open(train_bench) as f:
                tb = json.load(f)
            steps_per_sec = float(tb["steps_per_sec_64_b8"])
            source = "artifacts/train_bench.json"
        except (KeyError, ValueError):
            pass
    results["train_consumption_imgs_per_sec_64_b8"] = round(steps_per_sec * 8, 1)
    results["train_consumption_source"] = source
    results["headroom_64"] = round(
        results["loader_imgs_per_sec_64"] / (steps_per_sec * 8), 2
    )
    out = os.path.join(os.path.dirname(TOOLS), "artifacts", "loader_bench.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
