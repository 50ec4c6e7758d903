"""Crop realism classification: train + test drivers around ResNet-50.

Reference parity: evaluation/train_resinet50_vg.py (train loop over real
224^2 object crops, n_class-way CE) and evaluation/test_classification_vg.py
(accuracy on real vs generated vs shifted crops from the generation
pickles).
"""

from __future__ import annotations

import glob
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aglayout_tpu.eval.resnet import ResNet50
from aglayout_tpu.ops.bilinear import crop_bbox_dense
from aglayout_tpu.train.losses import cross_entropy


def make_crop_classifier(num_classes: int, crop_size: int = 224):
    model = ResNet50(num_classes=num_classes)
    tx = optax.adam(1e-4)
    return model, tx, crop_size


def train_crop_classifier(cfg, loader, niter=5000, crop_size=224, lr=1e-4, log_step=50):
    model = ResNet50(num_classes=cfg.num_classes)
    tx = optax.adam(lr)
    dummy = jnp.zeros((2, crop_size, crop_size, 3))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), dummy, train=True
    )
    params, stats = variables["params"], variables["batch_stats"]
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt, batch):
        b, o = batch["objs"].shape
        crops = crop_bbox_dense(batch["imgs"], batch["boxes"], crop_size)
        crops = crops.reshape(b * o, crop_size, crop_size, 3)
        labels = batch["objs"].reshape(-1)
        valid = batch["valid"].reshape(-1)

        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": stats}, crops, train=True, mutable=["batch_stats"]
            )
            return cross_entropy(logits, labels, valid), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    it = iter(loader)
    for i in range(niter):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        params, stats, opt, loss = step(params, stats, opt, batch)
        if (i + 1) % log_step == 0:
            print(f"cls iter {i+1}/{niter} loss {float(loss):.4f}", flush=True)
    return model, params, stats


def test_crop_classifier(model, params, stats, pickle_dir, crop_size=224, max_batches=None):
    """Accuracy on real / generated / shifted crops (reference
    test_classification_vg.py:44-150)."""

    @jax.jit
    def predict(imgs, boxes):
        b, o = boxes.shape[:2]
        crops = crop_bbox_dense(imgs, boxes, crop_size).reshape(
            b * o, crop_size, crop_size, 3
        )
        logits = model.apply({"params": params, "batch_stats": stats}, crops, train=False)
        return jnp.argmax(logits, -1)

    counts = {"real": [0, 0], "rand": [0, 0], "shift": [0, 0]}
    files = sorted(glob.glob(os.path.join(pickle_dir, "batch_*.pkl")))
    if max_batches:
        files = files[:max_batches]
    for f in files:
        with open(f, "rb") as fh:
            rec = pickle.load(fh)
        labels = rec["objs"].reshape(-1)
        valid = rec["valid"].reshape(-1) > 0
        for key, imgs, boxes in [
            ("real", rec["imgs"], rec["boxes"]),
            ("rand", rec["imgs_rand"], rec["boxes"]),
            ("shift", rec["imgs_shift"], rec["boxes_shift"]),
        ]:
            pred = np.asarray(predict(jnp.asarray(imgs), jnp.asarray(boxes)))
            counts[key][0] += int(((pred == labels) & valid).sum())
            counts[key][1] += int(valid.sum())
    return {k: (c / max(n, 1)) for k, (c, n) in counts.items()}


def main():
    """Standalone driver (reference train_resinet50_vg.py /
    test_classification_vg.py ran as their own scripts): `train` fits the
    ResNet-50 crop classifier on real crops from the VG loader and saves
    params; `test` scores real/rand/shift crops from generation pickles."""
    import argparse
    import json

    from flax import serialization

    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pt = sub.add_parser("train")
    pt.add_argument("--vg_dir", required=True)
    pt.add_argument("--image_dir", default="")
    pt.add_argument("--out", default="crop_classifier.msgpack")
    pt.add_argument("--image_size", type=int, default=64)
    pt.add_argument("--batch_size", type=int, default=8)
    pt.add_argument("--niter", type=int, default=5000)
    pt.add_argument("--crop_size", type=int, default=224)
    pe = sub.add_parser("test")
    pe.add_argument("pickle_dir")
    pe.add_argument("--weights", required=True)
    pe.add_argument("--crop_size", type=int, default=224)
    pe.add_argument("--max_batches", type=int, default=None)
    pe.add_argument(
        "--num_classes", type=int, default=179,
        help="must match the trained weights (vocab size at train time)",
    )
    args = p.parse_args()

    from aglayout_tpu.config import config_for

    if args.cmd == "train":
        from aglayout_tpu.data.dataset import get_dataloaders

        cfg = config_for(
            args.image_size,
            vg_dir=args.vg_dir,
            image_dir=args.image_dir,
            batch_size=args.batch_size,
        )
        loader, _, vocab = get_dataloaders(cfg)
        cfg.num_classes = len(vocab["object_idx_to_name"])
        model, params, stats = train_crop_classifier(
            cfg, loader, niter=args.niter, crop_size=args.crop_size
        )
        with open(args.out, "wb") as f:
            f.write(serialization.to_bytes({"params": params, "batch_stats": stats}))
        print(f"saved {args.out}")
    else:
        model = ResNet50(num_classes=args.num_classes)
        dummy = jnp.zeros((1, args.crop_size, args.crop_size, 3))
        tmpl = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), dummy, train=False
        )
        with open(args.weights, "rb") as f:
            variables = serialization.from_bytes(
                {"params": tmpl["params"], "batch_stats": tmpl["batch_stats"]}, f.read()
            )
        acc = test_crop_classifier(
            model,
            variables["params"],
            variables["batch_stats"],
            args.pickle_dir,
            crop_size=args.crop_size,
            max_batches=args.max_batches,
        )
        print(json.dumps(acc))


if __name__ == "__main__":
    main()
