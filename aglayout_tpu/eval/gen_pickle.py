"""Dump generated batches for downstream classification evaluation.

Capability parity with the reference's evaluation/gen_pickle_for_classification.py
(:144-176): per batch, pickle (imgs, imgs_rand, imgs_shift, objs, boxes,
boxes_shift, valid, attribute) plus deprocessed PNGs, consumed by the crop
realism classifier (eval/classifier.py).
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from aglayout_tpu.ops.image import imagenet_deprocess_batch


def dump_generation_pickles(cfg, models, state, loader, out_dir, max_batches=100, seed=0):
    os.makedirs(out_dir, exist_ok=True)
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
    for bi, batch_np in enumerate(loader):
        if bi >= max_batches:
            break
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        b, o = batch["objs"].shape
        rng, kz, kr = jax.random.split(rng, 3)
        z = jax.random.normal(kz, (b, o, cfg.z_dim))
        out = forward(batch, z, kr)
        rec = {
            "imgs": np.asarray(batch["imgs"]),
            "imgs_rand": np.asarray(out["img_rand"]),
            "imgs_shift": np.asarray(out["img_shift"]),
            "objs": batch_np["objs"],
            "boxes": batch_np["boxes"],
            "boxes_shift": batch_np["boxes_shift"],
            "valid": batch_np["valid"],
            "attribute": batch_np["attribute"],
        }
        with open(os.path.join(out_dir, f"batch_{bi:05d}.pkl"), "wb") as f:
            pickle.dump(rec, f)
        for name in ("imgs", "imgs_rand", "imgs_shift"):
            u8 = np.asarray(imagenet_deprocess_batch(jnp.asarray(rec[name])))
            from PIL import Image

            for j in range(b):
                Image.fromarray(u8[j]).save(
                    os.path.join(out_dir, f"{name}_{bi * b + j:06d}.png")
                )
    return out_dir
