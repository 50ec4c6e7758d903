"""Train the held-out attribute classifier used for consistency evaluation.

Capability parity with the reference's evaluation/train_att_cls.py: trains
its own copy of the attribute discriminator architecture on real object
crops with the pos-weighted BCE (:238-239), saved separately from the GAN's
netD_att so evaluation is not self-graded.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aglayout_tpu.config import config_for
from aglayout_tpu.data.vocab import attribute_pos_weight
from aglayout_tpu.models.discriminator import AttributeDiscriminator
from aglayout_tpu.ops.bilinear import crop_bbox_dense
from aglayout_tpu.train.losses import bce_logits


def make_classifier_step(model, tx, pos_weight, object_size):
    pos_weight = jnp.asarray(pos_weight, jnp.float32)

    def step(params, stats, opt, batch):
        b, o = batch["objs"].shape
        crops = crop_bbox_dense(batch["imgs"], batch["boxes"], object_size)
        crops = crops.reshape(b * o, object_size, object_size, 3)
        att = batch["attribute"].reshape(b * o, -1)
        annotated = (jnp.sum(att, -1) > 0) & (batch["valid"].reshape(-1) > 0)

        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": stats}, crops, True, mutable=["batch_stats"]
            )
            return bce_logits(logits, att, annotated, pos_weight), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    return jax.jit(step)


def train_attribute_classifier(cfg, loader, niter=10000, lr=2e-4, log_step=50, out_dir=None):
    model = AttributeDiscriminator(
        n_attribute=cfg.attribute_dim, extra_block=(cfg.image_size == 128)
    )
    tx = optax.adam(lr, b1=0.5, b2=0.999)
    dummy = jnp.zeros((2, cfg.object_size, cfg.object_size, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy)
    params, stats = variables["params"], variables["batch_stats"]
    opt = tx.init(params)
    step = make_classifier_step(model, tx, attribute_pos_weight(), cfg.object_size)

    it = iter(loader)
    loss = None
    for i in range(niter):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        params, stats, opt, loss = step(params, stats, opt, batch)
        if (i + 1) % log_step == 0:
            print(f"att_cls iter {i+1}/{niter} loss {float(loss):.4f}", flush=True)
    if out_dir:
        from aglayout_tpu.utils.checkpoint import save_state

        save_state(out_dir, niter, {"params": params, "batch_stats": stats})
    return params, stats, float(loss) if loss is not None else None


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_size", type=int, default=64, choices=[64, 128])
    p.add_argument("--vg_dir", default="data/vg")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--niter", type=int, default=10000)
    p.add_argument("--out_dir", default="checkpoints/att_cls")
    args = p.parse_args()

    cfg = config_for(args.image_size, vg_dir=args.vg_dir, batch_size=args.batch_size)
    from aglayout_tpu.data.dataset import get_dataloaders

    train_loader, _, vocab = get_dataloaders(cfg)
    cfg.num_classes = len(vocab["object_idx_to_name"])
    train_attribute_classifier(cfg, train_loader, args.niter, out_dir=args.out_dir)


if __name__ == "__main__":
    main()
