"""Inference + attribute-editing driver — test64.py/test128.py equivalent.

Per batch (reference test64.py:114-239):
  1. estimate attributes for unannotated objects (argmax of netD_att on
     real crops, :127-138)
  2. full generator forward -> img_rec / img_rand / img_shift + crops
  3. attribute scoring: netD_att on generated crops, sigmoid > 0.9 builds
     predicted rows vs GT (:144-164)
  4. attribute modification demo: zero the 12 color attributes, set the
     target color for every object, regenerate with fresh z (:170-185)
  5. edit success: target in top-3 of the modified crop's predictions AND
     not in top-5 of the original's (:193-198)
  6. save _rand/_shift/_rec/_real PNGs (+ _modified on success)

Everything device-side runs as two jitted generator applications per batch;
the host only does PNG encoding and metric accumulation.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from aglayout_tpu.config import Config
from aglayout_tpu.data.vocab import COLOR_ATTRIBUTE_IDS, DEFAULT_EDIT_TARGET
from aglayout_tpu.ops.bilinear import crop_bbox_dense
from aglayout_tpu.ops.image import imagenet_deprocess_batch
from aglayout_tpu.train.attributes import estimate_attributes
from aglayout_tpu.train.state import Models, TrainState


def save_png(path: str, array_u8: np.ndarray):
    from PIL import Image

    Image.fromarray(array_u8).save(path)


@dataclass
class AttributeMetrics:
    """Per-object multi-label precision/recall accumulator
    (reference test64.py:241-265 via sklearn confusion_matrix)."""

    tp: list = field(default_factory=list)
    fp: list = field(default_factory=list)
    fn: list = field(default_factory=list)

    def update(self, pred: np.ndarray, gt: np.ndarray):
        for p, g in zip(pred, gt):
            p, g = p > 0, g > 0
            self.tp.append(int(np.sum(p & g)))
            self.fp.append(int(np.sum(p & ~g)))
            self.fn.append(int(np.sum(~p & g)))

    def summary(self) -> dict:
        tp = np.array(self.tp, np.float64)
        fp = np.array(self.fp, np.float64)
        fn = np.array(self.fn, np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            prec = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
            rec = np.where(tp + fn > 0, tp / (tp + fn), 0.0)
        n = max(len(tp), 1)
        return {
            "average_precision": float(prec.mean()) if len(tp) else 0.0,
            "average_recall": float(np.nan_to_num(rec).mean()) if len(tp) else 0.0,
            "avg_pred_per_obj": float((tp + fp).sum() / n),
            "avg_gt_per_obj": float((tp + fn).sum() / n),
            "frac_predicting_any": float(((tp + fp) > 0).sum() / n),
            "frac_correct_once": float((tp > 0).sum() / n),
            "num_objects": int(len(tp)),
        }


def make_infer_fns(cfg: Config, models: Models):
    """Two jitted device programs: full forward, and attribute prediction."""

    g_mod, da_mod = models.generator, models.d_att

    @jax.jit
    def forward(g_vars, da_vars, batch, z, attribute, attribute_est, rng):
        out = g_mod.apply(
            g_vars,
            batch["imgs"],
            batch["objs"],
            batch["boxes"],
            batch["masks"],
            batch["valid"],
            z,
            attribute,
            batch["masks_shift"],
            batch["boxes_shift"],
            attribute_est,
            train=False,
            rngs={"reparam": rng},
        )
        b, o = batch["objs"].shape
        s = cfg.object_size
        att_logits_rand = da_mod.apply(
            da_vars, out["crops_rand"].reshape(b * o, s, s, 3), False
        )
        return out, att_logits_rand

    @jax.jit
    def estimate(da_vars, imgs, boxes, attribute, valid):
        crops = crop_bbox_dense(imgs, boxes, cfg.object_size)
        b, o = valid.shape
        s = cfg.object_size
        logits = da_mod.apply(da_vars, crops.reshape(b * o, s, s, 3), False)
        est = estimate_attributes(
            logits, attribute.reshape(b * o, -1), valid.reshape(-1)
        )
        return est.reshape(b, o, -1)

    return forward, estimate


def run_inference(
    cfg: Config,
    models: Models,
    state: TrainState,
    loader,
    result_dir: str,
    *,
    max_batches: int | None = None,
    edit_target: int = DEFAULT_EDIT_TARGET,
    save_images: bool = True,
    draw_boxes: bool = False,
    vocab: dict | None = None,
    seed: int = 0,
):
    """Returns the attribute precision/recall summary + edit success rate."""
    os.makedirs(result_dir, exist_ok=True)
    g_vars = {"params": state.g.params, "batch_stats": state.g.stats}
    da_vars = {"params": state.d_att.params, "batch_stats": state.d_att.stats}
    forward, estimate = make_infer_fns(cfg, models)

    metrics = AttributeMetrics()
    n_edit_candidates = 0
    n_edit_success = 0
    rng = jax.random.PRNGKey(seed)

    for bi, batch_np in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        b, o = batch["objs"].shape
        valid_f = np.asarray(batch["valid"]).reshape(-1) > 0
        rng, kz, kr, kz2, kr2 = jax.random.split(rng, 5)

        attribute_est = estimate(
            da_vars, batch["imgs"], batch["boxes"], batch["attribute"], batch["valid"]
        )
        z = jax.random.normal(kz, (b, o, cfg.z_dim))
        out, att_logits_rand = forward(
            g_vars, da_vars, batch, z, batch["attribute"], attribute_est, kr
        )

        # attribute precision/recall on annotated objects (sigmoid > 0.9)
        att_np = np.asarray(batch["attribute"]).reshape(b * o, -1)
        annotated = (att_np.sum(-1) > 0) & valid_f
        from scipy.special import expit

        probs = expit(np.asarray(att_logits_rand))
        metrics.update((probs[annotated] > 0.9).astype(np.float32), att_np[annotated])

        # attribute modification: remove colors, set target (test64.py:170-185).
        # The color-id list and default target are VG's 106-attribute vocab;
        # on smaller vocabs (synthetic corpora) keep only in-range ids so the
        # edit demo still exercises the pipeline instead of crashing.
        att_dim = int(batch["attribute"].shape[-1])
        color_ids = [i for i in COLOR_ATTRIBUTE_IDS if i < att_dim]
        tgt = edit_target if edit_target < att_dim else att_dim - 1
        att_mod = np.asarray(batch["attribute"]).copy()
        est_mod = np.asarray(attribute_est).copy()
        for a in (att_mod, est_mod):
            if color_ids:
                a[..., color_ids] = 0
            a[..., tgt] = 1
        z2 = jax.random.normal(kz2, (b, o, cfg.z_dim))
        out_mod, att_logits_mod = forward(
            g_vars, da_vars, batch, z2, jnp.asarray(att_mod), jnp.asarray(est_mod), kr2
        )

        # success rule: target enters top-3 (modified) and was outside top-5
        logits = np.asarray(att_logits_rand)
        logits_mod = np.asarray(att_logits_mod)
        top5 = np.argsort(-logits, axis=1)[:, :5]
        top3 = np.argsort(-logits_mod, axis=1)[:, :3]
        candidates = valid_f & ~(top5 == tgt).any(1)
        success = candidates & (top3 == tgt).any(1)
        n_edit_candidates += int(candidates.sum())
        n_edit_success += int(success.sum())

        if save_images:
            success_per_img = success.reshape(b, o).any(1)
            for name, arr in [
                ("rand", out["img_rand"]),
                ("shift", out["img_shift"]),
                ("rec", out["img_rec"]),
                ("real", batch["imgs"]),
            ]:
                u8 = np.asarray(imagenet_deprocess_batch(arr))
                if draw_boxes:  # test_with_boxes_drawn.py capability
                    from aglayout_tpu.utils.draw import draw_boxes_batch

                    bx = batch_np["boxes_shift" if name == "shift" else "boxes"]
                    u8 = draw_boxes_batch(
                        u8, bx, batch_np["valid"], batch_np["objs"], vocab
                    )
                for j in range(b):
                    save_png(
                        os.path.join(result_dir, f"img{bi * b + j:06d}_{name}.png"), u8[j]
                    )
            for name, arr in [
                ("rand_modified", out_mod["img_rand"]),
                ("rec_modified", out_mod["img_rec"]),
                ("shift_modified", out_mod["img_shift"]),
            ]:
                u8 = np.asarray(imagenet_deprocess_batch(arr))
                for j in range(b):
                    if success_per_img[j]:
                        save_png(
                            os.path.join(result_dir, f"img{bi * b + j:06d}_{name}.png"), u8[j]
                        )

    summary = metrics.summary()
    summary["edit_success_rate"] = n_edit_success / max(n_edit_candidates, 1)
    summary["edit_candidates"] = n_edit_candidates
    return summary
