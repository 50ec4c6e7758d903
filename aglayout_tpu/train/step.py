"""The jitted GAN train step: D update + G update in one compiled program.

Mirrors one iteration of the reference driver (train64.py:130-414):

  1. draw per-object z ~ N(0,1)
  2. estimate attributes for unannotated objects with netD_att on real crops
  3. swap attributes for half the objects of the first B//3 images
  4. D step: BCE real/fake on image D (0.4/0.4/0.2 branch weights), object D
     real/fake + n_class CE aux, pos-weighted attribute BCE on annotated
     real crops; Adam step for all three Ds
  5. G step: generator losses against the *updated* Ds; masked L1 image
     rec, z-rec L1, KL, adversarial + aux losses on all branches; Adam
     step for G. By default the G gradients are pulled back through the
     D-phase forward with jax.vjp instead of re-running it (the torch
     original re-runs the forward at train64.py:280 only because the D
     phase detached its outputs at :191). Deltas vs the reference cadence,
     both restorable with Config.double_g_forward: the VAE reparam eps is
     shared between phases instead of redrawn, and BN running stats update
     once per step instead of twice — training-mode math uses batch
     statistics, so the dynamics are statistically identical.

TPU-first batching: the discriminators contain no BatchNorm, so the
rec/rand/shift(/real) branches are concatenated along the batch axis and
each D runs ONCE per phase — identical math to the reference's 7 separate
forwards per D, but ~4x larger MXU batches and a ~4x smaller compiled
graph. Spectral-norm power iteration therefore advances once per D phase
(the reference advances it at every forward; documented cadence choice,
SURVEY.md §7 hard part #3).

The generator runs in train mode in both phases (BN running stats update
twice per iteration, like the reference). Under GSPMD data parallelism the
batch axis is sharded and every batch-wide reduction (BN statistics, loss
means) is computed globally by XLA collectives — cross-replica BN without
explicit communication code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from aglayout_tpu.config import Config
from aglayout_tpu.ops.bilinear import crop_bbox_dense
from aglayout_tpu.train.attributes import estimate_attributes, swap_attributes
from aglayout_tpu.train.losses import (
    bce_logits,
    branch_weighted,
    cross_entropy,
    kl_loss,
    masked_l1_image_rec,
    z_rec_loss,
)
from aglayout_tpu.train.state import Models, NetState, TrainState


def make_train_step(cfg: Config, models: Models, matrix, pos_weight):
    """Returns train_step(state, batch) -> (state, metrics), jit-ready.

    matrix: (num_classes, attribute_dim) co-occurrence counts;
    pos_weight: (attribute_dim,) positive-class weights.
    """
    assert not getattr(cfg, "int8_serving", False), (
        "int8_serving is an approximate SERVING path; training must be exact"
    )
    matrix = jnp.asarray(matrix, jnp.float32)
    pos_weight = jnp.asarray(pos_weight, jnp.float32)
    g_mod, di_mod, do_mod, da_mod = (
        models.generator,
        models.d_image,
        models.d_object,
        models.d_att,
    )

    def _g_forward(params, stats, batch, z, attribute, attribute_est, rng):
        out, mut = g_mod.apply(
            {"params": params, "batch_stats": stats},
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
            train=True,
            rngs={"reparam": rng},
            mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]

    # cfg.remat: rematerialize the generator forward on the backward pass —
    # trades ~30% more FLOPs for not keeping the three decoder branches'
    # activations live, enabling larger per-chip batches at 128^2
    g_forward = jax.checkpoint(_g_forward) if getattr(cfg, "remat", False) else _g_forward

    def d_apply(mod, net: NetState, x, update: bool):
        if update:
            out, mut = mod.apply(
                {"params": net.params, "batch_stats": net.stats},
                x,
                True,
                mutable=["batch_stats"],
            )
            return out, mut["batch_stats"]
        out = mod.apply({"params": net.params, "batch_stats": net.stats}, x, False)
        return out, net.stats

    def train_step(state: TrainState, batch):
        b, o = batch["objs"].shape
        n = b * o
        if "masks" not in batch:
            # device-side rasterization (Config.device_masks): the loop
            # uploads only boxes (1.3 KB/batch) instead of the 2.6 MB of
            # rasterized masks — 85% of the batch bytes on the tunneled
            # transport. Same round-half-even integer box as the loader's
            # rasterizer (ops/rasterize.py docstring).
            from aglayout_tpu.ops.rasterize import rasterize_boxes

            s = cfg.image_size
            batch = dict(
                batch,
                masks=rasterize_boxes(batch["boxes"], s, s)[..., None],
                masks_shift=rasterize_boxes(batch["boxes_shift"], s, s)[..., None],
            )
        rng_z, rng_swap, rng_rep_d, rng_rep_g, rng_next = jax.random.split(state.rng, 5)
        valid_f = batch["valid"].reshape(-1)
        objs_f = batch["objs"].reshape(-1)
        attribute_f = batch["attribute"].reshape(n, -1)

        z = jax.random.normal(rng_z, (b, o, cfg.z_dim), jnp.float32)

        # ---- attribute estimation (train64.py:155-166). ONE AttD forward
        # on real crops serves BOTH the estimation and the D-phase
        # attribute loss: the crops here are bit-identical to the
        # generator's crops_input (same crop_bbox_dense call), and the
        # reference's est forward runs netD_att in train mode (its
        # spectral-norm hook advances u there too, train64.py:161), so the
        # shared update=True forward matches its cadence more closely than
        # a separate no-update pass. Saves a full 320-crop AttD forward
        # (1.4 TF, ~2.3% of the 60.8 TF step — see ROOFLINE.md train
        # section). The gradient contribution flows through att_vjp below.
        crops_real = crop_bbox_dense(batch["imgs"], batch["boxes"], cfg.object_size)
        crops_real_f = crops_real.reshape(n, cfg.object_size, cfg.object_size, 3)

        def _att_real_fwd(da_params):
            out, mut = da_mod.apply(
                {"params": da_params, "batch_stats": state.d_att.stats},
                crops_real_f,
                True,
                mutable=["batch_stats"],
            )
            return out, mut["batch_stats"]

        (a_real, da_stats), att_vjp = jax.vjp(_att_real_fwd, state.d_att.params)
        est_logits = jax.lax.stop_gradient(a_real)
        attribute_est = estimate_attributes(est_logits, attribute_f, valid_f)

        # ---- attribute swap (train64.py:169-188)
        attribute_gt = attribute_f
        attribute_sw, attribute_est_sw, num_img_to_change = swap_attributes(
            rng_swap, matrix, attribute_f, attribute_est, objs_f, valid_f, b, o
        )
        att_d = attribute_sw.reshape(b, o, -1)
        annotated_gt = (jnp.sum(attribute_gt, axis=-1) > 0) & (valid_f > 0)
        annotated_sw = (jnp.sum(attribute_sw, axis=-1) > 0) & (valid_f > 0)

        def flat_crops(x):
            return x.reshape(n, cfg.object_size, cfg.object_size, 3)

        # =========================== D phase ===========================
        def _fwd(g_params):
            return g_forward(
                g_params,
                state.g.stats,
                batch,
                z,
                att_d,
                attribute_est_sw.reshape(b, o, -1),
                rng_rep_d,
            )

        if getattr(cfg, "double_g_forward", False):
            g_out, g_stats_1 = _fwd(state.g.params)
            g_vjp = None
        else:
            (g_out, g_stats_1), g_vjp = jax.vjp(_fwd, state.g.params)
        g_sg = jax.tree.map(jax.lax.stop_gradient, g_out)

        # attribute-D loss on real annotated crops with GT attrs
        # (train64.py:240-245), on the shared forward above; its da-param
        # gradients are pulled through att_vjp and added to the d_loss_fn
        # gradients (which no longer contain an AttD forward).
        d_att_cls, a_real_ct = jax.value_and_grad(
            lambda a: bce_logits(a, attribute_gt, annotated_gt, pos_weight)
        )(a_real)
        (da_grads_att,) = att_vjp(
            (cfg.lambda_att_cls * a_real_ct, jax.tree.map(jnp.zeros_like, da_stats))
        )

        def d_loss_fn(d_params):
            di = state.d_image.replace(params=d_params["di"])
            do = state.d_object.replace(params=d_params["do"])

            # image D: one forward on [rec | rand | shift | real] (no BN in
            # D, so this equals the reference's 4 forwards, train64.py:194-212)
            img_all = jnp.concatenate(
                [g_sg["img_rec"], g_sg["img_rand"], g_sg["img_shift"], batch["imgs"]], axis=0
            )
            logits_img, di_stats = d_apply(di_mod, di, img_all, update=True)
            l_rec, l_rand, l_shift, l_real = jnp.split(logits_img, 4, axis=0)
            d_img_fake = branch_weighted(
                bce_logits(l_rec, 0.0), bce_logits(l_rand, 0.0), bce_logits(l_shift, 0.0)
            )
            d_img_real = bce_logits(l_real, 1.0)

            # object D: one forward on [rec | rand | shift | real] crops
            # (train64.py:214-238)
            crops_all = jnp.concatenate(
                [
                    flat_crops(g_sg["crops_input_rec"]),
                    flat_crops(g_sg["crops_rand"]),
                    flat_crops(g_sg["crops_shift"]),
                    flat_crops(g_sg["crops_input"]),
                ],
                axis=0,
            )
            (src_all, cls_all), do_stats = d_apply(do_mod, do, crops_all, update=True)
            s_rec, s_rand, s_shift, s_real = jnp.split(src_all, 4, axis=0)
            c_real = cls_all[3 * n :]
            d_obj_fake = branch_weighted(
                bce_logits(s_rec, 0.0, valid_f),
                bce_logits(s_rand, 0.0, valid_f),
                bce_logits(s_shift, 0.0, valid_f),
            )
            d_obj_real = bce_logits(s_real, 1.0, valid_f)
            d_obj_cls = cross_entropy(c_real, objs_f, valid_f)

            # attribute-D term: value from the shared real-crop forward
            # (constant w.r.t. d_params here; its da gradients were added
            # via att_vjp above)
            d_loss = (
                cfg.lambda_img_adv * (d_img_fake + d_img_real)
                + cfg.lambda_obj_adv * (d_obj_fake + d_obj_real)
                + cfg.lambda_obj_cls * d_obj_cls
                + cfg.lambda_att_cls * d_att_cls
            )
            aux = {
                "stats": {"di": di_stats, "do": do_stats, "da": da_stats},
                "metrics": {
                    "D/loss": d_loss,
                    "D/image_adv_loss_real": d_img_real,
                    "D/image_adv_loss_fake": d_img_fake,
                    "D/object_adv_loss_real": d_obj_real,
                    "D/object_adv_loss_fake": d_obj_fake,
                    "D/object_cls_loss_real": d_obj_cls,
                    "D/object_att_cls_loss": d_att_cls,
                },
            }
            return d_loss, aux

        d_params = {
            "di": state.d_image.params,
            "do": state.d_object.params,
            "da": state.d_att.params,
        }
        (_, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(d_params)
        # fold in the attribute-D gradients from the shared real-crop vjp
        d_grads["da"] = jax.tree.map(jnp.add, d_grads["da"], da_grads_att)

        def adam_update(net: NetState, grads, new_stats):
            updates, new_opt = models.tx.update(grads, net.opt, net.params)
            return NetState(
                params=optax.apply_updates(net.params, updates),
                stats=new_stats,
                opt=new_opt,
            )

        new_di = adam_update(state.d_image, d_grads["di"], d_aux["stats"]["di"])
        new_do = adam_update(state.d_object, d_grads["do"], d_aux["stats"]["do"])
        new_da = adam_update(state.d_att, d_grads["da"], d_aux["stats"]["da"])

        # =========================== G phase ===========================
        def g_losses_from_out(out):
            """All G losses as a function of the generator outputs, against
            the UPDATED discriminators (train64.py:283-364)."""
            g_img_rec = masked_l1_image_rec(out["img_rec"], batch["imgs"], num_img_to_change)
            g_z_rec = z_rec_loss(
                out["z_rand_rec"], out["z_rand_shift"], z.reshape(n, -1), valid_f
            )
            g_kl = kl_loss(out["mu"], out["logvar"], valid_f)

            # image adversarial towards "real": one forward on 3 branches
            # (train64.py:297-313)
            img_all = jnp.concatenate(
                [out["img_rec"], out["img_rand"], out["img_shift"]], axis=0
            )
            l_rec, l_rand, l_shift = jnp.split(
                d_apply(di_mod, new_di, img_all, update=False)[0], 3, axis=0
            )
            g_img_adv = branch_weighted(
                bce_logits(l_rec, 1.0), bce_logits(l_rand, 1.0), bce_logits(l_shift, 1.0)
            )

            # object + attribute heads on [rec | rand | shift] crops
            # (train64.py:316-354)
            crops_all = jnp.concatenate(
                [
                    flat_crops(out["crops_input_rec"]),
                    flat_crops(out["crops_rand"]),
                    flat_crops(out["crops_shift"]),
                ],
                axis=0,
            )
            (src_all, cls_all), _ = d_apply(do_mod, new_do, crops_all, update=False)
            att_all, _ = d_apply(da_mod, new_da, crops_all, update=False)
            adv = [bce_logits(x, 1.0, valid_f) for x in jnp.split(src_all, 3, axis=0)]
            cls = [cross_entropy(x, objs_f, valid_f) for x in jnp.split(cls_all, 3, axis=0)]
            att = [
                bce_logits(x, attribute_sw, annotated_sw, pos_weight)
                for x in jnp.split(att_all, 3, axis=0)
            ]
            g_obj_adv = branch_weighted(*adv)
            g_obj_cls = branch_weighted(*cls)
            g_att_cls = branch_weighted(*att)

            g_loss = (
                cfg.lambda_img_rec * g_img_rec
                + cfg.lambda_z_rec * g_z_rec
                + cfg.lambda_img_adv * g_img_adv
                + cfg.lambda_obj_adv * g_obj_adv
                + cfg.lambda_obj_cls * g_obj_cls
                + cfg.lambda_att_cls * g_att_cls
                + cfg.lambda_kl * g_kl
            )
            metrics = {
                "G/loss": g_loss,
                "G/image_adv_loss": g_img_adv,
                "G/object_adv_loss": g_obj_adv,
                "G/object_cls_loss": g_obj_cls,
                "G/rec_img": g_img_rec,
                "G/rec_z": g_z_rec,
                "G/kl": g_kl,
                "G/object_att_cls_loss": g_att_cls,
            }
            # generated-image grids for TensorBoard (train64.py:390-402);
            # already computed by the G forward. Deprocessed to uint8 ON
            # DEVICE and capped to the first 8 images (the reference's
            # batch size): the loop previously fetched ~37 MB of f32 per
            # log window over a device->host transport that runs at ~KB/s
            # on tunneled TPUs; this makes each grid fetch ~15x smaller.
            from aglayout_tpu.ops.image import imagenet_deprocess_batch

            gi = min(8, b)
            s_obj = cfg.object_size

            def grid_imgs(x):
                return imagenet_deprocess_batch(jax.lax.stop_gradient(x[:gi]))

            def grid_crops(x):
                return imagenet_deprocess_batch(
                    jax.lax.stop_gradient(x[:gi]).reshape(gi * o, s_obj, s_obj, 3)
                )

            images = {
                "img_real": grid_imgs(batch["imgs"]),
                "crop_real": grid_crops(out["crops_input"]),
                "crop_real_rec": grid_crops(out["crops_input_rec"]),
                "crop_rand": grid_crops(out["crops_rand"]),
                "img_real_rec": grid_imgs(out["img_rec"]),
                "img_fake_rand": grid_imgs(out["img_rand"]),
            }
            return g_loss, {"metrics": metrics, "images": images}

        if getattr(cfg, "double_g_forward", False):
            # reference cadence: a second full forward (fresh reparam eps,
            # second BN running-stat update), differentiated end to end
            def g_loss_fn(g_params):
                out, g_stats_2 = g_forward(
                    g_params,
                    g_stats_1,
                    batch,
                    z,
                    att_d,
                    attribute_est_sw.reshape(b, o, -1),
                    rng_rep_g,
                )
                g_loss, aux = g_losses_from_out(out)
                return g_loss, {**aux, "stats": g_stats_2}

            (_, g_aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.g.params
            )
            g_stats_out = g_aux["stats"]
        else:
            # single-forward path: the D-phase forward IS the G-phase
            # forward (the torch original re-runs it only because the D
            # phase detached its outputs; here the vjp pulls the G-loss
            # cotangents back through the one forward). Shares the reparam
            # eps between phases and updates BN running stats once.
            (g_loss_val, g_aux), out_ct = jax.value_and_grad(
                g_losses_from_out, has_aux=True
            )(g_out)
            stats_ct = jax.tree.map(jnp.zeros_like, g_stats_1)
            (g_grads,) = g_vjp((out_ct, stats_ct))
            g_stats_out = g_stats_1

        new_g = adam_update(state.g, g_grads, g_stats_out)

        metrics = {**d_aux["metrics"], **g_aux["metrics"], "images": g_aux["images"]}
        new_state = state.replace(
            step=state.step + 1,
            rng=rng_next,
            g=new_g,
            d_image=new_di,
            d_object=new_do,
            d_att=new_da,
        )
        return new_state, metrics

    return train_step
