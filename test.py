"""Inference entry point — test64.py/test128.py equivalent (one binary).

  python test.py --image_size 64     # == reference test64.py
  python test.py --image_size 128    # == reference test128.py

Generates _rand/_shift/_rec/_real PNGs per sample, runs the attribute
modification demo (+_modified PNGs on success), and prints per-object
attribute precision/recall + edit success rate.
"""

import argparse
import json
import os

import jax


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image_size", type=int, default=64, choices=[64, 128])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--vg_dir", type=str, default="data/vg")
    p.add_argument("--path", type=str, default="checkpoints")
    p.add_argument("--resume", type=str, default="l")
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--edit_target", type=int, default=95, help="95 = black")
    p.add_argument("--no_images", action="store_true")
    p.add_argument("--draw_boxes", action="store_true",
                   help="draw colored layout boxes on saved images (test_with_boxes_drawn)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--torch_netG", type=str, default=None, help="reference netG .pkl to import")
    p.add_argument("--torch_netD_att", type=str, default=None)
    args = p.parse_args()

    from aglayout_tpu.config import config_for
    from aglayout_tpu.infer.generate import run_inference
    from aglayout_tpu.train.loop import prepare_dirs
    from aglayout_tpu.train.state import Models, create_train_state
    from aglayout_tpu.utils.checkpoint import restore_state

    cfg = config_for(
        args.image_size, batch_size=args.batch_size, vg_dir=args.vg_dir, path=args.path
    )

    if args.synthetic:
        import numpy as np

        from aglayout_tpu.data.synthetic import synthetic_batch

        def loader():
            rng = np.random.RandomState(0)
            while True:
                yield synthetic_batch(
                    rng, cfg.batch_size, cfg.max_objects, cfg.image_size, cfg.num_classes
                )

        data = loader()
        vocab = None
    else:
        from aglayout_tpu.data.dataset import get_dataloaders

        _, val_loader, vocab = get_dataloaders(cfg)
        cfg.num_classes = len(vocab["object_idx_to_name"])
        data = val_loader.epoch(0)

    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    dirs = prepare_dirs(cfg)
    if args.torch_netG:
        from aglayout_tpu.utils.torch_import import (
            import_attribute_discriminator,
            import_generator,
            load_torch_state_dict,
        )

        gp, gs = import_generator(
            load_torch_state_dict(args.torch_netG), cfg.image_size, cfg.clstm_layers
        )
        state = state.replace(g=state.g.replace(params=gp, stats={**state.g.stats, **gs}))
        if args.torch_netD_att:
            ap, as_ = import_attribute_discriminator(
                load_torch_state_dict(args.torch_netD_att), extra_block=(cfg.image_size == 128)
            )
            state = state.replace(d_att=state.d_att.replace(params=ap, stats=as_))
    else:
        state, step = restore_state(dirs["models"], state, args.resume)
        print(f"restored checkpoint at step {step}")

    summary = run_inference(
        cfg,
        models,
        state,
        data,
        dirs["results"],
        max_batches=args.max_batches,
        edit_target=args.edit_target,
        save_images=not args.no_images,
        draw_boxes=args.draw_boxes,
        vocab=None if args.synthetic else vocab,
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
