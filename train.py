"""Training entry point — train64.py/train128.py equivalent (one binary).

  python train.py --image_size 64    # == reference train64.py
  python train.py --image_size 128   # == reference train128.py (data-parallel)
"""

import argparse
import dataclasses

from aglayout_tpu.config import Config, config_for


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    defaults = Config()
    p.add_argument("--image_size", type=int, default=64, choices=[64, 128])
    for f in dataclasses.fields(Config):
        if f.name in ("image_size",):
            continue
        typ = type(f.default)
        if typ is bool or f.default is None:
            # tri-state None defaults (e.g. pallas_heads) parse as bools
            p.add_argument(f"--{f.name}", type=lambda v: v.lower() == "true", default=f.default)
        else:
            p.add_argument(f"--{f.name}", type=typ, default=f.default)
    p.add_argument("--use_tensorboard", type=lambda v: v.lower() == "true", default=True)
    p.add_argument("--synthetic", action="store_true", help="train on synthetic data (smoke)")
    p.add_argument("--profile", type=str, default=None,
                   help="capture a jax.profiler trace of ~20 steps to this directory")
    return p


def main():
    args = build_parser().parse_args()
    kw = {
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(Config)
        if f.name != "image_size"
    }
    # object_size follows resolution unless explicitly overridden
    if kw.get("object_size") == Config.object_size and args.image_size == 128:
        kw["object_size"] = 64
    cfg = config_for(args.image_size, **{k: v for k, v in kw.items() if k != "object_size"})
    cfg.object_size = kw["object_size"]
    print(cfg)

    loader = None
    if args.synthetic:
        import numpy as np

        from aglayout_tpu.data.synthetic import synthetic_batch

        def synth():
            rng = np.random.RandomState(cfg.seed)
            while True:
                yield synthetic_batch(
                    rng, cfg.batch_size, cfg.max_objects, cfg.image_size, cfg.num_classes
                )

        loader = synth()

    from aglayout_tpu.train.loop import train

    if args.profile:
        from aglayout_tpu.utils.profiling import trace

        with trace(args.profile):
            train(cfg, loader=loader, niter=min(cfg.niter, 20),
                  use_tensorboard=args.use_tensorboard)
    else:
        train(cfg, loader=loader, use_tensorboard=args.use_tensorboard)


if __name__ == "__main__":
    main()
