"""Benchmark harness: 128x128 generator inference throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): >= 5000 images/sec/chip at 128x128 generator
inference. vs_baseline = value / 5000.
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--max_objects", type=int, default=10)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--f32", action="store_true", help="disable bf16 compute")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from aglayout_tpu.config import config_for
    from aglayout_tpu.models.generator import Generator
    from aglayout_tpu.train.state import Models, create_train_state

    cfg = config_for(
        args.image_size,
        batch_size=args.batch_size,
        max_objects=args.max_objects,
        bf16=not args.f32,
    )
    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    variables = {"params": state.g.params, "batch_stats": state.g.stats}

    b, o = args.batch_size, args.max_objects
    rng = np.random.RandomState(0)
    objs = jnp.asarray(rng.randint(0, cfg.num_classes, (b, o)), jnp.int32)
    xy0 = rng.uniform(0, 0.6, (b, o, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.4, (b, o, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy0, np.minimum(xy0 + wh, 1.0)], -1))
    valid = jnp.ones((b, o), jnp.float32)
    z = jnp.asarray(rng.randn(b, o, cfg.z_dim).astype(np.float32))
    attr = jnp.asarray((rng.rand(b, o, cfg.attribute_dim) < 0.05).astype(np.float32))

    @jax.jit
    def generate(v, objs, boxes, valid, z, attr):
        return models.generator.apply(
            v, objs, boxes, valid, z, attr, method=Generator.generate
        )

    out = generate(variables, objs, boxes, valid, z, attr)
    out.block_until_ready()
    for _ in range(args.warmup):
        out = generate(variables, objs, boxes, valid, z, attr)
    out.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = generate(variables, objs, boxes, valid, z, attr)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / args.iters
    ips = b / dt

    print(
        json.dumps(
            {
                "metric": f"{args.image_size}x{args.image_size} generator inference images/sec/chip",
                "value": round(ips, 1),
                "unit": "images/sec",
                "vs_baseline": round(ips / 5000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
