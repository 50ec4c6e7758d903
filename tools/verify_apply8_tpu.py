"""On-TPU correctness check for the spade_apply8 decoder path.

Runs the full 128^2 generate() with pallas_apply8 ON vs OFF (same params,
same inputs) and prints the max-abs pixel delta as ONE device-reduced
scalar (device->host fetch on the axon tunnel is ~KB/s, so nothing bigger
crosses the wire). The kernel replaces relu(SPADE_eval(h)) with a folded
compact-table reformulation (same math, different association), then two
more convs follow — tolerance 5e-3 on [-1, 1]-range pixels, matching the
unit test's 1e-4 at the kernel boundary plus downstream accumulation.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from aglayout_tpu.config import config_for
    from aglayout_tpu.models.generator import Generator
    from aglayout_tpu.train.state import Models, create_train_state

    b, o = 8, 10
    rng = np.random.RandomState(0)
    outs = {}
    for apply8 in (False, True):
        cfg = config_for(128, batch_size=b, max_objects=o)
        cfg.pallas_apply8 = apply8
        models = Models(cfg)
        state = create_train_state(cfg, models, jax.random.PRNGKey(0))
        variables = {"params": state.g.params, "batch_stats": state.g.stats}

        objs = jnp.asarray(rng.randint(0, cfg.num_classes, (b, o)), jnp.int32)
        xy0 = rng.uniform(0, 0.6, (b, o, 2)).astype(np.float32)
        wh = rng.uniform(0.1, 0.4, (b, o, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy0, np.minimum(xy0 + wh, 1.0)], -1))
        valid = jnp.ones((b, o), jnp.float32)
        z = jnp.asarray(rng.randn(b, o, cfg.z_dim).astype(np.float32))
        attr = jnp.asarray((rng.rand(b, o, cfg.attribute_dim) < 0.05).astype(np.float32))
        rng = np.random.RandomState(0)  # same inputs both rounds

        fn = jax.jit(
            lambda v, *a, m=models: m.generator.apply(v, *a, method=Generator.generate)
        )
        outs[apply8] = fn(variables, objs, boxes, valid, z, attr)

    d = float(
        jnp.abs(outs[True].astype(jnp.float32) - outs[False].astype(jnp.float32)).max()
    )
    print(f"apply8-vs-dense max abs delta: {d:.6g}  ({'OK' if d < 5e-3 else 'FAIL'})")


if __name__ == "__main__":
    main()
