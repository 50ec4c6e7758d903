"""On-TPU correctness check for the Pallas serving-kernel decoder paths.

Runs the full 128^2 generate() with each staged kernel configuration vs the
dense XLA path (pallas_heads=False — genuinely no Pallas anywhere, not the
auto-on flat head) and prints the max-abs pixel delta
as ONE device-reduced scalar per variant (device->host fetch on the axon
tunnel is ~KB/s, so nothing bigger crosses the wire). The kernels replace
relu(SPADE_eval(h)) (+ the few-out RGB convs) with folded compact-table
reformulations — same math, different association — then further convs
follow; tolerance 5e-3 on [-1, 1]-range pixels, matching the unit tests'
1e-4 at the kernel boundary plus downstream accumulation.

Variants: apply8 (spade_apply8 SPADE-4 apply), compact (compact
class-resolution RGB-head tables), both, grouped (grouped transposed heads).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "dense": {"pallas_heads": False},  # pure XLA path, NO Pallas anywhere
    "apply8": {"pallas_apply8": True},
    "compact": {"pallas_compact_heads": True},
    "apply8+compact": {"pallas_apply8": True, "pallas_compact_heads": True},
    "grouped": {"pallas_grouped_heads": True},
    "trunk": {"pallas_trunk": True},
    "phase_dc": {"phase_dc": True},
    # production auto-on defaults: flat Pallas heads + apply8 + compact +
    # grouped + fused residual trunk + phase-decomposed dc1..dc3
    "all": {
        "pallas_apply8": True,
        "pallas_compact_heads": True,
        "pallas_grouped_heads": True,
        "pallas_trunk": True,
        "phase_dc": True,
    },
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--variants",
        default="apply8,compact,apply8+compact,grouped,trunk,phase_dc,all",
        help="comma-separated subset of: " + ",".join(k for k in VARIANTS if k != "dense"),
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from aglayout_tpu.utils.cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    from aglayout_tpu.config import config_for
    from aglayout_tpu.models.generator import Generator
    from aglayout_tpu.train.state import Models, create_train_state

    b, o = 8, 10
    names = ["dense"] + [v.strip() for v in args.variants.split(",") if v.strip()]
    outs = {}
    for name in names:
        rng = np.random.RandomState(0)  # same inputs every round
        cfg = config_for(128, batch_size=b, max_objects=o)
        cfg.pallas_apply8 = False
        cfg.pallas_compact_heads = False
        cfg.pallas_grouped_heads = False
        cfg.pallas_trunk = False
        cfg.phase_dc = False
        for k, v in VARIANTS[name].items():
            setattr(cfg, k, v)
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

        fn = jax.jit(
            lambda v, *a, m=models: m.generator.apply(v, *a, method=Generator.generate)
        )
        outs[name] = fn(variables, objs, boxes, valid, z, attr)

    ok = True
    for name in names[1:]:
        d = float(
            jnp.abs(outs[name].astype(jnp.float32) - outs["dense"].astype(jnp.float32)).max()
        )
        good = d < 5e-3
        ok &= good
        print(f"{name}-vs-dense max abs delta: {d:.6g}  ({'OK' if good else 'FAIL'})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
