"""Benchmark harness: 128x128 generator inference throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): >= 5000 images/sec/chip at 128x128 generator
inference. vs_baseline = value / 5000.

Measurement methodology (important on tunneled/remote TPU transports where
async dispatch never blocks and host<->device transfers are slow): all
`iters` generator invocations run inside ONE jitted `lax.scan` over a
pre-uploaded stack of z vectors, returning a single scalar checksum; only
that scalar crosses the wire. Timing = second invocation (compile cached,
operands device-resident).
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
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--f32", action="store_true", help="disable bf16 compute")
    p.add_argument(
        "--int8",
        action="store_true",
        help="opt-in approximate int8 serving path (Pallas quantized c6)",
    )
    p.add_argument(
        "--dense",
        action="store_true",
        help="disable all Pallas serving kernels (XLA-only exact path)",
    )
    # Per-kernel tri-state switches: --<k> forces on, --no_<k> forces that one
    # kernel off (independent bisection from the CLI), neither = auto
    # (--dense still force-disables everything at once).
    def kernel_flag(name, help_on):
        g = p.add_mutually_exclusive_group()
        g.add_argument(f"--{name}", action="store_true", help=help_on)
        g.add_argument(
            f"--no_{name}",
            action="store_true",
            help=f"force {name} off (independent of the other kernels)",
        )

    kernel_flag("heads", "force the Pallas fused RGB-head kernels on")
    kernel_flag("apply8", "force the Pallas SPADE-4 apply kernel on (default: auto, on for TPU)")
    kernel_flag(
        "compact_heads",
        "force compact class-resolution RGB-head tables on (default: auto, on for TPU)",
    )
    kernel_flag(
        "grouped_heads",
        "grouped transposed RGB heads (no input relayout, compact grouped tables)",
    )
    kernel_flag("trunk", "force the fused 8x8 residual-trunk kernel on (default: auto, on for TPU)")
    kernel_flag(
        "phase_dc",
        "force phase-decomposed eval dc1..dc3 on (default OFF: 19% TPU regression at 128^2)",
    )
    p.add_argument(
        "--clstm_unroll",
        type=int,
        default=None,
        help="eval ConvLSTM scan unroll factor (default 1; full unroll measured slower on TPU)",
    )
    p.add_argument("--train_step", action="store_true", help="bench the GAN train step instead")
    p.add_argument("--remat", action="store_true", help="rematerialized G forward (train bench)")
    p.add_argument(
        "--double_g_forward",
        action="store_true",
        help="reference cadence: re-run the G forward in the G phase (train bench)",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from aglayout_tpu.utils.cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    from aglayout_tpu.config import config_for
    from aglayout_tpu.models.generator import Generator
    from aglayout_tpu.train.state import Models, create_train_state

    # tri-state resolution: --<k> on > --no_<k>/--dense off > None = auto
    def tri(name):
        if getattr(args, name):
            return True
        if getattr(args, f"no_{name}") or args.dense:
            return False
        return None

    cfg = config_for(
        args.image_size,
        batch_size=args.batch_size,
        max_objects=args.max_objects,
        bf16=not args.f32,
        remat=args.remat,
        double_g_forward=args.double_g_forward,
        int8_serving=args.int8,
        pallas_heads=tri("heads"),
        pallas_apply8=tri("apply8"),
        pallas_compact_heads=tri("compact_heads"),
        pallas_grouped_heads=tri("grouped_heads"),
        pallas_trunk=tri("trunk"),
        phase_dc=tri("phase_dc"),
        clstm_unroll=args.clstm_unroll,
    )
    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))

    b, o = args.batch_size, args.max_objects
    rng = np.random.RandomState(0)
    objs = jnp.asarray(rng.randint(0, cfg.num_classes, (b, o)), jnp.int32)
    xy0 = rng.uniform(0, 0.6, (b, o, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.4, (b, o, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy0, np.minimum(xy0 + wh, 1.0)], -1))
    valid = jnp.ones((b, o), jnp.float32)
    attr = jnp.asarray((rng.rand(b, o, cfg.attribute_dim) < 0.05).astype(np.float32))

    if args.train_step:
        from aglayout_tpu.data.synthetic import synthetic_batch, synthetic_cooccurrence
        from aglayout_tpu.data.vocab import attribute_pos_weight
        from aglayout_tpu.train.step import make_train_step

        step = make_train_step(
            cfg, models, synthetic_cooccurrence(rng, cfg.num_classes), attribute_pos_weight()
        )
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_batch(rng, b, o, cfg.image_size, cfg.num_classes).items()
        }

        @jax.jit
        def bench_many(state, batch):
            def body(carry, _):
                st, s = carry
                st, metrics = step(st, batch)
                return (st, s + metrics["G/loss"]), None

            (st, s), _ = jax.lax.scan(body, (state, 0.0), None, length=args.iters)
            return s

        metric_name = (
            f"{args.image_size}x{args.image_size} GAN train steps/sec/chip (batch {b})"
        )
        float(bench_many(state, batch))  # compile + warm
        t_fn = lambda: float(bench_many(state, batch))  # noqa: E731
        per_call_items = 1.0  # steps
        baseline = None
    else:

        @jax.jit
        def bench_many(v, objs, boxes, valid, zstack, attr):
            def body(carry, z):
                img = models.generator.apply(
                    v, objs, boxes, valid, z, attr, method=Generator.generate
                )
                return carry + jnp.sum(img.astype(jnp.float32)), None

            s, _ = jax.lax.scan(body, 0.0, zstack)
            return s

        variables = {"params": state.g.params, "batch_stats": state.g.stats}
        zstack1 = jax.device_put(
            jnp.asarray(rng.randn(args.iters, b, o, cfg.z_dim).astype(np.float32))
        )
        zstack2 = jax.device_put(
            jnp.asarray(rng.randn(args.iters, b, o, cfg.z_dim).astype(np.float32))
        )
        metric_name = (
            f"{args.image_size}x{args.image_size} generator inference images/sec/chip"
        )
        # warm: compile + ensure operands resident
        float(bench_many(variables, objs, boxes, valid, zstack1, attr))
        t_fn = lambda: float(  # noqa: E731
            bench_many(variables, objs, boxes, valid, zstack2, attr)
        )
        per_call_items = float(b)
        baseline = 5000.0

    t0 = time.perf_counter()
    checksum = t_fn()
    dt = (time.perf_counter() - t0) / args.iters
    assert np.isfinite(checksum), checksum

    value = per_call_items / dt
    out = {
        "metric": metric_name,
        "value": round(value, 1),
        "unit": "images/sec" if not args.train_step else "steps/sec",
    }
    out["vs_baseline"] = round(value / baseline, 3) if baseline else round(value, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
