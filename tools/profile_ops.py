"""Capture a jax.profiler trace of the 128^2 serving path and print the
per-HLO-op time breakdown from the TPU device plane.

Usage:
  python tools/profile_ops.py [--image_size 128] [--batch_size 128] [--top 40]
  python tools/profile_ops.py --parse_only /tmp/aglayout_prof   # re-aggregate

The xplane parser is built from tools/xplane.proto (the public tsl profiler
schema) with protoc at first use — no tensorflow dependency.
"""

import argparse
import collections
import glob
import os
import re
import subprocess
import sys

TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(TOOLS))  # repo root


def _xplane_pb2():
    out = os.path.join(TOOLS, "_gen")
    os.makedirs(out, exist_ok=True)
    gen = os.path.join(out, "xplane_pb2.py")
    if not os.path.exists(gen) or os.path.getmtime(gen) < os.path.getmtime(
        os.path.join(TOOLS, "xplane.proto")
    ):
        subprocess.check_call(
            ["protoc", f"-I{TOOLS}", f"--python_out={out}", "xplane.proto"], cwd=TOOLS
        )
    sys.path.insert(0, out)
    import xplane_pb2  # noqa: E402

    return xplane_pb2


def aggregate(logdir, top=40, line_filter="XLA Ops"):
    pb2 = _xplane_pb2()
    files = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    space = pb2.XSpace()
    with open(files[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        emeta = plane.event_metadata
        by_op = collections.Counter()
        occ = collections.Counter()
        total = 0
        for line in plane.lines:
            if line_filter and line_filter not in line.name:
                continue
            for ev in line.events:
                name = emeta[ev.metadata_id].name
                dur = ev.duration_ps / 1e6  # us
                by_op[name] += dur
                occ[name] += 1
                total += dur
        if not by_op:
            continue
        # busy/idle analysis: union of event intervals on this line
        iv = []
        for line in plane.lines:
            if line_filter and line_filter not in line.name:
                continue
            for ev in line.events:
                iv.append((ev.offset_ps, ev.offset_ps + ev.duration_ps))
        iv.sort()
        busy, span, cur_s, cur_e = 0, 0, None, None
        if iv:
            span = iv[-1][1] - iv[0][0]
            cur_s, cur_e = iv[0]
            for s, e in iv[1:]:
                if s > cur_e:
                    busy += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            busy += cur_e - cur_s
        print(f"\n== plane: {plane.name}  (line filter: {line_filter!r}) ==")
        print(f"total device op time: {total/1e3:.3f} ms")
        print(
            f"line span {span/1e9:.3f} ms, busy {busy/1e9:.3f} ms, "
            f"idle {(span-busy)/1e9:.3f} ms"
        )
        # group fusions by a normalized name (strip trailing .N / digits)
        grouped = collections.Counter()
        for name, dur in by_op.items():
            g = re.sub(r"\.\d+$", "", name)
            grouped[g] += dur
        print(f"{'us_total':>12} {'%':>6} {'count':>6}  op")
        for name, dur in grouped.most_common(top):
            print(f"{dur:12.1f} {100*dur/total:6.2f} {occ[name]:6d}  {name[:140]}")

        # category rollup: op kind x dtype-of-output (parsed from the HLO
        # text), so flat profiles with thousands of small ops still show
        # where the time goes
        cats = collections.Counter()
        cat_n = collections.Counter()
        for name, dur in by_op.items():
            m = re.match(r"%?([a-zA-Z][a-zA-Z0-9_\-]*)", name)
            kind = m.group(1) if m else "?"
            kind = re.sub(r"[_.]\d+$", "", kind)
            # big vs small by the first shape's element count
            sm = re.search(r"(bf16|f32|s32|s8|u8|pred|u32)\[([0-9,]*)\]", name)
            size = 1
            if sm and sm.group(2):
                for d in sm.group(2).split(","):
                    size *= int(d)
            bucket = "big" if size >= (1 << 20) else "small"
            cats[(kind, bucket)] += dur
            cat_n[(kind, bucket)] += occ[name]
        print(f"\n{'us_total':>12} {'%':>6} {'count':>6}  category")
        for (kind, bucket), dur in cats.most_common(30):
            print(
                f"{dur:12.1f} {100*dur/total:6.2f} {cat_n[(kind, bucket)]:6d}  {kind} [{bucket}]"
            )
    return


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--max_objects", type=int, default=10)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--logdir", default="/tmp/aglayout_prof")
    p.add_argument("--parse_only", default=None)
    p.add_argument("--line", default="XLA Ops")
    p.add_argument("--train_step", action="store_true")
    p.add_argument("--f32", action="store_true", help="profile the f32 model (default bf16, matching bench.py)")
    args = p.parse_args()

    if args.parse_only:
        aggregate(args.parse_only, args.top, args.line)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

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
    b, o = args.batch_size, args.max_objects
    rng = np.random.RandomState(0)
    objs = jnp.asarray(rng.randint(0, cfg.num_classes, (b, o)), jnp.int32)
    xy0 = rng.uniform(0, 0.6, (b, o, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.4, (b, o, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy0, np.minimum(xy0 + wh, 1.0)], -1))
    valid = jnp.ones((b, o), jnp.float32)
    attr = jnp.asarray((rng.rand(b, o, cfg.attribute_dim) < 0.05).astype(np.float32))
    z = jnp.asarray(rng.randn(b, o, cfg.z_dim).astype(np.float32))

    if args.train_step:
        from aglayout_tpu.data.synthetic import synthetic_batch, synthetic_cooccurrence
        from aglayout_tpu.data.vocab import attribute_pos_weight
        from aglayout_tpu.train.step import make_train_step

        step = jax.jit(
            make_train_step(
                cfg, models, synthetic_cooccurrence(rng, cfg.num_classes), attribute_pos_weight()
            ),
            donate_argnums=0,
        )
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_batch(rng, b, o, cfg.image_size, cfg.num_classes).items()
        }
        state, m = step(state, batch)
        jax.block_until_ready(m)
        with jax.profiler.trace(args.logdir):
            for _ in range(args.iters):
                state, m = step(state, batch)
            jax.block_until_ready(m)
    else:
        variables = {"params": state.g.params, "batch_stats": state.g.stats}
        fn = jax.jit(
            lambda v, *a: models.generator.apply(v, *a, method=Generator.generate)
        )
        out = fn(variables, objs, boxes, valid, z, attr)
        out.block_until_ready()
        with jax.profiler.trace(args.logdir):
            for _ in range(args.iters):
                out = fn(variables, objs, boxes, valid, z, attr)
            out.block_until_ready()

    aggregate(args.logdir, args.top, args.line)


if __name__ == "__main__":
    main()
