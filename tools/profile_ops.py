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


def gaps(logdir, top=30, line_filter="XLA Ops", min_gap_us=5.0):
    """Name the device-idle windows: for each gap in the merged op-interval
    timeline, report duration and the ops bounding it, then aggregate by
    (prev -> next) op pair. This is how the ROOFLINE's 'scheduling gaps /
    rest' residual gets a breakdown instead of being a subtraction."""
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

    def norm(name):
        return re.sub(r"\.\d+$", "", name)

    # Async DMA / bookkeeping events: their duration spans the whole
    # outstanding window and overlaps compute, so they must not count as
    # the device "doing work". The gaps we want are holes in COMPUTE
    # coverage — windows where only DMA is in flight (= a true stall if
    # anything downstream waits on it).
    _ASYNC = re.compile(r"^%?(copy-start|copy-done|slice-start|slice-done|async-start|async-done|all-gather-start|all-gather-done|send|recv)")

    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        emeta = plane.event_metadata
        evs = []  # (start_ps, end_ps, name), compute ops only
        for line in plane.lines:
            if line_filter and line_filter not in line.name:
                continue
            for ev in line.events:
                name = emeta[ev.metadata_id].name
                if _ASYNC.match(name):
                    continue
                evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps, name))
        if not evs:
            continue
        evs.sort()
        # merge into busy intervals, remembering the last op to end before
        # each gap and the first to start after it
        merged = []  # (start, end, first_name, last_name_by_end)
        cur_s, cur_e, first_n, last_n = evs[0][0], evs[0][1], evs[0][2], evs[0][2]
        for s, e, n in evs[1:]:
            if s > cur_e:
                merged.append((cur_s, cur_e, first_n, last_n))
                cur_s, cur_e, first_n, last_n = s, e, n, n
            else:
                if e > cur_e:
                    cur_e, last_n = e, n
        merged.append((cur_s, cur_e, first_n, last_n))

        gap_list = []
        by_pair = collections.Counter()
        n_pair = collections.Counter()
        total_gap = 0
        for (s0, e0, _, ln), (s1, e1, fn, _) in zip(merged, merged[1:]):
            g = s1 - e0
            total_gap += g
            if g / 1e6 < min_gap_us:
                continue
            gap_list.append((g, ln, fn, e0))
            pair = (norm(ln), norm(fn))
            by_pair[pair] += g
            n_pair[pair] += 1
        span = merged[-1][1] - merged[0][0]
        busy = sum(e - s for s, e, _, _ in merged)
        print(f"\n== plane: {plane.name} ==")
        print(
            f"span {span/1e9:.3f} ms, busy {busy/1e9:.3f} ms, idle {(span-busy)/1e9:.3f} ms "
            f"({100*(span-busy)/span:.1f}%), idle in gaps >= {min_gap_us} us: "
            f"{sum(g for g, *_ in gap_list)/1e9:.3f} ms in {len(gap_list)} gaps"
        )
        print(f"\n{'us_total':>10} {'count':>6}  gap between (prev -> next), aggregated")
        for (ln, fn), dur in by_pair.most_common(top):
            print(f"{dur/1e6:10.1f} {n_pair[(ln, fn)]:6d}  {ln[:90]}")
            print(f"{'':10} {'':6}   -> {fn[:90]}")
        gap_list.sort(reverse=True)
        print(f"\n{'us':>10}  largest individual gaps")
        for g, ln, fn, at in gap_list[:15]:
            print(f"{g/1e6:10.1f}  after {norm(ln)[:70]}")
            print(f"{'':10}  before {norm(fn)[:70]}  @+{at/1e9:.3f} ms")
    return


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
    p.add_argument("--grouped_heads", action="store_true", help="force the 8-image-sublane head on")
    p.add_argument("--dense", action="store_true", help="disable all Pallas serving kernels")
    p.add_argument(
        "--gaps",
        action="store_true",
        help="with --parse_only: report device-idle gaps (duration + bounding ops)",
    )
    p.add_argument("--min_gap_us", type=float, default=5.0)
    args = p.parse_args()

    if args.parse_only:
        if args.gaps:
            gaps(args.parse_only, args.top, args.line, args.min_gap_us)
        else:
            aggregate(args.parse_only, args.top, args.line)
        return

    import jax
    import jax.numpy as jnp
    from aglayout_tpu.utils.cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    import numpy as np

    from aglayout_tpu.config import config_for
    from aglayout_tpu.models.generator import Generator
    from aglayout_tpu.train.state import Models, create_train_state

    cfg = config_for(
        args.image_size,
        batch_size=args.batch_size,
        max_objects=args.max_objects,
        bf16=not args.f32,
        pallas_heads=False if args.dense else None,
        pallas_apply8=False if args.dense else None,
        pallas_compact_heads=False if args.dense else None,
        pallas_grouped_heads=True
        if args.grouped_heads
        else (False if args.dense else None),
        pallas_trunk=False if args.dense else None,
        phase_dc=False if args.dense else None,
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
