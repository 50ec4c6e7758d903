"""Train-step throughput table: dtype x batch x resolution on the real chip.

Round-3 verdict: training throughput was published as a single figure
(1.67 steps/s at 128^2 b=32 f32) with bf16 compute never measured. This
harness measures the jitted GAN train step (the production step from
aglayout_tpu/train/step.py, single-G-forward vjp) across:

  image_size in {64, 128} x batch in {8, 32} x compute in {f32, bf16}

bf16 here means `cfg.bf16`: bf16 conv/matmul compute with f32 parameters,
f32 BN batch-statistics accumulation, and f32 Adam moments (train/state.py:47
threads dtype into the four nets; params stay f32 by flax convention).

Writes artifacts/train_bench.json (consumed by tools/bench_loader.py for
the loader-headroom figure) and prints a markdown table.

Usage: python tools/bench_train_table.py [--iters 10] [--configs ...]
"""

import argparse
import json
import os
import sys
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(TOOLS))

import numpy as np  # noqa: E402


def measure(image_size: int, batch_size: int, bf16: bool, iters: int,
            remat: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    from aglayout_tpu.utils.cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    from aglayout_tpu.config import config_for
    from aglayout_tpu.data.synthetic import synthetic_batch, synthetic_cooccurrence
    from aglayout_tpu.data.vocab import attribute_pos_weight
    from aglayout_tpu.train.state import Models, create_train_state
    from aglayout_tpu.train.step import make_train_step

    cfg = config_for(image_size, batch_size=batch_size, bf16=bf16, remat=remat)
    models = Models(cfg)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    step = make_train_step(
        cfg, models, synthetic_cooccurrence(rng, cfg.num_classes), attribute_pos_weight()
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(
            rng, batch_size, cfg.max_objects, image_size, cfg.num_classes
        ).items()
    }

    # production shape: donated jitted step + Python loop (train/loop.py uses
    # make_sharded_train_step with donate_argnums=(0,)). A lax.scan wrapper
    # without donation keeps TWO copies of the full train state alive and
    # OOMs at 128^2 b=32 even with remat; donation is what makes the real
    # loop fit, so the bench must match it.
    jstep = jax.jit(step, donate_argnums=(0,))

    t0 = time.perf_counter()
    state, metrics = jstep(state, batch)  # compile + warm
    s = float(metrics["G/loss"])
    t_compile = time.perf_counter() - t0
    assert np.isfinite(s), s
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = jstep(state, batch)
    s = float(metrics["G/loss"])  # blocks on the full chain
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(s), s
    return {
        "image_size": image_size,
        "batch_size": batch_size,
        "compute": "bf16" if bf16 else "f32",
        "remat": remat,
        "steps_per_sec": round(1.0 / dt, 3),
        "imgs_per_sec": round(batch_size / dt, 1),
        "warm_call_s": round(t_compile, 1),
    }


def _write(out_path: str, rows: list):
    out = {"rows": rows}
    for r in rows:
        key = f"steps_per_sec_{r['image_size']}_b{r['batch_size']}"
        if r["compute"] == "bf16":
            key += "_bf16"
        if r.get("remat"):
            key += "_remat"
        out[key] = r["steps_per_sec"]
    # canonical key consumed by tools/bench_loader.py (f32 64^2 b=8)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument(
        "--configs",
        default="64:8,128:8,128:32",
        help="comma list of image_size:batch pairs; each runs f32 AND bf16",
    )
    p.add_argument("--out", default=os.path.join(os.path.dirname(TOOLS),
                                                 "artifacts", "train_bench.json"))
    p.add_argument("--single", default=None,
                   help="internal: run ONE size:batch:compute[:remat] config "
                   "in-process and print its row JSON")
    args = p.parse_args()

    if args.single:
        parts = args.single.split(":")
        size, b, compute = int(parts[0]), int(parts[1]), parts[2]
        remat = len(parts) > 3 and parts[3] == "remat"
        row = measure(size, b, compute == "bf16", args.iters, remat=remat)
        print("ROW " + json.dumps(row), flush=True)
        return

    # one subprocess per config: a buffer leak / OOM / transient remote-
    # compile failure in one config cannot take down the rest, and the
    # device is guaranteed clean between configs (the first in-process run
    # lost 3 of 6 rows to exactly that). Rows are written incrementally.
    import subprocess

    rows = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            rows = json.load(f).get("rows", [])

    def have(size, b, compute):
        return any(r["image_size"] == size and r["batch_size"] == b
                   and r["compute"] == compute for r in rows)

    for pair in args.configs.split(","):
        size, b = (int(x) for x in pair.strip().split(":"))
        for compute in ("f32", "bf16"):
            if have(size, b, compute):
                print(f"{size}^2 b={b} {compute}: already measured, skip",
                      flush=True)
                continue
            row = None
            remat = False
            for attempt in range(3):
                spec = f"{size}:{b}:{compute}" + (":remat" if remat else "")
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--single", spec, "--iters", str(args.iters)],
                    capture_output=True, text=True, timeout=3600,
                )
                for line in r.stdout.splitlines():
                    if line.startswith("ROW "):
                        row = json.loads(line[4:])
                if row is not None:
                    break
                print(f"{spec} attempt {attempt} failed "
                      f"(rc={r.returncode}): {r.stderr.strip().splitlines()[-1:]}",
                      flush=True)
                err = r.stderr + r.stdout
                if ("RESOURCE_EXHAUSTED" in err or "ResourceExhausted" in err
                        or "out of memory" in err.lower()):
                    remat = True  # OOM: no point retrying without remat
                if attempt == 1 and not remat:
                    remat = True  # last attempt: remat is the only lever left
            if row is None:
                print(f"{size}^2 b={b} {compute}: UNMEASURABLE, skipping",
                      flush=True)
                continue
            rows.append(row)
            print(json.dumps(row), flush=True)
            _write(args.out, rows)

    print("\n| size | batch | compute | remat | steps/s | img/s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['image_size']}² | {r['batch_size']} | {r['compute']} | "
              f"{'y' if r.get('remat') else ''} | "
              f"{r['steps_per_sec']} | {r['imgs_per_sec']} |")


if __name__ == "__main__":
    main()
