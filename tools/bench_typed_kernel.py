"""Micro-bench: typed_c3_expand (v3) vs typed_c3_expand_v4 on the real TPU.

Serving shapes: n = b*o = 1280, s3 = 32, c2 = 128, c4 = 256, bf16.
Axon-safe timing (see .claude/skills/verify): iters inside one jitted
lax.scan, single scalar checksum fetched.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from aglayout_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

from aglayout_tpu.ops.pallas_typed_expand import (
    KW, NA, NL, typed_c3_expand, typed_c3_expand_v4, typed_c3_expand_v5,
    typed_c3_expand_v6,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1280)
    p.add_argument("--s3", type=int, default=32)
    p.add_argument("--c2", type=int, default=128)
    p.add_argument("--c4", type=int, default=256)
    p.add_argument("--group", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--check", action="store_true", help="also verify v4 == v3 on device")
    p.add_argument("--only", default=None, help="bench only this variant (v3|v4)")
    args = p.parse_args()
    n, s3, c2, c4 = args.n, args.s3, args.c2, args.c4

    rng = np.random.RandomState(0)
    z2p = rng.randn(n, NL, NL, c2).astype(np.float32)
    z2p[:, NL - 1] = 0.0
    z2p[:, :, NL - 1] = 0.0
    inputs = dict(
        z2p=jnp.asarray(z2p, jnp.bfloat16),
        idxR=jnp.asarray(rng.randint(0, NL, (n, NA, KW)), jnp.int32),
        lsel=jnp.asarray(rng.randint(0, NL + 1, (n, NA, KW)), jnp.int32),
        selR=jnp.asarray(rng.randint(0, NA, (n, s3)), jnp.int32),
        selC=jnp.asarray(rng.randint(0, NA, (n, s3)), jnp.int32),
        ab=jnp.asarray(rng.randn(n, 2, c4).astype(np.float32) * 0.5),
        w3t=jnp.asarray(
            (rng.randn(KW * c2, KW * c4) * 0.05).astype(np.float32), jnp.bfloat16
        ),
    )
    inputs = jax.device_put(inputs)

    if args.check:
        a = jax.jit(lambda i: typed_c3_expand(**i, group=args.group).astype(jnp.float32))(inputs)
        for nm, fn in (("v4", typed_c3_expand_v4), ("v5", typed_c3_expand_v5),
                       ("v6", typed_c3_expand_v6)):
            b = jax.jit(lambda i, fn=fn: fn(**i, group=args.group).astype(jnp.float32))(inputs)
            d = float(jax.jit(lambda a, b: jnp.abs(a - b).max())(a, b))
            print(f"{nm}-vs-v3 max abs delta: {d:.6g}")

    variants = [("v3", typed_c3_expand), ("v4", typed_c3_expand_v4),
                ("v5", typed_c3_expand_v5), ("v6", typed_c3_expand_v6)]
    if args.only:
        variants = [(n_, f_) for n_, f_ in variants if n_ == args.only]
    for name, fn in variants:
        @jax.jit
        def run(i, fn=fn):
            # scale z2p by a per-iter scalar so the kernel is NOT
            # loop-invariant (XLA hoists invariant calls out of the scan)
            def body(c, s):
                kw = dict(i)
                kw["z2p"] = (kw["z2p"].astype(jnp.float32) * s).astype(kw["z2p"].dtype)
                o = fn(**kw, group=args.group)
                return c + o.astype(jnp.float32).sum(), None
            xs = 1.0 + jnp.arange(args.iters, dtype=jnp.float32) * 1e-4
            return jax.lax.scan(body, jnp.float32(0.0), xs)[0]

        s = run(inputs)
        float(s)  # warm
        t0 = time.perf_counter()
        float(run(inputs))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt * 1e3:.3f} ms/call")


if __name__ == "__main__":
    main()
