"""Micro-benchmark for ops/pallas_typed_expand.typed_c3_expand.

Times the kernel in isolation at the serving shapes (n=1280, c2=128,
c4=256, s3=33) with the scan-checksum pattern (axon transport: only a
scalar crosses the wire; block_until_ready is a no-op).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1280)
    p.add_argument("--c2", type=int, default=128)
    p.add_argument("--c4", type=int, default=256)
    p.add_argument("--s3", type=int, default=33)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--groups", type=str, default="4")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from aglayout_tpu.ops.pallas_typed_expand import NA, NL, typed_c3_expand

    rng = np.random.RandomState(0)
    n, c2, c4, s3 = args.n, args.c2, args.c4, args.s3
    z2p = jnp.asarray(rng.randn(n, NL, NL, c2), jnp.bfloat16)
    idxR = jnp.asarray(rng.randint(0, NL, (n, NA, 4)), jnp.int32)
    lsel = jnp.asarray(rng.randint(0, NL + 1, (n, NA, 4)), jnp.int32)
    er = jnp.asarray(rng.randint(0, NA, (n, s3)), jnp.int32)
    ec = jnp.asarray(rng.randint(0, NA, (n, s3)), jnp.int32)
    ab = jnp.asarray(rng.randn(n, 2, c4), jnp.float32)
    w3t = jnp.asarray(rng.randn(4 * c2, 4 * c4) * 0.05, jnp.bfloat16)

    for g in [int(x) for x in args.groups.split(",")]:

        @jax.jit
        def many(z2p, idxR, lsel, er, ec, ab, w3t, g=g):
            def body(carry, i):
                # vary one operand per iteration so XLA cannot hoist the
                # kernel out of the scan as loop-invariant
                zi = z2p * (1.0 + 1e-6 * i).astype(z2p.dtype)
                out = typed_c3_expand(zi, idxR, lsel, er, ec, ab, w3t, group=g)
                return carry + jnp.sum(out.astype(jnp.float32)), None

            s, _ = jax.lax.scan(body, 0.0, jnp.arange(args.iters, dtype=jnp.float32))
            return s

        s = float(many(z2p, idxR, lsel, er, ec, ab, w3t))  # compile+warm
        t0 = time.perf_counter()
        s = float(many(z2p, idxR, lsel, er, ec, ab, w3t))
        dt = (time.perf_counter() - t0) / args.iters
        assert np.isfinite(s)
        print(f"group={g:3d}: {dt*1e3:7.3f} ms/call")


if __name__ == "__main__":
    main()
