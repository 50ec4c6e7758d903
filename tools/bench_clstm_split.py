"""Micro-bench: ConvLSTM layer-1 gate conv, in-scan joint vs x/h split.

Hypothesis (round 3): conv(cat(x, h), W) == conv(x, Wx) + conv(h, Wh)
exactly (linearity; bf16 MXU sums differ only in reduction order). The x
half — 512 of 640 input channels, 64% of total ConvLSTM FLOPs — is known
for ALL object steps upfront (it is the layout-encoder output), so it can
run OUTSIDE the sequential scan as one batch-(B*O) conv, leaving only the
128-channel h half on the scan's critical path. Same FLOPs; the question
is whether the big parallel conv + per-step add beats 10 sequential
640-channel convs already at 92% of MXU peak.

Usage: python tools/bench_clstm_split.py [--iters 30]
Prints both variants' in-scan ms/batch and the max output delta.
"""

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--b", type=int, default=128)
    p.add_argument("--o", type=int, default=10)
    p.add_argument("--hw", type=int, default=8)
    p.add_argument("--xc", type=int, default=512)
    p.add_argument("--hc", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    b, o, hw, xc, hc = args.b, args.o, args.hw, args.xc, args.hc
    gates = 4 * hc
    rng = np.random.RandomState(0)
    x_all = jnp.asarray(rng.randn(b, o, hw, hw, xc), jnp.bfloat16)
    w = jnp.asarray(0.05 * rng.randn(5, 5, xc + hc, gates), jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")

    def cell(h, c, z):
        i, f, oo, g = jnp.split(z, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h2 = jax.nn.sigmoid(oo) * jnp.tanh(c2)
        return h2, c2

    def conv(x, k):
        return jax.lax.conv_general_dilated(x, k, (1, 1), [(2, 2), (2, 2)], dimension_numbers=dn)

    @jax.jit
    def joint(x_all):
        def step(carry, xt):
            h, c = carry
            z = conv(jnp.concatenate([xt, h], -1), w)
            h2, c2 = cell(h, c, z)
            return (h2, c2), 0.0

        carry = (jnp.zeros((b, hw, hw, hc), jnp.bfloat16),) * 2
        (h, _), _ = jax.lax.scan(step, carry, jnp.moveaxis(x_all, 1, 0))
        return h

    @jax.jit
    def split(x_all):
        zx = conv(x_all.reshape(b * o, hw, hw, xc), w[:, :, :xc]).reshape(
            b, o, hw, hw, gates
        )

        def step(carry, zxt):
            h, c = carry
            z = zxt + conv(h, w[:, :, xc:])
            h2, c2 = cell(h, c, z)
            return (h2, c2), 0.0

        carry = (jnp.zeros((b, hw, hw, hc), jnp.bfloat16),) * 2
        (h, _), _ = jax.lax.scan(step, carry, jnp.moveaxis(zx, 1, 0))
        return h

    def timed(fn, tag):
        # one jitted scan over iters; the input is scaled per iteration so
        # the body is NOT loop-invariant (XLA hoists an invariant fn(x_all)
        # out of the scan entirely — the first version of this bench
        # measured exactly that and reported 5x below the FLOP floor)
        scales = jnp.asarray(1.0 + 1e-3 * rng.randn(args.iters), jnp.bfloat16)

        @jax.jit
        def loop(x_all, scales):
            def body(acc, s):
                return acc + fn(x_all * s).astype(jnp.float32).sum(), 0.0

            out, _ = jax.lax.scan(body, jnp.float32(0.0), scales)
            return out

        float(loop(x_all, scales))  # compile + warm
        t0 = time.time()
        chk = float(loop(x_all, scales))
        dt = (time.time() - t0) / args.iters * 1e3
        print(f"{tag}: {dt:.3f} ms/batch (checksum {chk:.1f})")
        return dt

    d = float(jnp.abs(joint(x_all).astype(jnp.float32) - split(x_all).astype(jnp.float32)).max())
    print(f"max |joint - split| = {d:.5f}")
    tj = timed(joint, "joint  (cat inside scan)")
    ts = timed(split, "split  (x-half pre-scan)")
    print(f"delta: {tj - ts:+.3f} ms/batch")


if __name__ == "__main__":
    main()
