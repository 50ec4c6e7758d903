"""Micro-bench + stage bisection of spade_few_out_conv8 (the 8-image
sublane RGB head, ops/pallas_spade_conv.py).

Runs the real kernel and truncated variants at the c7 serving shape
(H=W=128, C=128, B=128, K=7, f=16) to attribute its cost:
  full     — the production kernel
  nodma    — window DMA skipped (compute reads whatever is in scratch)
  dmaonly  — DMA + a trivial store (no expansion/apply/matmul)
  noexp    — DMA + apply with slot-0 coefficients only (expansion cost)

Usage: python tools/bench_head8.py [--iters 20]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--b", type=int, default=128)
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--c", type=int, default=128)
    p.add_argument("--f", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aglayout_tpu.ops.pallas_spade_conv import (
        _GUARD,
        _head8_kernel,
        _row_class,
        spade_few_out_conv8,
    )

    B, H, C, f = args.b, args.hw, args.c, args.f
    W, K, O = H, 7, 3
    hb, r = H // f, 3
    rows = f + 2 * r
    rng = np.random.RandomState(0)
    x_t = jnp.asarray(rng.randn(H, W, B, C).astype(np.float32), jnp.bfloat16)
    a_tab = jnp.asarray(
        0.1 * rng.randn(B // 8, hb, 5, (W // f) * 5, 8, C).astype(np.float32),
        jnp.bfloat16,
    )
    b_tab = jnp.asarray(
        0.1 * rng.randn(B // 8, hb, 5, (W // f) * 5, 8, C).astype(np.float32),
        jnp.bfloat16,
    )
    kern = jnp.asarray(0.1 * rng.randn(K, K, C, O).astype(np.float32), jnp.bfloat16)
    bias = jnp.asarray(rng.randn(O).astype(np.float32))

    def variant_kernel(mode):
        def k(x_any, a_ref, b_ref, w_ref, bias_ref, out_ref, xw, yw, zt, ae, be, sem):
            i = pl.program_id(0)
            jb = pl.program_id(1)
            guard = _GUARD * 8
            if mode in ("full", "dmaonly", "noexp"):
                raw0 = jb * f - r
                src0 = jnp.clip(raw0, 0, H - rows)
                dma = pltpu.make_async_copy(
                    x_any.at[pl.ds(src0, rows), :, pl.ds(i * 8, 8), :], xw, sem
                )
                dma.start()
            if mode in ("full", "nodma"):
                jprev = jnp.maximum(jb - 1, 0)
                jnext = jnp.minimum(jb + 1, hb - 1)
                slots = [(0 + c2, jb, c2) for c2 in range(5)]
                slots += [(5 + u, jprev, _row_class(f - r + u, f)) for u in range(r)]
                slots += [(5 + r + u, jnext, _row_class(u, f)) for u in range(r)]
                for slot, jsrc, cls in slots:
                    for wb in range(W // f):
                        base = wb * f
                        for u, ccls in ((0, 0), (1, 1), (f - 2, 3), (f - 1, 4)):
                            ae[slot, base + u] = a_ref[0, jsrc, cls, wb * 5 + ccls]
                            be[slot, base + u] = b_ref[0, jsrc, cls, wb * 5 + ccls]
                        ae[slot, base + 2 : base + f - 2] = jnp.broadcast_to(
                            a_ref[0, jsrc, cls, wb * 5 + 2], (f - 4, *a_ref.shape[4:])
                        )
                        be[slot, base + 2 : base + f - 2] = jnp.broadcast_to(
                            b_ref[0, jsrc, cls, wb * 5 + 2], (f - 4, *b_ref.shape[4:])
                        )
            if mode in ("full", "dmaonly", "noexp"):
                dma.wait()
            if mode == "dmaonly":
                out_ref[0, 0] = jnp.broadcast_to(
                    jnp.sum(xw[0, 0].astype(jnp.float32)), out_ref.shape[2:]
                ).astype(out_ref.dtype)
                return
            shift = jnp.int32(0) if mode == "nodma" else src0 - raw0
            for u in range(rows):
                if mode == "noexp":
                    slot_u = 0
                elif u < r:
                    slot_u = 5 + u
                elif u < f + r:
                    slot_u = _row_class(u - r, f)
                else:
                    slot_u = 5 + r + (u - (f + r))
                iu = jnp.clip(u - shift, 0, rows - 1)
                xa = xw[pl.ds(iu, 1)][0]
                yw[u] = jnp.maximum(
                    xa * ae[slot_u] + be[slot_u], jnp.zeros((), yw.dtype)
                )
            rhs = yw[...].reshape(rows * W * 8, C)
            z = jax.lax.dot_general(
                w_ref[...], rhs, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            zt[:, guard : guard + rows * W * 8] = z.astype(zt.dtype)
            wpos = (jax.lax.broadcasted_iota(jnp.int32, (O, f * W * 8), 1) // 8) % W
            acc = jnp.broadcast_to(
                bias_ref[0].astype(jnp.float32).reshape(O, 1), (O, f * W * 8)
            ).astype(jnp.float32)
            for dy in range(K):
                for dx in range(K):
                    t = dy * K + dx
                    sx = dx - r
                    base = guard + (dy * W + sx) * 8
                    seg = zt[t * O : (t + 1) * O, base : base + f * W * 8].astype(
                        jnp.float32
                    )
                    if sx > 0:
                        seg = jnp.where(wpos < (W - sx), seg, 0.0)
                    elif sx < 0:
                        seg = jnp.where(wpos >= (-sx), seg, 0.0)
                    acc = acc + seg
            out_ref[0, 0] = acc.astype(out_ref.dtype)

        return k

    w_flat = (
        kern.reshape(K * K, C, O).transpose(0, 2, 1).reshape(K * K * O, C)
    ).astype(x_t.dtype)
    tab_spec = pl.BlockSpec(
        (1, hb, 5, (W // f) * 5, 8, C), lambda i, j: (i, 0, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def build(mode, x_t, a_tab, b_tab):
        return pl.pallas_call(
            variant_kernel(mode),
            grid=(B // 8, hb),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                tab_spec,
                tab_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, O, f * W * 8), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B // 8, hb, O, f * W * 8), x_t.dtype),
            scratch_shapes=[
                pltpu.VMEM((rows, W, 8, C), x_t.dtype),
                pltpu.VMEM((rows, W, 8, C), x_t.dtype),
                pltpu.VMEM((K * K * O, 2 * _GUARD * 8 + rows * W * 8), x_t.dtype),
                pltpu.VMEM((5 + 2 * r, W, 8, C), x_t.dtype),
                pltpu.VMEM((5 + 2 * r, W, 8, C), x_t.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(x_t, a_tab, b_tab, w_flat, bias.reshape(1, O))

    operands = [jax.device_put(v) for v in (x_t, a_tab, b_tab)]

    def timed(fn, tag):
        # operands passed as jit ARGUMENTS: a closure constant would ship
        # the 536 MB input in the remote-compile request body (HTTP 413 on
        # the axon tunnel)
        @jax.jit
        def loop(x_t, a_tab, b_tab):
            def body(s, _):
                return s + fn(x_t, a_tab, b_tab).astype(jnp.float32).sum(), 0.0

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=args.iters)
            return out

        float(loop(*operands))
        t0 = time.time()
        chk = float(loop(*operands))
        dt = (time.time() - t0) / args.iters * 1e3
        print(f"{tag:8s}: {dt:7.3f} ms  (chk {chk:.3g})")
        return dt

    # production entry first (includes the (B,H,W,O) re-layout epilogue)
    timed(
        lambda x, a, b: spade_few_out_conv8(x, a, b, kern, bias, f=f), "prod"
    )
    for mode in ("full", "nodma", "dmaonly", "noexp"):
        timed(functools.partial(build, mode), mode)


if __name__ == "__main__":
    main()
