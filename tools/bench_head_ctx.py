"""Context isolation for the in-model cost of spade_few_out_conv8.

The standalone micro-bench (tools/bench_head8.py) measures the c7 grouped
head at ~1.5-1.6 ms, but the full-model profile attributes ~3.7 ms to the
same custom call. This tool reconstructs the head's in-model context in
pieces to find where the extra ~2 ms comes from:

  args    — x_t and tables passed as jit args (= bench_head8 prod)
  conv    — x produced in-graph by a c6-shaped 5x5 conv + transpose (the
            model's producer), tables as args
  tabs    — x as arg, tables computed in-graph from seg via
            SPADE.folded_affine_tables_compact-equivalent math
  full    — both in-graph (closest to the model)

Every variant scales its inputs per timing iteration so no stage is
loop-invariant (XLA hoists invariant subgraphs out of the timing scan).
Reported per variant: total ms/iter. Compare deltas: conv-args isolates
the producer-layout effect, tabs-args the table-build effect.
"""

import argparse
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

    from aglayout_tpu.ops.pallas_spade_conv import spade_few_out_conv8

    B, HW, C, f = args.b, args.hw, args.c, args.f
    K, O = 7, 3
    hb = HW // f
    rng = np.random.RandomState(0)

    x_t = jnp.asarray(rng.randn(HW, HW, B, C).astype(np.float32), jnp.bfloat16)
    # conv producer operands: y (B,H,W,C) + a c6-shaped kernel
    y = jnp.asarray(rng.randn(B, HW, HW, C).astype(np.float32), jnp.bfloat16)
    ck = jnp.asarray(0.05 * rng.randn(5, 5, C, C).astype(np.float32), jnp.bfloat16)
    a_tab = jnp.asarray(
        0.1 * rng.randn(B // 8, hb, 5, (HW // f) * 5, 8, C).astype(np.float32),
        jnp.bfloat16,
    )
    b_tab = jnp.asarray(
        0.1 * rng.randn(B // 8, hb, 5, (HW // f) * 5, 8, C).astype(np.float32),
        jnp.bfloat16,
    )
    # compact-table source: per-image class maps at block resolution.
    # Mimic folded_affine_tables_compact's data movement: build the
    # (B, hb, 5, wb*5, 2n) stack from a (B, hb, wb, 5, 5, 2n) cell grid and
    # transpose the image axis into sublane position.
    cells = jnp.asarray(
        0.1 * rng.randn(B, hb, HW // f, 5, 5, 2 * C).astype(np.float32), jnp.bfloat16
    )
    kern = jnp.asarray(0.1 * rng.randn(K, K, C, O).astype(np.float32), jnp.bfloat16)
    bias = jnp.asarray(rng.randn(O).astype(np.float32))

    def tabs_from_cells(cells):
        b = cells.shape[0]
        # (B, hb, wb, 5rc, 5cc, 2n) -> (B, hb, 5rc, wb*5cc, 2n)
        X = cells.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb, 5, (HW // f) * 5, 2 * C)
        T = (
            X.reshape(b // 8, 8, hb, 5, (HW // f) * 5, 2 * C)
            .transpose(0, 2, 3, 4, 1, 5)
        )
        g, bt = jnp.split(T, 2, axis=-1)
        return 1.0 + g, bt

    def head(x, a, b):
        return spade_few_out_conv8(x, a, b, kern, bias, f=f)

    def v_args(s, x_t, y, cells, a, b):
        return head(x_t * s, a, b)

    def v_conv(s, x_t, y, cells, a, b):
        h = jax.lax.conv_general_dilated(
            y * s, ck, (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return head(jnp.transpose(h, (1, 2, 0, 3)), a, b)

    def v_tabs(s, x_t, y, cells, a, b):
        a2, b2 = tabs_from_cells(cells * s)
        return head(x_t * s, a2, b2)

    def v_full(s, x_t, y, cells, a, b):
        h = jax.lax.conv_general_dilated(
            y * s, ck, (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        a2, b2 = tabs_from_cells(cells * s)
        return head(jnp.transpose(h, (1, 2, 0, 3)), a2, b2)

    # reference costs without the head, to subtract the producers
    def v_convonly(s, x_t, y, cells, a, b):
        h = jax.lax.conv_general_dilated(
            y * s, ck, (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return h[:, :: 8, :: 8, :3]

    def v_tabsonly(s, x_t, y, cells, a, b):
        a2, b2 = tabs_from_cells(cells * s)
        return a2[..., :1] + b2[..., :1]

    operands = [jax.device_put(v) for v in (x_t, y, cells, a_tab, b_tab)]
    scales = jnp.asarray(1.0 + 1e-3 * rng.randn(args.iters), jnp.bfloat16)

    for name, fn in (
        ("args", v_args),
        ("conv", v_conv),
        ("tabs", v_tabs),
        ("full", v_full),
        ("convonly", v_convonly),
        ("tabsonly", v_tabsonly),
    ):
        @jax.jit
        def loop(scales, x_t, y, cells, a, b, fn=fn):
            def body(acc, s):
                return acc + fn(s, x_t, y, cells, a, b).astype(jnp.float32).sum(), 0.0

            out, _ = jax.lax.scan(body, jnp.float32(0.0), scales)
            return out

        float(loop(scales, *operands))
        t0 = time.time()
        chk = float(loop(scales, *operands))
        dt = (time.time() - t0) / args.iters * 1e3
        print(f"{name:9s}: {dt:7.3f} ms/iter  (chk {chk:.4g})")


if __name__ == "__main__":
    main()
