"""Pallas-vs-XLA measurement for one hot kernel (VERDICT r2 item 10).

Target: the batched bit-exact `-idct simple` 8x8 IDCT that every
mpegvideo-family decode runs per frame (ops/idct.py idct8x8_int).

Two implementations of the identical integer semantics:
  - XLA: the production einsum formulation (int32 dot over the 8-axis,
    fused by XLA).
  - Pallas: a hand-written kernel in the (64, B) coefficient-major
    layout — sublanes hold the 64 coefficient slots, lanes hold blocks,
    so every butterfly step is a full-width VPU multiply-add with no
    cross-lane traffic.

Run ON the TPU (single process owns the axon tunnel):
    python -m libav_tpu.tools.pallas_probe [batch] [iters]

Timing notes (memory/axon-tpu-perf-gotchas): keep everything on device,
block_until_ready in the timed loop, warm up first, median of repeats.
"""

from __future__ import annotations

import statistics
import sys
import time

import numpy as np


def _build(batch: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from libav_tpu.ops.idct import (COL_SHIFT, ROW_SHIFT,
                                    simple_idct_matrix)

    M = np.asarray(simple_idct_matrix(), np.int32)
    W4 = 16383
    col_bias = W4 * ((1 << 19) // W4)

    def wrap16(x):
        return ((x + 0x8000) & 0xFFFF) - 0x8000

    # ---------------- XLA production path ---------------- #
    from libav_tpu.ops.idct import idct8x8_int
    xla_fn = jax.jit(idct8x8_int)

    # ---------------- Pallas kernel ---------------------- #
    LANES = 128

    def kernel(x_ref, o_ref):
        x = x_ref[:]                               # (64, LANES) int32
        x = wrap16(x)
        # row pass: within each block-row r (sublanes 8r..8r+7),
        # y[8r+k] = (sum_j x[8r+j]*M[k,j] + 2^(RS-1)) >> RS, with the
        # reference's DC-only shortcut and int16 wraparound
        rows = []
        for r in range(8):
            seg = x[8 * r:8 * r + 8, :]            # (8, LANES)
            acc = [jnp.full((LANES,), 1 << (ROW_SHIFT - 1), jnp.int32)
                   for _ in range(8)]
            for k in range(8):
                a = acc[k]
                for j in range(8):
                    w = int(M[k, j])
                    if w:
                        a = a + seg[j, :] * w
                acc[k] = a
            dc_only = jnp.ones((LANES,), bool)
            for j in range(1, 8):
                dc_only = dc_only & (seg[j, :] == 0)
            dc_row = wrap16(seg[0, :] << 3)
            out_rows = [wrap16(jnp.where(
                dc_only, dc_row,
                # int32 wraparound of the accumulate is free (int32)
                acc[k] >> ROW_SHIFT)) for k in range(8)]
            rows.append(jnp.stack(out_rows))       # (8, LANES)
        y = jnp.concatenate(rows, axis=0)          # (64, LANES)
        # column pass: z[8k+c] = (sum_i M[k,i]*y[8i+c] + bias) >> CS
        outs = []
        for k in range(8):
            accs = [jnp.full((LANES,), col_bias, jnp.int32)
                    for _ in range(8)]
            for i in range(8):
                w = int(M[k, i])
                if w:
                    for c in range(8):
                        accs[c] = accs[c] + y[8 * i + c, :] * w
            outs.extend(a >> COL_SHIFT for a in accs)
        o_ref[:] = jnp.stack(outs)

    interp = jax.devices()[0].platform == "cpu"

    @jax.jit
    def pallas_fn(xT):                             # (64, B) int32
        B = xT.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, B), jnp.int32),
            grid=(B // LANES,),
            in_specs=[pl.BlockSpec((64, LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((64, LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interp,
        )(xT)

    return xla_fn, pallas_fn


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    batch = int(argv[0]) if argv else 48896        # ~1080p frame, /128
    iters = int(argv[1]) if len(argv) > 1 else 50
    batch -= batch % 128

    import jax
    import jax.numpy as jnp
    from libav_tpu.ops.idct import idct8x8_int_ref

    rng = np.random.default_rng(1)
    blocks = rng.integers(-512, 512, (batch, 8, 8)).astype(np.int32)
    # sprinkle DC-only blocks like a real frame
    blocks[::3, :, :] = 0
    blocks[::3, 0, 0] = rng.integers(-512, 512, ((batch + 2) // 3,))

    xla_fn, pallas_fn = _build(batch)
    x_dev = jnp.asarray(blocks)
    xT_dev = jnp.asarray(
        blocks.reshape(batch, 64).T.copy())        # (64, B)

    def bench(fn, arg):
        fn(arg).block_until_ready()                # warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(arg).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) * 1e6         # us

    # time FIRST: the axon transport drops to synchronous dispatch
    # after the first device->host fetch (memory: tpu-perf-gotchas)
    t_x = bench(xla_fn, x_dev)
    t_p = bench(pallas_fn, xT_dev)
    # correctness vs golden (fetches AFTER timing)
    ref = idct8x8_int_ref(blocks[:256])
    a = np.asarray(xla_fn(x_dev)[:256])
    b = np.asarray(pallas_fn(xT_dev))[:, :256].T.reshape(256, 8, 8)
    ok_x = np.array_equal(a, ref)
    ok_p = np.array_equal(b, ref)
    dev = jax.devices()[0].platform
    print(f"device={dev} batch={batch} blocks")
    print(f"xla_einsum_idct:  {t_x:9.1f} us/frame-batch  bitexact={ok_x}")
    print(f"pallas_idct:      {t_p:9.1f} us/frame-batch  bitexact={ok_p}")
    print(f"pallas/xla ratio: {t_p / t_x:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
