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




def _build_deblock(batch: int):
    """XLA-vs-Pallas for the H.264 luma edge filter (filter_edge_qp):
    (B, 8) pixel lines + per-line qp/bs.  The Pallas kernel works in
    the (8, B) position-major layout — sublanes are the 8 pixel slots,
    lanes are edge lines, so the whole where-cascade is full-width VPU
    work with zero strided access; the 52-entry alpha/beta/tc0 lookups
    stay in XLA on both paths (identical gather cost)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from libav_tpu.ops.h264deblock import (ALPHA, BETA, TC0,
                                           filter_edge_qp)

    xla_fn = jax.jit(lambda lines, qp, bs: filter_edge_qp(lines, qp, bs))

    LANES = 512

    def kernel(x_ref, aux_ref, o_ref):
        x = x_ref[:]                                # (8, LANES) int32
        p3, p2, p1, p0 = x[0, :], x[1, :], x[2, :], x[3, :]
        q0, q1, q2, q3 = x[4, :], x[5, :], x[6, :], x[7, :]
        aux = aux_ref[:]                            # (4, LANES)
        alpha, beta, tc0, bs = (aux[0, :], aux[1, :], aux[2, :],
                                aux[3, :])
        active = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
                 (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
        ap = jnp.abs(p2 - p0)
        aq = jnp.abs(q2 - q0)
        tc = tc0 + (ap < beta).astype(jnp.int32) + \
            (aq < beta).astype(jnp.int32)
        delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
        np0 = jnp.clip(p0 + delta, 0, 255)
        nq0 = jnp.clip(q0 - delta, 0, 255)
        hp = (p0 + q0 + 1) >> 1
        dp1 = jnp.clip((p2 + hp - 2 * p1) >> 1, -tc0, tc0)
        dq1 = jnp.clip((q2 + hp - 2 * q1) >> 1, -tc0, tc0)
        np1 = jnp.where(ap < beta, p1 + dp1, p1)
        nq1 = jnp.where(aq < beta, q1 + dq1, q1)
        strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
        sp = strong & (ap < beta)
        sq = strong & (aq < beta)
        sp0 = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4)
                        >> 3, (2 * p1 + p0 + q1 + 2) >> 2)
        sp1 = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
        sp2 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                        p2)
        sq0 = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4)
                        >> 3, (2 * q1 + q0 + p1 + 2) >> 2)
        sq1 = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
        sq2 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3,
                        q2)
        is4 = bs == 4
        o_ref[0, :] = p3
        o_ref[1, :] = jnp.where(active & is4, sp2, p2)
        o_ref[2, :] = jnp.where(active, jnp.where(is4, sp1, np1), p1)
        o_ref[3, :] = jnp.where(active, jnp.where(is4, sp0, np0), p0)
        o_ref[4, :] = jnp.where(active, jnp.where(is4, sq0, nq0), q0)
        o_ref[5, :] = jnp.where(active, jnp.where(is4, sq1, nq1), q1)
        o_ref[6, :] = jnp.where(active & is4, sq2, q2)
        o_ref[7, :] = q3

    interp = jax.devices()[0].platform == "cpu"

    @jax.jit
    def pallas_fn(xT, qp, bs):                      # (8, B) int32
        B = xT.shape[1]
        qp_a = jnp.clip(qp, 0, 51)
        aux = jnp.stack([
            jnp.asarray(ALPHA)[qp_a],
            jnp.asarray(BETA)[qp_a],
            jnp.asarray(TC0)[qp_a, jnp.clip(bs - 1, 0, 2)],
            bs.astype(jnp.int32)])                  # (4, B)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
            grid=(B // LANES,),
            in_specs=[pl.BlockSpec((8, LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((4, LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interp,
        )(xT, aux)

    return xla_fn, pallas_fn


def main_deblock(argv):
    batch = int(argv[0]) if argv else 49152
    iters = int(argv[1]) if len(argv) > 1 else 50
    batch -= batch % 512

    import jax
    import jax.numpy as jnp
    from libav_tpu.ops.h264deblock import filter_edge_ref

    rng = np.random.default_rng(7)
    lines = rng.integers(0, 256, (batch, 8)).astype(np.int32)
    # smooth-ish neighborhoods so the filters actually fire
    lines[::2] = np.clip(lines[::2, :1] +
                         rng.integers(-6, 7, (batch // 2 + batch % 2, 8)),
                         0, 255)
    qp = 30
    bs = rng.integers(0, 5, (batch,)).astype(np.int32)
    qpv = np.full((batch,), qp, np.int32)

    xla_fn, pallas_fn = _build_deblock(batch)
    l_dev = jnp.asarray(lines)
    lT_dev = jnp.asarray(lines.T.copy())
    qp_dev = jnp.asarray(qpv)
    bs_dev = jnp.asarray(bs)

    def bench(fn, *args):
        fn(*args).block_until_ready()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(*args).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) * 1e6

    t_x = bench(xla_fn, l_dev, qp_dev, bs_dev)
    t_p = bench(pallas_fn, lT_dev, qp_dev, bs_dev)
    ref = filter_edge_ref(lines[:512], qp, bs[:512])
    a = np.asarray(xla_fn(l_dev, qp_dev, bs_dev))[:512]
    b = np.asarray(pallas_fn(lT_dev, qp_dev, bs_dev))[:, :512].T
    ok_x = np.array_equal(a, ref)
    ok_p = np.array_equal(b, ref)
    dev = jax.devices()[0].platform
    print(f"device={dev} batch={batch} edge lines")
    print(f"xla_deblock:      {t_x:9.1f} us/batch  bitexact={ok_x}")
    print(f"pallas_deblock:   {t_p:9.1f} us/batch  bitexact={ok_p}")
    print(f"pallas/xla ratio: {t_p / t_x:.3f}")
    return 0


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if argv and argv[0] == "deblock":
        return main_deblock(argv[1:])
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
