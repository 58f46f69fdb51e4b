"""H.264 in-loop deblocking filter (reference: libavcodec/h264dsp.h:46-74
loop filter entries + x86/h264_deblock.asm; spec ISO 14496-10 §8.7).

The edge filter operates on (B, 8) pixel lines [p3 p2 p1 p0 q0 q1 q2 q3]
for a batch of edge lines at once; alpha/beta/tc0 are per-line scalars.
Frame-level orchestration (which edges, bS derivation, the left-to-right /
top-to-bottom ordering) lives in the decoder; this module is the pure
filter math with golden references.
"""

from __future__ import annotations

import functools

import numpy as np

# spec table 8-16: alpha, beta indexed by qp (0..51)
ALPHA = np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                  4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
                  32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127,
                  144, 162, 182, 203, 226, 255, 255], dtype=np.int32)
BETA = np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
                 9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15,
                 16, 16, 17, 17, 18, 18], dtype=np.int32)
# tc0 by (qp, bS-1), spec table 8-17
TC0 = np.array([
    [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0],
    [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0],
    [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 1],
    [0, 0, 1], [0, 0, 1], [0, 0, 1], [0, 1, 1], [0, 1, 1], [1, 1, 1],
    [1, 1, 1], [1, 1, 1], [1, 1, 1], [1, 1, 2], [1, 1, 2], [1, 1, 2],
    [1, 1, 2], [1, 2, 3], [1, 2, 3], [2, 2, 3], [2, 2, 4], [2, 3, 4],
    [2, 3, 4], [3, 3, 5], [3, 4, 6], [3, 4, 6], [4, 5, 7], [4, 5, 8],
    [5, 6, 9], [6, 7, 10], [6, 8, 11], [7, 9, 13], [8, 10, 16],
    [9, 12, 18], [10, 13, 20], [11, 15, 23], [13, 17, 25], [13, 17, 25],
], dtype=np.int32)


def filter_edge_ref(lines: np.ndarray, qp: int, bs: np.ndarray,
                    chroma: bool = False) -> np.ndarray:
    """Golden luma/chroma edge filter. lines: (B, 8) int; bs: (B,) in 0..4.
    Returns filtered copies (spec 8.7.2.3/8.7.2.4)."""
    out = lines.astype(np.int64).copy()
    alpha = int(ALPHA[qp])
    beta = int(BETA[qp])
    for i in range(len(lines)):
        p3, p2, p1, p0, q0, q1, q2, q3 = out[i]
        b = int(bs[i])
        if b == 0:
            continue
        if abs(p0 - q0) >= alpha or abs(p1 - p0) >= beta or \
                abs(q1 - q0) >= beta:
            continue
        if b < 4:
            tc0 = int(TC0[qp, b - 1])
            tc = tc0
            ap = abs(p2 - p0)
            aq = abs(q2 - q0)
            if not chroma:
                if ap < beta:
                    tc += 1
                if aq < beta:
                    tc += 1
            else:
                tc += 1
            delta = np.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
            np0 = np.clip(p0 + delta, 0, 255)
            nq0 = np.clip(q0 - delta, 0, 255)
            np1, nq1 = p1, q1
            if not chroma and ap < beta:
                np1 = p1 + np.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1,
                                   -tc0, tc0)
            if not chroma and aq < beta:
                nq1 = q1 + np.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1,
                                   -tc0, tc0)
            out[i, 2], out[i, 3], out[i, 4], out[i, 5] = np1, np0, nq0, nq1
        else:
            strong = abs(p0 - q0) < (alpha >> 2) + 2
            if not chroma and strong and abs(p2 - p0) < beta:
                out[i, 3] = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
                out[i, 2] = (p2 + p1 + p0 + q0 + 2) >> 2
                out[i, 1] = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
            else:
                out[i, 3] = (2 * p1 + p0 + q1 + 2) >> 2
            if not chroma and strong and abs(q2 - q0) < beta:
                out[i, 4] = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
                out[i, 5] = (q2 + q1 + q0 + p0 + 2) >> 2
                out[i, 6] = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
            else:
                out[i, 4] = (2 * q1 + q0 + p1 + 2) >> 2
    return out.astype(np.int32)


_PALLAS_LANES = 512
# Pallas wins below ~16k lines (axon-measured, tools/pallas_probe.py
# deblock: 0.66x @2048, 0.87x @4096-8192, 1.62x @32768) — the
# wavefront scan's per-wave batches are 1-4k, squarely in the win zone;
# XLA's fusion pipelines better only at frame-flat batches
_PALLAS_MAX_BATCH = 16384


def _edge_kernel(x_ref, aux_ref, o_ref):
    """Pallas luma edge filter on the (8, LANES) position-major layout:
    sublanes are the p3..q3 slots, lanes are edge lines — the whole
    where-cascade is full-width VPU work with zero strided access.
    alpha/beta/tc0 lookups arrive precomputed in aux (4, LANES)."""
    import jax.numpy as jnp
    x = x_ref[:]
    p3, p2, p1, p0 = x[0, :], x[1, :], x[2, :], x[3, :]
    q0, q1, q2, q3 = x[4, :], x[5, :], x[6, :], x[7, :]
    aux = aux_ref[:]
    alpha, beta, tc0, bs = aux[0, :], aux[1, :], aux[2, :], aux[3, :]
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
    sp0 = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                    (2 * p1 + p0 + q1 + 2) >> 2)
    sp1 = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq0 = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                    (2 * q1 + q0 + p1 + 2) >> 2)
    sq1 = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    sq2 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    is4 = bs == 4
    o_ref[0, :] = p3
    o_ref[1, :] = jnp.where(active & is4, sp2, p2)
    o_ref[2, :] = jnp.where(active, jnp.where(is4, sp1, np1), p1)
    o_ref[3, :] = jnp.where(active, jnp.where(is4, sp0, np0), p0)
    o_ref[4, :] = jnp.where(active, jnp.where(is4, sq0, nq0), q0)
    o_ref[5, :] = jnp.where(active, jnp.where(is4, sq1, nq1), q1)
    o_ref[6, :] = jnp.where(active & is4, sq2, q2)
    o_ref[7, :] = q3


def _filter_edge_qp_pallas(lines, qp, bs, a_off: int, b_off: int,
                           interpret: bool = False):
    """Luma filter_edge_qp via the Pallas kernel: lookups and the
    lane-padding/transpose in XLA (fused into neighbors), filter math
    in the kernel."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B = lines.shape[0]
    Bp = -(-B // _PALLAS_LANES) * _PALLAS_LANES
    qpi = qp.astype(jnp.int32)
    qp_a = jnp.clip(qpi + a_off, 0, 51)
    qp_b = jnp.clip(qpi + b_off, 0, 51)
    aux = jnp.stack([
        jnp.asarray(ALPHA)[qp_a],
        jnp.asarray(BETA)[qp_b],
        jnp.asarray(TC0)[qp_a, jnp.clip(bs.astype(jnp.int32) - 1, 0, 2)],
        bs.astype(jnp.int32)])
    xT = jnp.zeros((8, Bp), jnp.int32).at[:, :B].set(
        lines.astype(jnp.int32).T)
    auxp = jnp.zeros((4, Bp), jnp.int32).at[:, :B].set(aux)
    outT = pl.pallas_call(
        _edge_kernel,
        out_shape=jax.ShapeDtypeStruct((8, Bp), jnp.int32),
        grid=(Bp // _PALLAS_LANES,),
        in_specs=[pl.BlockSpec((8, _PALLAS_LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4, _PALLAS_LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, _PALLAS_LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xT, auxp)
    return outT[:, :B].T


def _on_tpu() -> bool:
    import jax
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def filter_edge_qp(lines, qp, bs, chroma: bool = False,
                   a_off: int = 0, b_off: int = 0):
    """Batched edge filter with per-line qp (frame-level application:
    every edge line carries the averaged qp of its two macroblocks).
    lines (B,8), qp (B,), bs (B,). a_off/b_off are the slice header's
    alpha_c0/beta offsets (spec indexA/indexB; h264_loopfilter.c uses
    qp + slice_alpha_c0_offset for alpha AND tc0, + slice_beta_offset
    for beta)."""
    import jax.numpy as jnp
    if not chroma and lines.shape[0] <= _PALLAS_MAX_BATCH and _on_tpu():
        return _filter_edge_qp_pallas(lines, qp, bs, a_off, b_off)
    x = lines.astype(jnp.int32)
    p3, p2, p1, p0 = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
    q0, q1, q2, q3 = x[:, 4], x[:, 5], x[:, 6], x[:, 7]
    qpi = qp.astype(jnp.int32)
    qp_a = jnp.clip(qpi + a_off, 0, 51)
    qp_b = jnp.clip(qpi + b_off, 0, 51)
    alpha = jnp.asarray(ALPHA)[qp_a]
    beta = jnp.asarray(BETA)[qp_b]
    qp = qp_a                      # tc0 table uses indexA
    bs = bs.astype(jnp.int32)

    active = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
             (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)

    tc0 = jnp.asarray(TC0)[qp, jnp.clip(bs - 1, 0, 2)]
    ap = jnp.abs(p2 - p0)
    aq = jnp.abs(q2 - q0)
    if chroma:
        tc = tc0 + 1
    else:
        tc = tc0 + (ap < beta).astype(jnp.int32) + \
            (aq < beta).astype(jnp.int32)
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    if chroma:
        np1, nq1 = p1, q1
    else:
        dp1 = jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0)
        dq1 = jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0)
        np1 = jnp.where(ap < beta, p1 + dp1, p1)
        nq1 = jnp.where(aq < beta, q1 + dq1, q1)

    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = strong & (ap < beta) & (not chroma)
    sq = strong & (aq < beta) & (not chroma)
    sp0 = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                    (2 * p1 + p0 + q1 + 2) >> 2)
    sp1 = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq0 = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                    (2 * q1 + q0 + p1 + 2) >> 2)
    sq1 = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    sq2 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    is4 = bs == 4
    op2 = jnp.where(active & is4, sp2, p2)
    op1 = jnp.where(active, jnp.where(is4, sp1, np1), p1)
    op0 = jnp.where(active, jnp.where(is4, sp0, np0), p0)
    oq0 = jnp.where(active, jnp.where(is4, sq0, nq0), q0)
    oq1 = jnp.where(active, jnp.where(is4, sq1, nq1), q1)
    oq2 = jnp.where(active & is4, sq2, q2)
    return jnp.stack([p3, op2, op1, op0, oq0, oq1, oq2, q3], axis=1)


def filter_edge(lines, qp: int, bs, chroma: bool = False):
    """Batched device edge filter; same contract as filter_edge_ref."""
    import jax.numpy as jnp
    x = lines.astype(jnp.int32)
    p3, p2, p1, p0 = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
    q0, q1, q2, q3 = x[:, 4], x[:, 5], x[:, 6], x[:, 7]
    alpha = int(ALPHA[qp])
    beta = int(BETA[qp])
    bs = bs.astype(jnp.int32)

    active = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
             (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)

    # ---- normal filter (bs 1..3) ----
    tc0 = jnp.asarray(TC0[qp])[jnp.clip(bs - 1, 0, 2)]
    ap = jnp.abs(p2 - p0)
    aq = jnp.abs(q2 - q0)
    if chroma:
        tc = tc0 + 1
    else:
        tc = tc0 + (ap < beta).astype(jnp.int32) + (aq < beta).astype(jnp.int32)
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    if chroma:
        np1, nq1 = p1, q1
    else:
        dp1 = jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0)
        dq1 = jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0)
        np1 = jnp.where(ap < beta, p1 + dp1, p1)
        nq1 = jnp.where(aq < beta, q1 + dq1, q1)

    # ---- strong filter (bs == 4) ----
    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = strong & (ap < beta) & (not chroma)
    sq = strong & (aq < beta) & (not chroma)
    sp0 = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                    (2 * p1 + p0 + q1 + 2) >> 2)
    sp1 = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq0 = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                    (2 * q1 + q0 + p1 + 2) >> 2)
    sq1 = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    sq2 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    is4 = bs == 4
    op2 = jnp.where(active & is4, sp2, p2)
    op1 = jnp.where(active, jnp.where(is4, sp1, np1), p1)
    op0 = jnp.where(active, jnp.where(is4, sp0, np0), p0)
    oq0 = jnp.where(active, jnp.where(is4, sq0, nq0), q0)
    oq1 = jnp.where(active, jnp.where(is4, sq1, nq1), q1)
    oq2 = jnp.where(active & is4, sq2, q2)
    return jnp.stack([p3, op2, op1, op0, oq0, oq1, oq2, q3], axis=1)


# ---------------------------------------------------------------------- #
# Exact raster-order frame deblocking (reference: h264_loopfilter.c
# ff_h264_filter_mb applied per MB in decode order; spec §8.7).
#
# The spec order is MB-serial: each MB filters its 4 vertical then 4
# horizontal edges, and a MB's vertical edges read pixels the LEFT MB's
# horizontal filtering already modified.  The dependency set of MB
# (x, y) is {(x-1, y), (x, y-1), (x+1, y-1)} (writes of (x+1, y-1)'s
# left-edge column overlap (x, y)'s top-edge reads), so the valid
# parallel linearization is the x + 2y wavefront — every same-wave MB's
# read/write patches are column-disjoint (stride-2 in x), making one
# batched scan step per wave exact.
# ---------------------------------------------------------------------- #

import functools as _functools


@_functools.lru_cache(maxsize=32)
def deblock_frame_exact_jit(mb_w: int, mb_h: int, a_off: int = 0,
                            b_off: int = 0, part: bool = False,
                            cqpo=(0, 0), any_t8: bool = False,
                            field: bool = False):
    """Returns fn(yp, up, vp, intra_mb, qp_mb, nnz4, mv_mb) -> planes.

    cqpo: (cb, cr) chroma_qp_index_offsets applied before the chroma QP
    mapping (spec 8.7.2: QPc per plane). any_t8 adds a trailing t8
    (nmb,) bool arg: 8x8-transform MBs do not filter their 4x4-internal
    luma edges (spec 8.7: transform_size_8x8_flag edge set).

    yp (H, W) int32, up/vp (H/2, W/2) int32;
    intra_mb (nmb,) bool; qp_mb (nmb,) int32; nnz4 (4mb_h, 4mb_w) int;
    mv_mb (nmb, 2) int32 (quarter-pel, per MB).

    With part=True the motion inputs are block-granular and two-list:
    fn(yp, up, vp, intra_mb, qp_mb, nnz4, mv4_0, pid0, mv4_1, pid1)
    where mv4_* are (4mb_h, 4mb_w, 2) quarter-pel grids and pid* hold a
    per-block *picture id* (-1 = list unused) so the bS "different
    reference pictures" rule (spec 8.7.2.1) compares actual pictures,
    including the L0/L1-swapped bipred case.
    """
    import jax
    import jax.numpy as jnp

    from libav_tpu.codecs.h264.device import CHROMA_QP

    nmb = mb_w * mb_h
    bw, bh = 4 * mb_w, 4 * mb_h

    # wavefront tables: wave w = x + 2y
    n_waves = mb_w + 2 * (mb_h - 1)
    maxn = min(mb_h, (mb_w + 1) // 2 + 1)
    wx = np.zeros((n_waves, maxn), dtype=np.int32)
    wy = np.zeros((n_waves, maxn), dtype=np.int32)
    wmask = np.zeros((n_waves, maxn), dtype=bool)
    for w in range(n_waves):
        slot = 0
        for y in range(mb_h):
            x = w - 2 * y
            if 0 <= x < mb_w:
                wx[w, slot] = x
                wy[w, slot] = y
                wmask[w, slot] = True
                slot += 1
    # masked slots point into the scratch margin below the picture —
    # one full MB row BELOW it (a patch's top margin reaches 4 rows above
    # its MB, so y=mb_h would overlap the last picture rows and the
    # unfiltered write-back would clobber same-wave results). Adjacent
    # masked slots overlap only in columns they both leave unmodified.
    for w in range(n_waves):
        for slot in range(maxn):
            if not wmask[w, slot]:
                wy[w, slot] = mb_h + 1
                wx[w, slot] = min(slot, mb_w - 1)

    r20 = np.arange(20)
    r12 = np.arange(12)
    r16 = np.arange(16)
    r8 = np.arange(8)

    def build_bs(intra4, nnz4, m0, p0, m1, p1):
        """(bs_v, bs_h) (bh, bw) int32 — spec 8.7.2.1 (progressive).
        bS=1 unless the two sides use the same reference pictures with
        all matched-list MV deltas < 4 quarter-pel (either the straight
        L0/L0+L1/L1 matching or the swapped L0/L1+L1/L0 one)."""
        def bs_dir(shift_axis):
            ip = jnp.roll(intra4, 1, axis=shift_axis)
            np_ = jnp.roll(nnz4, 1, axis=shift_axis)
            m0r = jnp.roll(m0, 1, axis=shift_axis)
            m1r = jnp.roll(m1, 1, axis=shift_axis)
            p0r = jnp.roll(p0, 1, axis=shift_axis)
            p1r = jnp.roll(p1, 1, axis=shift_axis)
            idx = (jnp.arange(bw)[None, :] if shift_axis == 1
                   else jnp.arange(bh)[:, None])
            mbedge = (idx % 4) == 0
            either_intra = intra4 | ip
            coded = (nnz4 > 0) | (np_ > 0)
            # field pictures compare vertical MVs in field units:
            # threshold 2 quarter-pel (reference ff_h264_filter_mb_fast
            # mvy_limit = 4 >> FIELD_PICTURE)
            ylim = 2 if field else 4
            lim = jnp.array([4, ylim])
            small = lambda a, b: (jnp.abs(a - b) < lim).all(-1)
            straight = (p0 == p0r) & (p1 == p1r) & \
                small(m0, m0r) & small(m1, m1r)
            cross = (p0 == p1r) & (p1 == p0r) & \
                small(m0, m1r) & small(m1, m0r)
            # field pictures never strong-filter horizontal MB edges
            # (spec 8.7.2.1; reference h264_loopfilter.c:275 bSH=bS3)
            strong = 3 if (field and shift_axis == 0) else 4
            bs = jnp.where(either_intra,
                           jnp.where(mbedge, strong, 3),
                           jnp.where(coded, 2,
                                     jnp.where(straight | cross, 0, 1)))
            return jnp.where(idx == 0, 0, bs)
        return bs_dir(1), bs_dir(0)

    def fn(yp, up, vp, intra_mb, qp_mb, nnz4, mv_mb, pid0=None,
           mv4_1=None, pid1=None, t8=None):
        intra4 = jnp.repeat(jnp.repeat(
            intra_mb.reshape(mb_h, mb_w), 4, 0), 4, 1)
        qp4 = jnp.repeat(jnp.repeat(
            jnp.clip(qp_mb.astype(jnp.int32), 0, 51)
            .reshape(mb_h, mb_w), 4, 0), 4, 1)
        if part:
            m0 = mv_mb.astype(jnp.int32)
            p0 = pid0.astype(jnp.int32)
            m1 = mv4_1.astype(jnp.int32)
            p1 = pid1.astype(jnp.int32)
        else:
            m0 = jnp.repeat(jnp.repeat(
                mv_mb.astype(jnp.int32).reshape(mb_h, mb_w, 2), 4, 0),
                4, 1)
            p0 = jnp.zeros((bh, bw), jnp.int32)
            m1 = jnp.zeros((bh, bw, 2), jnp.int32)
            p1 = jnp.full((bh, bw), -1, jnp.int32)
        nnz4 = nnz4.astype(jnp.int32)

        bs_v, bs_h = build_bs(intra4, nnz4, m0, p0, m1, p1)
        if any_t8:
            # 8x8-transform MBs skip their 4x4-internal luma edges
            t84 = jnp.repeat(jnp.repeat(
                t8.reshape(mb_h, mb_w), 4, 0), 4, 1)
            colk = (jnp.arange(bw) % 4)[None, :]
            rowk = (jnp.arange(bh) % 4)[:, None]
            bs_v = jnp.where(t84 & ((colk % 2) == 1), 0, bs_v)
            bs_h = jnp.where(t84 & ((rowk % 2) == 1), 0, bs_h)
        qp_v = (qp4 + jnp.roll(qp4, 1, axis=1) + 1) >> 1
        qp_h = (qp4 + jnp.roll(qp4, 1, axis=0) + 1) >> 1
        cqp = jnp.asarray(CHROMA_QP)
        qp4u = cqp[jnp.clip(qp4 + cqpo[0], 0, 51)]
        qp4v = cqp[jnp.clip(qp4 + cqpo[1], 0, 51)]
        qp_vc = ((qp4u + jnp.roll(qp4u, 1, axis=1) + 1) >> 1,
                 (qp4v + jnp.roll(qp4v, 1, axis=1) + 1) >> 1)
        qp_hc = ((qp4u + jnp.roll(qp4u, 1, axis=0) + 1) >> 1,
                 (qp4v + jnp.roll(qp4v, 1, axis=0) + 1) >> 1)

        # pad grids with two zero scratch MB rows at the bottom
        def padg(g):
            return jnp.pad(g, ((0, 8), (0, 0)))
        bs_v, bs_h = padg(bs_v), padg(bs_h)
        qp_v, qp_h = padg(qp_v), padg(qp_h)
        qp_vc = (padg(qp_vc[0]), padg(qp_vc[1]))
        qp_hc = (padg(qp_hc[0]), padg(qp_hc[1]))

        # pad planes: 4 left/top margin + 2 scratch MB rows below
        ypad = jnp.pad(yp.astype(jnp.int32), ((4, 36), (4, 0)))
        upad = jnp.pad(up.astype(jnp.int32), ((4, 20), (4, 0)))
        vpad = jnp.pad(vp.astype(jnp.int32), ((4, 20), (4, 0)))

        def step(carry, wave):
            ypad, upad, vpad = carry
            x, y, mask = wave
            # ---------------- luma ----------------
            ys0 = y * 16            # padded row of patch top (y16-4+4)
            xs0 = x * 16
            P = ypad[ys0[:, None, None] + r20[None, :, None],
                     xs0[:, None, None] + r20[None, None, :]]
            by0 = y * 4
            bx0 = x * 4
            for k in range(4):
                c = 4 + 4 * k
                lines = P[:, 4:20, c - 4:c + 4].reshape(-1, 8)
                bs = jnp.repeat(
                    bs_v[by0[:, None] + np.arange(4)[None, :],
                         (bx0 + k)[:, None]], 4, axis=1).reshape(-1)
                qq = jnp.repeat(
                    qp_v[by0[:, None] + np.arange(4)[None, :],
                         (bx0 + k)[:, None]], 4, axis=1).reshape(-1)
                out = filter_edge_qp(lines, qq, bs, False, a_off, b_off)
                P = P.at[:, 4:20, c - 4:c + 4].set(
                    out.reshape(-1, 16, 8))
            for k in range(4):
                r = 4 + 4 * k
                sub = P[:, r - 4:r + 4, 4:20]          # (n, 8, 16)
                lines = sub.transpose(0, 2, 1).reshape(-1, 8)
                bs = jnp.repeat(
                    bs_h[(by0 + k)[:, None],
                         bx0[:, None] + np.arange(4)[None, :]],
                    4, axis=1).reshape(-1)
                qq = jnp.repeat(
                    qp_h[(by0 + k)[:, None],
                         bx0[:, None] + np.arange(4)[None, :]],
                    4, axis=1).reshape(-1)
                out = filter_edge_qp(lines, qq, bs, False, a_off, b_off)
                P = P.at[:, r - 4:r + 4, 4:20].set(
                    out.reshape(-1, 16, 8).transpose(0, 2, 1))
            ypad = ypad.at[ys0[:, None, None] + r20[None, :, None],
                           xs0[:, None, None] + r20[None, None, :]].set(P)

            # ---------------- chroma ----------------
            cys0 = y * 8
            cxs0 = x * 8
            for plane_i, cpad in ((0, upad), (1, vpad)):
                C = cpad[cys0[:, None, None] + r12[None, :, None],
                         cxs0[:, None, None] + r12[None, None, :]]
                for k in range(2):              # V edges at abs x8, x8+4
                    c = 4 + 4 * k
                    lines = C[:, 4:12, c - 4:c + 4].reshape(-1, 8)
                    # chroma row cr maps to luma block row (y8+cr)//2;
                    # luma block col = 4x + 2k
                    bs = bs_v[by0[:, None] + (np.arange(8) // 2)[None, :],
                              (bx0 + 2 * k)[:, None]].reshape(-1)
                    qq = qp_vc[plane_i][by0[:, None] +
                                        (np.arange(8) // 2)[None, :],
                                        (bx0 + 2 * k)[:, None]].reshape(-1)
                    out = filter_edge_qp(lines, qq, bs, True,
                                         a_off, b_off)
                    C = C.at[:, 4:12, c - 4:c + 4].set(
                        out.reshape(-1, 8, 8))
                for k in range(2):              # H edges at abs y8, y8+4
                    r = 4 + 4 * k
                    sub = C[:, r - 4:r + 4, 4:12]
                    lines = sub.transpose(0, 2, 1).reshape(-1, 8)
                    bs = bs_h[(by0 + 2 * k)[:, None],
                              bx0[:, None] +
                              (np.arange(8) // 2)[None, :]].reshape(-1)
                    qq = qp_hc[plane_i][(by0 + 2 * k)[:, None],
                                        bx0[:, None] +
                                        (np.arange(8) // 2)[None, :]
                                        ].reshape(-1)
                    out = filter_edge_qp(lines, qq, bs, True,
                                         a_off, b_off)
                    C = C.at[:, r - 4:r + 4, 4:12].set(
                        out.reshape(-1, 8, 8).transpose(0, 2, 1))
                if plane_i == 0:
                    upad = upad.at[cys0[:, None, None] +
                                   r12[None, :, None],
                                   cxs0[:, None, None] +
                                   r12[None, None, :]].set(C)
                else:
                    vpad = vpad.at[cys0[:, None, None] +
                                   r12[None, :, None],
                                   cxs0[:, None, None] +
                                   r12[None, None, :]].set(C)
            return (ypad, upad, vpad), None

        (ypad, upad, vpad), _ = jax.lax.scan(
            step, (ypad, upad, vpad),
            (jnp.asarray(wx), jnp.asarray(wy), jnp.asarray(wmask)))
        H, W = mb_h * 16, mb_w * 16
        return (ypad[4:4 + H, 4:], upad[4:4 + H // 2, 4:],
                vpad[4:4 + H // 2, 4:])

    return jax.jit(fn)


def deblock_frame_exact_ref(yp, up, vp, intra_mb, qp_mb, nnz4, mv_mb,
                            mb_w: int, mb_h: int, a_off: int = 0,
                            b_off: int = 0):
    """Golden scalar raster-order deblock (per-MB V-then-H, spec §8.7),
    used to validate the wavefront kernel."""
    yp = yp.astype(np.int64).copy()
    up = up.astype(np.int64).copy()
    vp = vp.astype(np.int64).copy()
    intra4 = np.repeat(np.repeat(
        np.asarray(intra_mb).reshape(mb_h, mb_w), 4, 0), 4, 1)
    qp4 = np.repeat(np.repeat(
        np.clip(np.asarray(qp_mb), 0, 51).reshape(mb_h, mb_w), 4, 0), 4, 1)
    mv4 = np.repeat(np.repeat(
        np.asarray(mv_mb).reshape(mb_h, mb_w, 2), 4, 0), 4, 1)
    nnz4 = np.asarray(nnz4)
    from libav_tpu.codecs.h264.device import CHROMA_QP

    def bs_of(bx, by, px, py, mbedge):
        if intra4[by, bx] or intra4[py, px]:
            return 4 if mbedge else 3
        if nnz4[by, bx] > 0 or nnz4[py, px] > 0:
            return 2
        if (np.abs(mv4[by, bx] - mv4[py, px]) >= 4).any():
            return 1
        return 0

    def filt(lines, qp, bs, chroma):
        import jax.numpy as jnp
        out = filter_edge_qp(jnp.asarray(lines),
                             jnp.full((len(lines),), qp, jnp.int32),
                             jnp.full((len(lines),), bs, jnp.int32),
                             chroma, a_off, b_off)
        return np.asarray(out)

    for my in range(mb_h):
        for mx in range(mb_w):
            # vertical edges, left to right
            for k in range(4):
                cx = mx * 16 + 4 * k
                if cx == 0:
                    continue
                for b in range(4):
                    by = my * 4 + b
                    bx = mx * 4 + k
                    bs = bs_of(bx, by, bx - 1, by, k == 0)
                    if bs == 0:
                        continue
                    qpav = (qp4[by, bx] + qp4[by, bx - 1] + 1) >> 1
                    rows = slice(by * 4, by * 4 + 4)
                    seg = yp[rows, cx - 4:cx + 4]
                    yp[rows, cx - 4:cx + 4] = filt(seg, qpav, bs, False)
                    if k in (0, 2):
                        ccx = cx // 2
                        cqp = (int(CHROMA_QP[qp4[by, bx]]) +
                               int(CHROMA_QP[qp4[by, bx - 1]]) + 1) >> 1
                        crows = slice(by * 2, by * 2 + 2)
                        for cp in (up, vp):
                            seg = np.zeros((2, 8), np.int64)
                            seg[:, 2:6] = cp[crows, ccx - 2:ccx + 2]
                            f = filt(seg, cqp, bs, True)
                            cp[crows, ccx - 2:ccx + 2] = f[:, 2:6]
            # horizontal edges, top to bottom
            for k in range(4):
                cy = my * 16 + 4 * k
                if cy == 0:
                    continue
                for b in range(4):
                    bx = mx * 4 + b
                    by = my * 4 + k
                    bs = bs_of(bx, by, bx, by - 1, k == 0)
                    if bs == 0:
                        continue
                    qpav = (qp4[by, bx] + qp4[by - 1, bx] + 1) >> 1
                    cols = slice(bx * 4, bx * 4 + 4)
                    seg = yp[cy - 4:cy + 4, cols].T
                    yp[cy - 4:cy + 4, cols] = filt(seg, qpav, bs, False).T
                    if k in (0, 2):
                        ccy = cy // 2
                        cqp = (int(CHROMA_QP[qp4[by, bx]]) +
                               int(CHROMA_QP[qp4[by - 1, bx]]) + 1) >> 1
                        ccols = slice(bx * 2, bx * 2 + 2)
                        for cp in (up, vp):
                            seg = np.zeros((2, 8), np.int64)
                            seg[:, 2:6] = cp[ccy - 2:ccy + 2, ccols].T
                            f = filt(seg, cqp, bs, True)
                            cp[ccy - 2:ccy + 2, ccols] = f[:, 2:6].T
    return yp.astype(np.int32), up.astype(np.int32), vp.astype(np.int32)
