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


def filter_edge_qp(lines, qp, bs, chroma: bool = False):
    """Batched edge filter with per-line qp (frame-level application:
    every edge line carries the averaged qp of its two macroblocks).
    lines (B,8), qp (B,), bs (B,)."""
    import jax.numpy as jnp
    x = lines.astype(jnp.int32)
    p3, p2, p1, p0 = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
    q0, q1, q2, q3 = x[:, 4], x[:, 5], x[:, 6], x[:, 7]
    qp = jnp.clip(qp.astype(jnp.int32), 0, 51)
    alpha = jnp.asarray(ALPHA)[qp]
    beta = jnp.asarray(BETA)[qp]
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
