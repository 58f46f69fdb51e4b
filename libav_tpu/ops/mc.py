"""Batched half-pel motion compensation (reference: libavcodec/hpeldsp.h
put/avg_pixels_tab + mpegvideo_motion.c mpeg_motion — SURVEY.md §2.2).

TPU-first design: the reference dispatches one of 4 hpel filters per block
through function pointers; here ALL macroblocks of a frame gather their
(S+1)x(S+1) source patches from the padded reference plane in one XLA
gather (vmapped dynamic_slice), compute all four half-pel phases
vectorized on the VPU, and select per-MB with a mask — no data-dependent
control flow, one kernel launch per plane.

Rounding follows ISO 11172-2 / 13818-2: (a+b+1)>>1 two-tap,
(a+b+c+d+2)>>2 four-tap (the "put" no-rounding variants used for
bidirectional averaging use +1/+2 the same way; "no_rnd" variants for
MPEG-4 rounding control take bias 0/1).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

EDGE = 16   # reference: mpegvideo EDGE_WIDTH — frame padding for MC


# ---------------------------------------------------------------------- #
# NumPy golden reference (checkasm "call_ref")
# ---------------------------------------------------------------------- #

def pad_plane_ref(plane: np.ndarray, edge: int = EDGE) -> np.ndarray:
    """Edge-replicate pad (reference: videodsp emulated_edge_mc /
    draw_edges)."""
    return np.pad(plane, edge, mode="edge")


def mc_hpel_ref(padded: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                mvx: np.ndarray, mvy: np.ndarray, size: int,
                rnd: int = 1) -> np.ndarray:
    """Golden: for each block i, half-pel MC of a size x size block whose
    top-left corner in unpadded coords is (xs[i], ys[i]) displaced by
    half-pel motion vector (mvx[i], mvy[i]).
    padded is the edge-padded reference plane. Returns (B, size, size)."""
    B = len(xs)
    out = np.zeros((B, size, size), dtype=np.int32)
    for i in range(B):
        x0 = int(xs[i]) + (int(mvx[i]) >> 1) + EDGE
        y0 = int(ys[i]) + (int(mvy[i]) >> 1) + EDGE
        fx, fy = int(mvx[i]) & 1, int(mvy[i]) & 1
        p = padded[y0:y0 + size + 1, x0:x0 + size + 1].astype(np.int32)
        if not fx and not fy:
            out[i] = p[:size, :size]
        elif fx and not fy:
            out[i] = (p[:size, :size] + p[:size, 1:size + 1] + rnd) >> 1
        elif not fx and fy:
            out[i] = (p[:size, :size] + p[1:size + 1, :size] + rnd) >> 1
        else:
            out[i] = (p[:size, :size] + p[:size, 1:size + 1] +
                      p[1:size + 1, :size] + p[1:size + 1, 1:size + 1]
                      + 1 + rnd) >> 2
    return out


# ---------------------------------------------------------------------- #
# JAX kernels
# ---------------------------------------------------------------------- #

def pad_plane(plane, edge: int = EDGE):
    import jax.numpy as jnp
    return jnp.pad(plane, edge, mode="edge")


def mc_hpel(padded, xs, ys, mvx, mvy, size: int, rnd: int = 1):
    """Batched half-pel MC. padded: (H+2E, W+2E) uint8/int32 device array;
    xs, ys, mvx, mvy: (B,) int32. Returns (B, size, size) int32.

    All four phases are computed and masked — 4x the VPU work of the exact
    phase, but no divergence, no host round-trip, and XLA fuses the phase
    arithmetic into the gather consumers. For 16x16 luma this is still
    <1% of frame FLOPs.
    """
    import jax
    import jax.numpy as jnp

    x0 = xs + (mvx >> 1) + EDGE
    y0 = ys + (mvy >> 1) + EDGE
    fx = (mvx & 1)[:, None, None]
    fy = (mvy & 1)[:, None, None]

    def slice_one(y, x):
        return jax.lax.dynamic_slice(padded, (y, x), (size + 1, size + 1))

    p = jax.vmap(slice_one)(y0, x0).astype(jnp.int32)   # (B, S+1, S+1)

    p00 = p[:, :size, :size]
    p01 = p[:, :size, 1:size + 1]
    p10 = p[:, 1:size + 1, :size]
    p11 = p[:, 1:size + 1, 1:size + 1]

    h = (p00 + p01 + rnd) >> 1
    v = (p00 + p10 + rnd) >> 1
    hv = (p00 + p01 + p10 + p11 + 1 + rnd) >> 2

    out = jnp.where(fx & fy, hv,
                    jnp.where(fx, h, jnp.where(fy, v, p00)))
    return out


def avg_pred(a, b):
    """Bidirectional average (reference: hpeldsp avg_pixels:
    (a + b + 1) >> 1)."""
    return (a + b + 1) >> 1


def chroma_mv_div2(mv):
    """MPEG-1/2 chroma motion vector: luma mv / 2 with truncation toward
    zero (ISO 11172-2 §2.4.4.2; reference: mpegvideo_motion.c chroma
    path). Works on numpy or jax int arrays."""
    return mv // 2 + ((mv % 2) != 0) * (mv < 0)


def chroma_mv_div2_ref(mv: np.ndarray) -> np.ndarray:
    return np.trunc(mv / 2).astype(mv.dtype)


def chroma_mv_h263(mv):
    """H.263 / MPEG-4 1MV chroma motion derivation (reference:
    mpegvideo_motion.c mpeg_motion_internal FMT_H263 path:
    uvdxy = dxy | (my & 2) | ((mx & 2) >> 1); uvsrc = luma_src >> 1 —
    i.e. chroma halfpel whenever mv % 4 != 0, integer part mv >> 2).
    Returns the chroma MV in chroma half-pel units."""
    return 2 * (mv >> 2) + ((mv & 3) != 0)


def chroma_mv_h263_ref(mv: np.ndarray) -> np.ndarray:
    return 2 * (mv >> 2) + ((mv & 3) != 0).astype(mv.dtype)


_H263_CHROMA_ROUNDTAB = np.array(
    [0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 1, 1], dtype=np.int32)


def chroma_mv_h263_4mv(mv_sum):
    """H.263/MPEG-4 4MV chroma vector from the SUM of the four luma MVs
    (reference: motion_est.h:96 ff_h263_round_chroma:
    roundtab[x & 0xf] + (x >> 3))."""
    import jax.numpy as jnp
    tab = jnp.asarray(_H263_CHROMA_ROUNDTAB)
    return tab[mv_sum & 0xF] + (mv_sum >> 3)


# ---------------------------------------------------------------------- #
# MPEG-4 ASP quarter-sample MC (reference: qpeldsp.c QPEL_MC — 8-tap
# lowpass with edge-clamped taps + staged half-pel averages; spec
# 14496-2 subclause 7.6.2.2). The lowpass is expressed as one constant
# (17, 16) integer matrix so both directions run as matmuls.
# ---------------------------------------------------------------------- #

def _qpel_lowpass_matrix(n: int = 16) -> np.ndarray:
    """M[i, j]: contribution of src[i] (0..n) to dst[j] (0..n-1),
    transcribed from qpeldsp.c mpeg4_qpel16_h_lowpass (n=16) /
    mpeg4_qpel8_h_lowpass (n=8) — edge taps reflect within the n+1
    extended block, which is why 8x8-tiled MC differs from 16x16."""
    M = np.zeros((n + 1, n), dtype=np.int32)
    for j in range(n):
        pairs = [((j, j + 1), 20),
                 ((j - 1, j + 2), -6),
                 ((j - 2, j + 3), 3),
                 ((j - 3, j + 4), -1)]
        for (i1, i2), w in pairs:
            for i in (i1, i2):
                if i < 0:
                    i = -i - 1          # left reflection 0,1,2 pattern
                if i > n:
                    i = 2 * n + 1 - i   # right reflection
                M[i, j] += w
    return M


def mc_qpel_mpeg4_ref(padded: np.ndarray, xs, ys, mvx, mvy,
                      no_rnd: int = 0) -> np.ndarray:
    """Golden scalar MPEG-4 quarter-sample 16x16 MC (put / put_no_rnd)."""
    M = _qpel_lowpass_matrix()
    r1 = 15 if no_rnd else 16
    a2 = 0 if no_rnd else 1
    B = len(xs)
    out = np.zeros((B, 16, 16), dtype=np.int32)
    for i in range(B):
        x0 = int(xs[i]) + (int(mvx[i]) >> 2) + EDGE
        y0 = int(ys[i]) + (int(mvy[i]) >> 2) + EDGE
        dx, dy = int(mvx[i]) & 3, int(mvy[i]) & 3
        p = padded[y0:y0 + 17, x0:x0 + 17].astype(np.int64)
        hh = np.clip((p @ M + r1) >> 5, 0, 255)          # (17, 16)
        if dx == 0:
            X = p[:, :16]
        elif dx == 1:
            X = (hh + p[:, :16] + a2) >> 1
        elif dx == 2:
            X = hh
        else:
            X = (hh + p[:, 1:17] + a2) >> 1
        vx = np.clip((M.T @ X + r1) >> 5, 0, 255)        # (16, 16)
        if dy == 0:
            out[i] = X[:16]
        elif dy == 1:
            out[i] = (X[:16] + vx + a2) >> 1
        elif dy == 2:
            out[i] = vx
        else:
            out[i] = (X[1:17] + vx + a2) >> 1
    return out


def mc_qpel_mpeg4(padded, xs, ys, mvx, mvy, no_rnd: int = 0):
    """Batched device version: one (17,17) gather per block, lowpass as
    matmuls against the constant tap matrix, phase selects masked."""
    import jax
    import jax.numpy as jnp
    M = jnp.asarray(_qpel_lowpass_matrix())
    r1 = 15 if no_rnd else 16
    a2 = 0 if no_rnd else 1
    H, W = padded.shape
    x0 = jnp.clip(xs + (mvx >> 2) + EDGE, 0, W - 17)
    y0 = jnp.clip(ys + (mvy >> 2) + EDGE, 0, H - 17)
    dx = (mvx & 3)[:, None, None]
    dy = (mvy & 3)[:, None, None]

    def slice_one(y, x):
        return jax.lax.dynamic_slice(padded, (y, x), (17, 17))
    p = jax.vmap(slice_one)(y0, x0).astype(jnp.int32)    # (B,17,17)

    hh = jnp.clip((p @ M + r1) >> 5, 0, 255)             # (B,17,16)
    Xl = p[:, :, :16]
    Xr = p[:, :, 1:17]
    X = jnp.where(dx == 0, Xl,
                  jnp.where(dx == 1, (hh + Xl + a2) >> 1,
                            jnp.where(dx == 2, hh,
                                      (hh + Xr + a2) >> 1)))
    vx = jnp.clip((jnp.einsum("ij,bik->bjk", M, X,
                              preferred_element_type=jnp.int32)
                   + r1) >> 5, 0, 255)                   # (B,16,16)
    Xt = X[:, :16]
    Xb = X[:, 1:17]
    return jnp.where(dy == 0, Xt,
                     jnp.where(dy == 1, (Xt + vx + a2) >> 1,
                               jnp.where(dy == 2, vx,
                                         (Xb + vx + a2) >> 1)))


def mc_qpel_mpeg4_8(padded, xs, ys, mvx, mvy, no_rnd: int = 0):
    """8x8-block quarter-sample MC (qpeldsp.c put_qpel8 chain): same
    staged lowpass as the 16x16 version but with the 8-wide reflection
    matrix. Inputs are per-8x8-block position/mv arrays."""
    import jax
    import jax.numpy as jnp
    M = jnp.asarray(_qpel_lowpass_matrix(8))
    r1 = 15 if no_rnd else 16
    a2 = 0 if no_rnd else 1
    H, W = padded.shape
    x0 = jnp.clip(xs + (mvx >> 2) + EDGE, 0, W - 9)
    y0 = jnp.clip(ys + (mvy >> 2) + EDGE, 0, H - 9)
    dx = (mvx & 3)[:, None, None]
    dy = (mvy & 3)[:, None, None]

    def slice_one(y, x):
        return jax.lax.dynamic_slice(padded, (y, x), (9, 9))
    p = jax.vmap(slice_one)(y0, x0).astype(jnp.int32)    # (B,9,9)

    hh = jnp.clip((p @ M + r1) >> 5, 0, 255)             # (B,9,8)
    Xl = p[:, :, :8]
    Xr = p[:, :, 1:9]
    X = jnp.where(dx == 0, Xl,
                  jnp.where(dx == 1, (hh + Xl + a2) >> 1,
                            jnp.where(dx == 2, hh,
                                      (hh + Xr + a2) >> 1)))
    vx = jnp.clip((jnp.einsum("ij,bik->bjk", M, X,
                              preferred_element_type=jnp.int32)
                   + r1) >> 5, 0, 255)                   # (B,8,8)
    Xt = X[:, :8]
    Xb = X[:, 1:9]
    return jnp.where(dy == 0, Xt,
                     jnp.where(dy == 1, (Xt + vx + a2) >> 1,
                               jnp.where(dy == 2, vx,
                                         (Xb + vx + a2) >> 1)))


def mc_qpel_mpeg4_tiled8(padded, xs, ys, mv4, no_rnd: int = 0):
    """16x16 prediction built from four 8x8 qpel blocks with per-block
    motion vectors mv4 (B,4,2) — the reference's MV_TYPE_8X8 path
    (mpegvideo_motion.c apply_8x8): MPEG-4 4MV in quarter-sample mode
    and qpel direct mode (mpeg4video.c:176, equal vectors)."""
    import jax.numpy as jnp
    B = xs.shape[0]
    offs = jnp.asarray([(0, 0), (8, 0), (0, 8), (8, 8)], jnp.int32)
    xs4 = (xs[:, None] + offs[None, :, 0]).reshape(-1)
    ys4 = (ys[:, None] + offs[None, :, 1]).reshape(-1)
    blk = mc_qpel_mpeg4_8(padded, xs4, ys4,
                          mv4[:, :, 0].reshape(-1),
                          mv4[:, :, 1].reshape(-1), no_rnd)
    blk = blk.reshape(B, 2, 2, 8, 8)
    return (blk.transpose(0, 1, 3, 2, 4).reshape(B, 16, 16))


def mc_hpel_tiled8(padded, xs, ys, mv4, rnd: int = 1):
    """16x16 from four 8x8 half-pel blocks with per-block MVs (B,4,2)
    (reference apply_8x8 non-quarter branch / hpel_motion per block)."""
    import jax.numpy as jnp
    B = xs.shape[0]
    offs = jnp.asarray([(0, 0), (8, 0), (0, 8), (8, 8)], jnp.int32)
    xs4 = (xs[:, None] + offs[None, :, 0]).reshape(-1)
    ys4 = (ys[:, None] + offs[None, :, 1]).reshape(-1)
    blk = mc_hpel(padded, xs4, ys4, mv4[:, :, 0].reshape(-1),
                  mv4[:, :, 1].reshape(-1), 8, rnd)
    blk = blk.reshape(B, 2, 2, 8, 8)
    return (blk.transpose(0, 1, 3, 2, 4).reshape(B, 16, 16))


def chroma_mv_4mv_hpel(mv4):
    """Chroma MV from four half-pel luma MVs (B,4,2): plain sum + 4MV
    rounding (apply_8x8 + chroma_4mv_motion)."""
    return chroma_mv_h263_4mv(mv4.sum(axis=1))


def chroma_mv_4mv_qpel(mv4):
    """Chroma MV from four quarter-pel luma MVs: each C-trunc halved,
    summed, then 4MV rounding (apply_8x8 quarter branch)."""
    import jax.numpy as jnp
    t = jnp.where(mv4 >= 0, mv4 >> 1, -((-mv4) >> 1))    # C trunc /2
    return chroma_mv_h263_4mv(t.sum(axis=1))


def chroma_mv_qpel(mv):
    """Chroma half-pel MV from a quarter-sample luma MV (reference:
    mpegvideo_motion.c qpel_motion: trunc-div by 2, then the standard
    (x>>1)|(x&1) half-pel rounding)."""
    import jax.numpy as jnp
    t = jnp.where(mv >= 0, mv >> 1, -((-mv) >> 1))       # C trunc /2
    return (t >> 1) | (t & 1)
