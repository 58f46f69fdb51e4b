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
