"""H.264 quarter-pel luma + eighth-pel chroma motion compensation
(reference: libavcodec/h264qpel.h:27-30 put/avg_h264_qpel_pixels_tab
[4 sizes][16 phases], h264qpel_template.c (552); h264chroma bilinear;
spec ISO 14496-10 §8.4.2.2).

TPU-first: one gather of the (S+5+1)^2 source patch per block, then the
three half-pel planes (6-tap separable (1,-5,20,20,-5,1)) are computed for
ALL blocks vectorized, and the 16 phase outputs are formed by shifted
averages + per-block phase masks — replacing the reference's 16-entry
function-pointer table with one fused program.
"""

from __future__ import annotations

import numpy as np

from libav_tpu.ops.mc import EDGE

_W6 = (1, -5, 20, 20, -5, 1)


def _conv6_np(x, axis):
    out = 0
    for t, w in enumerate(_W6):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(t, x.shape[axis] - 5 + t)
        out = out + w * x[tuple(sl)]
    return out


def qpel_mc_ref(padded: np.ndarray, xs, ys, mvx, mvy, size: int) -> np.ndarray:
    """Golden quarter-pel MC. padded edge-padded by EDGE (>= size+5 margin
    safe). mv in quarter-pel units. Returns (B, size, size) int32."""
    B = len(xs)
    out = np.zeros((B, size, size), dtype=np.int32)
    S = size
    for i in range(B):
        x0 = int(xs[i]) + (int(mvx[i]) >> 2) + EDGE
        y0 = int(ys[i]) + (int(mvy[i]) >> 2) + EDGE
        fx, fy = int(mvx[i]) & 3, int(mvy[i]) & 3
        P = padded[y0 - 2:y0 + S + 4, x0 - 2:x0 + S + 4].astype(np.int64)
        # grids (S+1, S+1)
        G = P[2:S + 3, 2:S + 3]
        b1 = _conv6_np(P, 1)                    # (S+6, S+1)
        b = np.clip((b1[2:S + 3] + 16) >> 5, 0, 255)
        h1 = _conv6_np(P, 0)                    # (S+1, S+6)
        h = np.clip((h1[:, 2:S + 3] + 16) >> 5, 0, 255)
        j1 = _conv6_np(b1, 0)                   # (S+1, S+1)
        j = np.clip((j1 + 512) >> 10, 0, 255)

        def avg(a, bb):
            return (a + bb + 1) >> 1

        sl0 = (slice(0, S), slice(0, S))
        slx = (slice(0, S), slice(1, S + 1))
        sly = (slice(1, S + 1), slice(0, S))
        table = {
            (0, 0): G[sl0],
            (1, 0): avg(G[sl0], b[sl0]),
            (2, 0): b[sl0],
            (3, 0): avg(b[sl0], G[slx]),
            (0, 1): avg(G[sl0], h[sl0]),
            (0, 2): h[sl0],
            (0, 3): avg(h[sl0], G[sly]),
            (2, 2): j[sl0],
            (2, 1): avg(b[sl0], j[sl0]),
            (2, 3): avg(j[sl0], b[sly]),
            (1, 2): avg(h[sl0], j[sl0]),
            (3, 2): avg(j[sl0], h[slx]),
            (1, 1): avg(b[sl0], h[sl0]),
            (3, 1): avg(b[sl0], h[slx]),
            (1, 3): avg(b[sly], h[sl0]),
            (3, 3): avg(b[sly], h[slx]),
        }
        out[i] = np.clip(table[(fx, fy)], 0, 255)
    return out


def qpel_mc(padded, xs, ys, mvx, mvy, size: int, ridx=None):
    """Batched quarter-pel MC on device. Same contract as qpel_mc_ref.
    With multi-reference slices, padded is a (R, Hp, Wp) stack and ridx
    (B,) selects each block's reference plane."""
    import jax
    import jax.numpy as jnp

    S = size
    x0 = xs + (mvx >> 2) + EDGE - 2
    y0 = ys + (mvy >> 2) + EDGE - 2
    fx = (mvx & 3)[:, None, None]
    fy = (mvy & 3)[:, None, None]

    if ridx is None:
        def slice_one(y, x):
            return jax.lax.dynamic_slice(padded, (y, x), (S + 6, S + 6))
        P = jax.vmap(slice_one)(y0, x0).astype(jnp.int32)
    else:
        def slice_ref(r, y, x):
            return jax.lax.dynamic_slice(
                padded, (r, y, x), (1, S + 6, S + 6))[0]
        P = jax.vmap(slice_ref)(ridx, y0, x0).astype(jnp.int32)

    def conv6(x, axis):
        out = 0
        n = x.shape[axis]
        for t, w in enumerate(_W6):
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(t, n - 5 + t)
            out = out + w * x[tuple(idx)]
        return out

    G = P[:, 2:S + 3, 2:S + 3]
    b1 = conv6(P, 2)                            # (B, S+6, S+1)
    b = jnp.clip((b1[:, 2:S + 3] + 16) >> 5, 0, 255)
    h1 = conv6(P, 1)                            # (B, S+1, S+6)
    h = jnp.clip((h1[:, :, 2:S + 3] + 16) >> 5, 0, 255)
    j1 = conv6(b1, 1)                           # (B, S+1, S+1)
    j = jnp.clip((j1 + 512) >> 10, 0, 255)

    def avg(a, bb):
        return (a + bb + 1) >> 1

    g0 = G[:, :S, :S]
    gx = G[:, :S, 1:S + 1]
    gy = G[:, 1:S + 1, :S]
    b0 = b[:, :S, :S]
    bx = b[:, :S, 1:S + 1]
    by = b[:, 1:S + 1, :S]
    h0 = h[:, :S, :S]
    hx = h[:, :S, 1:S + 1]
    j0 = j[:, :S, :S]

    # select along x then y like a 4x4 decision table
    # rows: fy, cols: fx
    tbl = [
        [g0, avg(g0, b0), b0, avg(b0, gx)],
        [avg(g0, h0), avg(b0, h0), avg(b0, j0), avg(b0, hx)],
        [h0, avg(h0, j0), j0, avg(j0, hx)],
        [avg(h0, gy), avg(by, h0), avg(j0, by), avg(by, hx)],
    ]
    rows = []
    for r in range(4):
        v = tbl[r][3]
        for c in (2, 1, 0):
            v = jnp.where(fx == c, tbl[r][c], v)
        rows.append(v)
    out = rows[3]
    for r in (2, 1, 0):
        out = jnp.where(fy == r, rows[r], out)
    return jnp.clip(out, 0, 255)


# ---------------------------------------------------------------------- #

def chroma_mc_ref(padded: np.ndarray, xs, ys, mvx, mvy, size: int) -> np.ndarray:
    """Golden eighth-pel bilinear chroma MC (spec 8.4.2.2.2); mv in
    eighth-pel units."""
    B = len(xs)
    out = np.zeros((B, size, size), dtype=np.int32)
    S = size
    for i in range(B):
        x0 = int(xs[i]) + (int(mvx[i]) >> 3) + EDGE
        y0 = int(ys[i]) + (int(mvy[i]) >> 3) + EDGE
        dx, dy = int(mvx[i]) & 7, int(mvy[i]) & 7
        P = padded[y0:y0 + S + 1, x0:x0 + S + 1].astype(np.int64)
        A = P[:S, :S]
        Bs = P[:S, 1:S + 1]
        C = P[1:S + 1, :S]
        D = P[1:S + 1, 1:S + 1]
        out[i] = ((8 - dx) * (8 - dy) * A + dx * (8 - dy) * Bs +
                  (8 - dx) * dy * C + dx * dy * D + 32) >> 6
    return out


def chroma_mc(padded, xs, ys, mvx, mvy, size: int, ridx=None):
    import jax
    import jax.numpy as jnp
    S = size
    x0 = xs + (mvx >> 3) + EDGE
    y0 = ys + (mvy >> 3) + EDGE
    dx = (mvx & 7)[:, None, None]
    dy = (mvy & 7)[:, None, None]

    if ridx is None:
        def slice_one(y, x):
            return jax.lax.dynamic_slice(padded, (y, x), (S + 1, S + 1))
        P = jax.vmap(slice_one)(y0, x0).astype(jnp.int32)
    else:
        def slice_ref(r, y, x):
            return jax.lax.dynamic_slice(
                padded, (r, y, x), (1, S + 1, S + 1))[0]
        P = jax.vmap(slice_ref)(ridx, y0, x0).astype(jnp.int32)
    A = P[:, :S, :S]
    B_ = P[:, :S, 1:S + 1]
    C = P[:, 1:S + 1, :S]
    D = P[:, 1:S + 1, 1:S + 1]
    return ((8 - dx) * (8 - dy) * A + dx * (8 - dy) * B_ +
            (8 - dx) * dy * C + dx * dy * D + 32) >> 6
