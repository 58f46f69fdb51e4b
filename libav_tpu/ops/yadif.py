"""yadif deinterlace kernel on device (reference: libavfilter/vf_yadif.c).

The reference filters one output field per call: lines of the missing
field (``(y ^ parity) & 1``) are synthesized from three temporally
adjacent frames with an edge-directed spatial predictor clamped by a
temporal envelope (``FILTER`` macro, vf_yadif.c:57-99); the other lines
are copied from the current frame (filter_slice, vf_yadif.c:192-231).
Here the whole plane is one jitted XLA program: the per-pixel C loop
becomes elementwise tensor algebra over column-shifted views, and the
sequential CHECK(-1)/CHECK(-2)/CHECK(1)/CHECK(2) score chain becomes a
``where`` cascade (the nesting matters: CHECK(±2) only runs when
CHECK(±1) improved the score).

Bit-exact vs the reference C path (cross-validated in
tests/test_fate_cross.py against ``-vf yadif`` framecrc output).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _max3(a, b, c):
    return jnp.maximum(a, jnp.maximum(b, c))


def _min3(a, b, c):
    return jnp.minimum(a, jnp.minimum(b, c))


@partial(jax.jit, static_argnames=("parity", "tff", "mode"))
def _yadif_plane_jit(prev, cur, nxt, parity: int, tff: int, mode: int):
    h, w = cur.shape
    prev = prev.astype(jnp.int32)
    cur_ = cur.astype(jnp.int32)
    nxt = nxt.astype(jnp.int32)

    ys = jnp.arange(h)
    # mrefs/prefs row mirroring (filter_slice: y ? -refs : refs etc.)
    my = jnp.where(ys > 0, ys - 1, 1)
    py = jnp.where(ys < h - 1, ys + 1, h - 2)
    # 2*mrefs / 2*prefs rows for the temporal envelope; rows 1 and h-2
    # never take that branch (mode forced to 2 there), clip keeps the
    # gather in bounds where the value is unused.
    m2 = jnp.clip(jnp.where(ys > 0, ys - 2, ys + 2), 0, h - 1)
    p2 = jnp.clip(jnp.where(ys < h - 1, ys + 2, ys - 2), 0, h - 1)

    par = parity ^ tff
    prev2 = prev if par else cur_
    next2 = cur_ if par else nxt

    c = cur_[my]            # cur[mrefs]
    e = cur_[py]            # cur[prefs]
    d = (prev2 + next2) >> 1
    td0 = jnp.abs(prev2 - next2)
    td1 = (jnp.abs(prev[my] - c) + jnp.abs(prev[py] - e)) >> 1
    td2 = (jnp.abs(nxt[my] - c) + jnp.abs(nxt[py] - e)) >> 1
    diff = _max3(td0 >> 1, td1, td2)
    sp = (c + e) >> 1

    # Edge-directed spatial search over column shifts.  cm/cp are the
    # mrefs/prefs rows padded by 3 columns so cur[mrefs + j] == cm[:, x+3+j].
    cm = jnp.pad(c, ((0, 0), (3, 3)), mode="edge")
    cp = jnp.pad(e, ((0, 0), (3, 3)), mode="edge")

    def col(a, j):
        return jax.lax.dynamic_slice_in_dim(a, 3 + j, w, axis=1)

    def score(j):
        return (jnp.abs(col(cm, -1 + j) - col(cp, -1 - j))
                + jnp.abs(col(cm, j) - col(cp, -j))
                + jnp.abs(col(cm, 1 + j) - col(cp, 1 - j)))

    def pred(j):
        return (col(cm, j) + col(cp, -j)) >> 1

    ss = score(0) - 1
    sp_e = sp
    imp1 = score(-1) < ss
    ss = jnp.where(imp1, score(-1), ss)
    sp_e = jnp.where(imp1, pred(-1), sp_e)
    imp2 = imp1 & (score(-2) < ss)          # CHECK(-2) nested in CHECK(-1)
    ss = jnp.where(imp2, score(-2), ss)
    sp_e = jnp.where(imp2, pred(-2), sp_e)
    imp1 = score(1) < ss
    ss = jnp.where(imp1, score(1), ss)
    sp_e = jnp.where(imp1, pred(1), sp_e)
    imp2 = imp1 & (score(2) < ss)
    sp_e = jnp.where(imp2, pred(2), sp_e)

    xs = jnp.arange(w)
    not_edge = (xs >= 3) & (xs < w - 3)
    sp = jnp.where(not_edge[None, :], sp_e, sp)

    if mode < 2:
        b = (prev2[m2] + next2[m2]) >> 1
        f = (prev2[p2] + next2[p2]) >> 1
        mx = _max3(d - e, d - c, jnp.minimum(b - c, f - e))
        mn = _min3(d - e, d - c, jnp.maximum(b - c, f - e))
        diff2 = _max3(diff, mn, -mx)
        # rows 1 and h-2 run with mode forced to 2 (filter_slice:216)
        rmask = (ys != 1) & (ys != h - 2)
        diff = jnp.where(rmask[:, None], diff2, diff)

    out = jnp.clip(sp, d - diff, d + diff)
    keep = ((ys ^ parity) & 1) == 0
    out = jnp.where(keep[:, None], cur_, out)
    return out.astype(jnp.uint8)


def yadif_plane(prev: np.ndarray, cur: np.ndarray, nxt: np.ndarray,
                parity: int, tff: int, mode: int) -> np.ndarray:
    """Deinterlace one uint8 plane; returns the full output plane."""
    return np.asarray(_yadif_plane_jit(
        np.ascontiguousarray(prev), np.ascontiguousarray(cur),
        np.ascontiguousarray(nxt), int(parity) & 1, int(tff) & 1, int(mode)))
