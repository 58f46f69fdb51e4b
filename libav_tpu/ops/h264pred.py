"""H.264 intra prediction (reference: libavcodec/h264pred.c +
h264pred_template.c (1354) — all modes as batched tensor ops; spec
ISO 14496-10 §8.3).

Called from inside the decoder's wavefront scan: each invocation predicts
a batch of macroblocks from their neighbor pixel vectors (top row, left
column, top-left corner) gathered from the partially-reconstructed frame.
Mode selection is per-MB via masks — no data-dependent branching.

Round-1 coverage: I_16x16 (V/H/DC/Plane), chroma 8x8 (DC/H/V/Plane).
I_4x4's nine modes follow in round 2 (they add an in-MB 16-step wavefront).
"""

from __future__ import annotations

import numpy as np


def pred16x16_ref(mode, top, left, topleft, avail_top, avail_left):
    """Golden. mode,avail_*: (B,), top/left: (B,16), topleft: (B,).
    Modes: 0=V 1=H 2=DC 3=Plane. Returns (B,16,16) int32."""
    B = len(mode)
    out = np.zeros((B, 16, 16), dtype=np.int32)
    for i in range(B):
        t = top[i].astype(np.int64)
        l = left[i].astype(np.int64)
        at, al = bool(avail_top[i]), bool(avail_left[i])
        m = int(mode[i])
        if m == 0:
            out[i] = np.broadcast_to(t, (16, 16))
        elif m == 1:
            out[i] = np.broadcast_to(l[:, None], (16, 16))
        elif m == 2:
            if at and al:
                dc = (t.sum() + l.sum() + 16) >> 5
            elif at:
                dc = (t.sum() + 8) >> 4
            elif al:
                dc = (l.sum() + 8) >> 4
            else:
                dc = 128
            out[i] = dc
        else:
            tl = int(topleft[i])
            tt = np.concatenate([[tl], t])
            ll = np.concatenate([[tl], l])
            Hsum = sum(x * (tt[8 + x] - tt[8 - x]) for x in range(1, 9))
            Vsum = sum(y * (ll[8 + y] - ll[8 - y]) for y in range(1, 9))
            b = (5 * Hsum + 32) >> 6
            c = (5 * Vsum + 32) >> 6
            a = 16 * (t[15] + l[15])
            yy, xx = np.mgrid[0:16, 0:16]
            out[i] = np.clip((a + b * (xx - 7) + c * (yy - 7) + 16) >> 5,
                             0, 255)
    return out


def pred16x16(mode, top, left, topleft, avail_top, avail_left):
    """Batched device version; same contract as pred16x16_ref."""
    import jax.numpy as jnp
    B = top.shape[0]
    t = top.astype(jnp.int32)
    l = left.astype(jnp.int32)
    at = avail_top.astype(bool)
    al = avail_left.astype(bool)

    v = jnp.broadcast_to(t[:, None, :], (B, 16, 16))
    h = jnp.broadcast_to(l[:, :, None], (B, 16, 16))

    ts = t.sum(axis=1)
    ls = l.sum(axis=1)
    dc = jnp.where(at & al, (ts + ls + 16) >> 5,
                   jnp.where(at, (ts + 8) >> 4,
                             jnp.where(al, (ls + 8) >> 4, 128)))
    dcp = jnp.broadcast_to(dc[:, None, None], (B, 16, 16))

    tl = topleft.astype(jnp.int32)
    tt = jnp.concatenate([tl[:, None], t], axis=1)       # (B, 17)
    ll = jnp.concatenate([tl[:, None], l], axis=1)
    xw = np.arange(1, 9)
    Hsum = sum(int(x) * (tt[:, 8 + x] - tt[:, 8 - x]) for x in xw)
    Vsum = sum(int(y) * (ll[:, 8 + y] - ll[:, 8 - y]) for y in xw)
    b = (5 * Hsum + 32) >> 6
    c = (5 * Vsum + 32) >> 6
    a = 16 * (t[:, 15] + l[:, 15])
    yy, xx = np.mgrid[0:16, 0:16]
    plane = jnp.clip((a[:, None, None] + b[:, None, None] * (xx - 7) +
                      c[:, None, None] * (yy - 7) + 16) >> 5, 0, 255)

    m = mode[:, None, None]
    return jnp.where(m == 0, v,
                     jnp.where(m == 1, h,
                               jnp.where(m == 2, dcp, plane)))


def pred8x8_chroma_ref(mode, top, left, topleft, avail_top, avail_left):
    """Golden chroma pred. Modes: 0=DC 1=H 2=V 3=Plane. top/left: (B,8)."""
    B = len(mode)
    out = np.zeros((B, 8, 8), dtype=np.int32)
    for i in range(B):
        t = top[i].astype(np.int64)
        l = left[i].astype(np.int64)
        at, al = bool(avail_top[i]), bool(avail_left[i])
        m = int(mode[i])
        if m == 1:
            out[i] = np.broadcast_to(l[:, None], (8, 8))
        elif m == 2:
            out[i] = np.broadcast_to(t, (8, 8))
        elif m == 3:
            tl = int(topleft[i])
            tt = np.concatenate([[tl], t])
            ll = np.concatenate([[tl], l])
            Hs = sum(x * (tt[4 + x] - tt[4 - x]) for x in range(1, 5))
            Vs = sum(y * (ll[4 + y] - ll[4 - y]) for y in range(1, 5))
            b = (17 * Hs + 16) >> 5
            c = (17 * Vs + 16) >> 5
            a = 16 * (t[7] + l[7])
            yy, xx = np.mgrid[0:8, 0:8]
            out[i] = np.clip((a + b * (xx - 3) + c * (yy - 3) + 16) >> 5,
                             0, 255)
        else:
            # DC per 4x4 quadrant (spec 8.3.4.1)
            for qy in range(2):
                for qx in range(2):
                    tq = t[qx * 4:qx * 4 + 4]
                    lq = l[qy * 4:qy * 4 + 4]
                    if qx == 0 and qy == 0 or qx == 1 and qy == 1:
                        if at and al:
                            dc = (tq.sum() + lq.sum() + 4) >> 3
                        elif at:
                            dc = (tq.sum() + 2) >> 2
                        elif al:
                            dc = (lq.sum() + 2) >> 2
                        else:
                            dc = 128
                    elif qx == 1:   # top-right: prefers top
                        if at:
                            dc = (tq.sum() + 2) >> 2
                        elif al:
                            dc = (lq.sum() + 2) >> 2
                        else:
                            dc = 128
                    else:           # bottom-left: prefers left
                        if al:
                            dc = (lq.sum() + 2) >> 2
                        elif at:
                            dc = (tq.sum() + 2) >> 2
                        else:
                            dc = 128
                    out[i, qy * 4:qy * 4 + 4, qx * 4:qx * 4 + 4] = dc
    return out


def pred8x8_chroma(mode, top, left, topleft, avail_top, avail_left):
    import jax.numpy as jnp
    B = top.shape[0]
    t = top.astype(jnp.int32)
    l = left.astype(jnp.int32)
    at = avail_top.astype(bool)
    al = avail_left.astype(bool)

    hpred = jnp.broadcast_to(l[:, :, None], (B, 8, 8))
    vpred = jnp.broadcast_to(t[:, None, :], (B, 8, 8))

    # DC quadrants
    ts = [t[:, 0:4].sum(axis=1), t[:, 4:8].sum(axis=1)]
    ls = [l[:, 0:4].sum(axis=1), l[:, 4:8].sum(axis=1)]

    def dc_both(qx, qy):
        return jnp.where(at & al, (ts[qx] + ls[qy] + 4) >> 3,
                         jnp.where(at, (ts[qx] + 2) >> 2,
                                   jnp.where(al, (ls[qy] + 2) >> 2, 128)))

    def dc_top_pref(qx, qy):
        return jnp.where(at, (ts[qx] + 2) >> 2,
                         jnp.where(al, (ls[qy] + 2) >> 2, 128))

    def dc_left_pref(qx, qy):
        return jnp.where(al, (ls[qy] + 2) >> 2,
                         jnp.where(at, (ts[qx] + 2) >> 2, 128))

    q00 = dc_both(0, 0)
    q10 = dc_top_pref(1, 0)
    q01 = dc_left_pref(0, 1)
    q11 = dc_both(1, 1)
    dcp = jnp.zeros((B, 8, 8), jnp.int32)
    dcp = dcp.at[:, 0:4, 0:4].set(q00[:, None, None])
    dcp = dcp.at[:, 0:4, 4:8].set(q10[:, None, None])
    dcp = dcp.at[:, 4:8, 0:4].set(q01[:, None, None])
    dcp = dcp.at[:, 4:8, 4:8].set(q11[:, None, None])

    tl = topleft.astype(jnp.int32)
    tt = jnp.concatenate([tl[:, None], t], axis=1)
    ll = jnp.concatenate([tl[:, None], l], axis=1)
    Hs = sum(int(x) * (tt[:, 4 + x] - tt[:, 4 - x]) for x in range(1, 5))
    Vs = sum(int(y) * (ll[:, 4 + y] - ll[:, 4 - y]) for y in range(1, 5))
    b = (17 * Hs + 16) >> 5
    c = (17 * Vs + 16) >> 5
    a = 16 * (t[:, 7] + l[:, 7])
    yy, xx = np.mgrid[0:8, 0:8]
    plane = jnp.clip((a[:, None, None] + b[:, None, None] * (xx - 3) +
                      c[:, None, None] * (yy - 3) + 16) >> 5, 0, 255)

    m = mode[:, None, None]
    return jnp.where(m == 1, hpred,
                     jnp.where(m == 2, vpred,
                               jnp.where(m == 3, plane, dcp)))


# --------------------------------------------------------------------- #
# Intra 4x4 (spec 8.3.1.2, reference h264pred_template.c pred4x4_*):
# all nine modes expressed as one table-driven weighted gather so a
# batch of blocks with mixed modes is a single fused device op.
# Sample vector layout per block: [t0..t7 (top+topright), l0..l3, tl, dc]
# --------------------------------------------------------------------- #

def _p4_tables():
    """(9,16,3) gather indices, (9,16,3) weights, (9,16) rnd, (9,16) shift
    into the 14-entry sample vector. Built once at import."""
    TL = 12
    DC = 13
    # index -1 = p[.,-1]/p[-1,.] corner = the top-left sample
    T = lambda x: TL if x == -1 else x          # t0..t7 at 0..7
    L = lambda y: TL if y == -1 else 8 + y      # l0..l3 at 8..11
    idx = np.zeros((9, 16, 3), np.int32)
    w = np.zeros((9, 16, 3), np.int32)
    rnd = np.zeros((9, 16), np.int32)
    sh = np.zeros((9, 16), np.int32)

    def put(m, x, y, terms, r, s):
        k = 4 * y + x
        for j, (i_, w_) in enumerate(terms):
            idx[m, k, j] = i_
            w[m, k, j] = w_
        rnd[m, k] = r
        sh[m, k] = s

    for y in range(4):
        for x in range(4):
            put(0, x, y, [(T(x), 1)], 0, 0)                      # vertical
            put(1, x, y, [(L(y), 1)], 0, 0)                      # horizontal
            put(2, x, y, [(DC, 1)], 0, 0)                        # DC
            # 3: diagonal down-left
            if x == 3 and y == 3:
                put(3, x, y, [(T(6), 1), (T(7), 3)], 2, 2)
            else:
                put(3, x, y, [(T(x + y), 1), (T(x + y + 1), 2),
                              (T(x + y + 2), 1)], 2, 2)
            # 4: diagonal down-right
            if x > y:
                put(4, x, y, [(T(x - y - 2), 1), (T(x - y - 1), 2),
                              (T(x - y), 1)], 2, 2)
            elif x < y:
                put(4, x, y, [(L(y - x - 2), 1), (L(y - x - 1), 2),
                              (L(y - x), 1)], 2, 2)
            else:
                put(4, x, y, [(T(0), 1), (TL, 2), (L(0), 1)], 2, 2)
            # 5: vertical-right
            zvr = 2 * x - y
            if zvr >= 0 and zvr % 2 == 0:
                put(5, x, y, [(T(x - (y >> 1) - 1), 1),
                              (T(x - (y >> 1)), 1)], 1, 1)
            elif zvr >= 0:
                put(5, x, y, [(T(x - (y >> 1) - 2), 1),
                              (T(x - (y >> 1) - 1), 2),
                              (T(x - (y >> 1)), 1)], 2, 2)
            elif zvr == -1:
                put(5, x, y, [(L(0), 1), (TL, 2), (T(0), 1)], 2, 2)
            else:
                put(5, x, y, [(L(y - 1), 1), (L(y - 2), 2),
                              (L(y - 3), 1)], 2, 2)
            # 6: horizontal-down
            zhd = 2 * y - x
            if zhd >= 0 and zhd % 2 == 0:
                put(6, x, y, [(L(y - (x >> 1) - 1), 1),
                              (L(y - (x >> 1)), 1)], 1, 1)
            elif zhd >= 0:
                put(6, x, y, [(L(y - (x >> 1) - 2), 1),
                              (L(y - (x >> 1) - 1), 2),
                              (L(y - (x >> 1)), 1)], 2, 2)
            elif zhd == -1:
                put(6, x, y, [(L(0), 1), (TL, 2), (T(0), 1)], 2, 2)
            else:
                put(6, x, y, [(T(x - 1), 1), (T(x - 2), 2),
                              (T(x - 3), 1)], 2, 2)
            # 7: vertical-left
            if y % 2 == 0:
                put(7, x, y, [(T(x + (y >> 1)), 1),
                              (T(x + (y >> 1) + 1), 1)], 1, 1)
            else:
                put(7, x, y, [(T(x + (y >> 1)), 1),
                              (T(x + (y >> 1) + 1), 2),
                              (T(x + (y >> 1) + 2), 1)], 2, 2)
            # 8: horizontal-up
            zhu = x + 2 * y
            if zhu <= 4 and zhu % 2 == 0:
                put(8, x, y, [(L(y + (x >> 1)), 1),
                              (L(y + (x >> 1) + 1), 1)], 1, 1)
            elif zhu < 5:
                put(8, x, y, [(L(y + (x >> 1)), 1),
                              (L(y + (x >> 1) + 1), 2),
                              (L(y + (x >> 1) + 2), 1)], 2, 2)
            elif zhu == 5:
                put(8, x, y, [(L(2), 1), (L(3), 3)], 2, 2)
            else:
                put(8, x, y, [(L(3), 1)], 0, 0)
    return idx, w, rnd, sh


_P4_IDX, _P4_W, _P4_RND, _P4_SH = _p4_tables()

# zHD -2/-3 and zVR -2/-3 never index below l0/t0 with y>=3 / x>=3 guards
# above; the TL fallback entries carry weight 1 only where the real index
# exists, so assert the tables never alias wrongly:
assert (_P4_IDX >= 0).all() and (_P4_IDX <= 13).all()


def pred4x4_ref(mode, t8, l4, tl, avail_top, avail_left):
    """Golden scalar port. mode (B,), t8 (B,8) top+topright (topright
    already substituted when unavailable), l4 (B,4), tl (B,)."""
    B = len(mode)
    out = np.zeros((B, 4, 4), np.int64)
    for i in range(B):
        at, al = bool(avail_top[i]), bool(avail_left[i])
        if at and al:
            dc = (t8[i, :4].sum() + l4[i].sum() + 4) >> 3
        elif at:
            dc = (t8[i, :4].sum() + 2) >> 2
        elif al:
            dc = (l4[i].sum() + 2) >> 2
        else:
            dc = 128
        src = np.concatenate([t8[i], l4[i], [tl[i]], [dc]]).astype(np.int64)
        m = int(mode[i])
        v = (src[_P4_IDX[m]] * _P4_W[m]).sum(axis=1)
        out[i] = ((v + _P4_RND[m]) >> _P4_SH[m]).reshape(4, 4)
    return out


def pred4x4(mode, t8, l4, tl, avail_top, avail_left):
    """Batched device version; same contract as pred4x4_ref ->
    (B,4,4) int32."""
    import jax.numpy as jnp
    t8 = t8.astype(jnp.int32)
    l4 = l4.astype(jnp.int32)
    at = avail_top.astype(bool)
    al = avail_left.astype(bool)
    ts = t8[:, :4].sum(axis=1)
    ls = l4.sum(axis=1)
    dc = jnp.where(at & al, (ts + ls + 4) >> 3,
                   jnp.where(at, (ts + 2) >> 2,
                             jnp.where(al, (ls + 2) >> 2, 128)))
    src = jnp.concatenate([t8, l4, tl.astype(jnp.int32)[:, None],
                           dc[:, None]], axis=1)          # (B, 14)
    idx = jnp.asarray(_P4_IDX)[mode]              # (B, 16, 3)
    g = jnp.take_along_axis(src, idx.reshape(idx.shape[0], -1),
                            axis=1).reshape(-1, 16, 3)
    wsel = jnp.asarray(_P4_W)[mode]               # (B, 16, 3)
    v = (g * wsel).sum(axis=2)
    out = (v + jnp.asarray(_P4_RND)[mode]) >> jnp.asarray(_P4_SH)[mode]
    return out.reshape(-1, 4, 4)


# --------------------------------------------------------------------- #
# Intra 8x8 luma (High profile, spec 8.3.2; reference
# h264pred_template.c pred8x8l_*): nine modes over LOW-PASS FILTERED
# reference samples (8.3.2.2.1), expressed as the same table-driven
# 3-term weighted gather as pred4x4.
# Sample vector layout: [t0..t15 (filtered top+topright), l0..l7
# (filtered left), lt (filtered topleft), dc] = 26 entries.
# --------------------------------------------------------------------- #

def _p8_tables():
    LT = 24
    DC = 25

    def T(x):
        assert x >= -1
        return LT if x == -1 else x

    def L(y):
        assert y >= -1
        return LT if y == -1 else 16 + y

    idx = np.zeros((9, 64, 3), np.int32)
    w = np.zeros((9, 64, 3), np.int32)
    rnd = np.zeros((9, 64), np.int32)
    sh = np.zeros((9, 64), np.int32)

    def put(m, x, y, terms, r, s):
        k = 8 * y + x
        for j, (i_, w_) in enumerate(terms):
            idx[m, k, j] = i_
            w[m, k, j] = w_
        rnd[m, k] = r
        sh[m, k] = s

    for y in range(8):
        for x in range(8):
            put(0, x, y, [(T(x), 1)], 0, 0)                      # vertical
            put(1, x, y, [(L(y), 1)], 0, 0)                      # horizontal
            put(2, x, y, [(DC, 1)], 0, 0)                        # DC
            # 3: diagonal down-left
            if x == 7 and y == 7:
                put(3, x, y, [(T(14), 1), (T(15), 3)], 2, 2)
            else:
                put(3, x, y, [(T(x + y), 1), (T(x + y + 1), 2),
                              (T(x + y + 2), 1)], 2, 2)
            # 4: diagonal down-right
            if x > y:
                put(4, x, y, [(T(x - y - 2), 1), (T(x - y - 1), 2),
                              (T(x - y), 1)], 2, 2)
            elif x < y:
                put(4, x, y, [(L(y - x - 2), 1), (L(y - x - 1), 2),
                              (L(y - x), 1)], 2, 2)
            else:
                put(4, x, y, [(L(0), 1), (LT, 2), (T(0), 1)], 2, 2)
            # 5: vertical-right
            zvr = 2 * x - y
            if zvr >= 0 and zvr % 2 == 0:
                put(5, x, y, [(T(x - (y >> 1) - 1), 1),
                              (T(x - (y >> 1)), 1)], 1, 1)
            elif zvr >= 0:
                put(5, x, y, [(T(x - (y >> 1) - 2), 1),
                              (T(x - (y >> 1) - 1), 2),
                              (T(x - (y >> 1)), 1)], 2, 2)
            elif zvr == -1:
                put(5, x, y, [(L(0), 1), (LT, 2), (T(0), 1)], 2, 2)
            else:
                put(5, x, y, [(L(y - 2 * x - 1), 1),
                              (L(y - 2 * x - 2), 2),
                              (L(y - 2 * x - 3), 1)], 2, 2)
            # 6: horizontal-down
            zhd = 2 * y - x
            if zhd >= 0 and zhd % 2 == 0:
                put(6, x, y, [(L(y - (x >> 1) - 1), 1),
                              (L(y - (x >> 1)), 1)], 1, 1)
            elif zhd >= 0:
                put(6, x, y, [(L(y - (x >> 1) - 2), 1),
                              (L(y - (x >> 1) - 1), 2),
                              (L(y - (x >> 1)), 1)], 2, 2)
            elif zhd == -1:
                put(6, x, y, [(L(0), 1), (LT, 2), (T(0), 1)], 2, 2)
            else:
                put(6, x, y, [(T(x - 2 * y - 1), 1),
                              (T(x - 2 * y - 2), 2),
                              (T(x - 2 * y - 3), 1)], 2, 2)
            # 7: vertical-left
            if y % 2 == 0:
                put(7, x, y, [(T(x + (y >> 1)), 1),
                              (T(x + (y >> 1) + 1), 1)], 1, 1)
            else:
                put(7, x, y, [(T(x + (y >> 1)), 1),
                              (T(x + (y >> 1) + 1), 2),
                              (T(x + (y >> 1) + 2), 1)], 2, 2)
            # 8: horizontal-up
            zhu = x + 2 * y
            if zhu > 13:
                put(8, x, y, [(L(7), 1)], 0, 0)
            elif zhu == 13:
                put(8, x, y, [(L(6), 1), (L(7), 3)], 2, 2)
            elif zhu % 2 == 0:
                put(8, x, y, [(L(y + (x >> 1)), 1),
                              (L(y + (x >> 1) + 1), 1)], 1, 1)
            else:
                put(8, x, y, [(L(y + (x >> 1)), 1),
                              (L(y + (x >> 1) + 1), 2),
                              (L(y + (x >> 1) + 2), 1)], 2, 2)
    return idx, w, rnd, sh


_P8_IDX, _P8_W, _P8_RND, _P8_SH = _p8_tables()
assert (_P8_IDX >= 0).all() and (_P8_IDX <= 25).all()


def _filter8_np(top16, left8, tl, at, al, atl, atr):
    """Reference-sample filtering (spec 8.3.2.2.1) — numpy scalar for
    one block. top16: raw p[0..15,-1] (with x>=8 already = p[7,-1] copies
    when atr False is fine — they are substituted here anyway), left8:
    raw p[-1,0..7], tl: raw p[-1,-1]. Returns (t[16], l[8], lt, dc)."""
    top16 = top16.astype(np.int64)
    left8 = left8.astype(np.int64)
    tl = int(tl)
    t = np.zeros(16, np.int64)
    l = np.zeros(8, np.int64)
    if not atr:
        top16 = top16.copy()
        top16[8:] = top16[7]
    t[0] = ((tl if atl else top16[0]) + 2 * top16[0] + top16[1] + 2) >> 2
    for x in range(1, 15):
        t[x] = (top16[x - 1] + 2 * top16[x] + top16[x + 1] + 2) >> 2
    t[15] = (top16[14] + 3 * top16[15] + 2) >> 2
    l[0] = ((tl if atl else left8[0]) + 2 * left8[0] + left8[1] + 2) >> 2
    for y in range(1, 7):
        l[y] = (left8[y - 1] + 2 * left8[y] + left8[y + 1] + 2) >> 2
    l[7] = (left8[6] + 3 * left8[7] + 2) >> 2
    lt = (left8[0] + 2 * tl + top16[0] + 2) >> 2
    if at and al:
        dc = (t[:8].sum() + l.sum() + 8) >> 4
    elif at:
        dc = (t[:8].sum() + 4) >> 3
    elif al:
        dc = (l.sum() + 4) >> 3
    else:
        dc = 128
    return t, l, lt, dc


def pred8x8_luma_ref(mode, top16, left8, tl, at, al, atl, atr):
    """Golden scalar I_8x8 prediction: raw neighbor samples in, (B,8,8)
    predictions out."""
    B = len(mode)
    out = np.zeros((B, 8, 8), np.int64)
    for i in range(B):
        t, l, lt, dc = _filter8_np(top16[i], left8[i], int(tl[i]),
                                   bool(at[i]), bool(al[i]),
                                   bool(atl[i]), bool(atr[i]))
        src = np.concatenate([t, l, [lt], [dc]])
        m = int(mode[i])
        v = (src[_P8_IDX[m]] * _P8_W[m]).sum(axis=1)
        out[i] = ((v + _P8_RND[m]) >> _P8_SH[m]).reshape(8, 8)
    return out


def pred8x8_luma(mode, top16, left8, tl, at, al, atl, atr):
    """Batched device I_8x8 prediction; same contract as the golden ref.
    mode (B,), top16 (B,16) raw, left8 (B,8) raw, tl (B,), flags (B,)
    bool -> (B,8,8) int32."""
    import jax.numpy as jnp
    top16 = top16.astype(jnp.int32)
    left8 = left8.astype(jnp.int32)
    tli = tl.astype(jnp.int32)
    at = at.astype(bool)
    al = al.astype(bool)
    atl = atl.astype(bool)
    atr = atr.astype(bool)
    top16 = jnp.where(atr[:, None],
                      top16,
                      jnp.concatenate([top16[:, :8],
                                       jnp.repeat(top16[:, 7:8], 8, 1)],
                                      axis=1))
    tp = jnp.pad(top16, ((0, 0), (1, 1)), mode="edge")   # tp[x+1]=top[x]
    t = (tp[:, :-2] + 2 * tp[:, 1:-1] + tp[:, 2:] + 2) >> 2   # (B,16)
    t = t.at[:, 0].set(((jnp.where(atl, tli, top16[:, 0]))
                        + 2 * top16[:, 0] + top16[:, 1] + 2) >> 2)
    t = t.at[:, 15].set((top16[:, 14] + 3 * top16[:, 15] + 2) >> 2)
    lp = jnp.pad(left8, ((0, 0), (1, 1)), mode="edge")
    l = (lp[:, :-2] + 2 * lp[:, 1:-1] + lp[:, 2:] + 2) >> 2    # (B,8)
    l = l.at[:, 0].set(((jnp.where(atl, tli, left8[:, 0]))
                        + 2 * left8[:, 0] + left8[:, 1] + 2) >> 2)
    l = l.at[:, 7].set((left8[:, 6] + 3 * left8[:, 7] + 2) >> 2)
    lt = (left8[:, 0] + 2 * tli + top16[:, 0] + 2) >> 2
    ts = t[:, :8].sum(axis=1)
    ls = l.sum(axis=1)
    dc = jnp.where(at & al, (ts + ls + 8) >> 4,
                   jnp.where(at, (ts + 4) >> 3,
                             jnp.where(al, (ls + 4) >> 3, 128)))
    src = jnp.concatenate([t, l, lt[:, None], dc[:, None]], axis=1)
    idx = jnp.asarray(_P8_IDX)[mode]              # (B, 64, 3)
    g = jnp.take_along_axis(src, idx.reshape(idx.shape[0], -1),
                            axis=1).reshape(-1, 64, 3)
    wsel = jnp.asarray(_P8_W)[mode]
    v = (g * wsel).sum(axis=2)
    out = (v + jnp.asarray(_P8_RND)[mode]) >> jnp.asarray(_P8_SH)[mode]
    return out.reshape(-1, 8, 8)
