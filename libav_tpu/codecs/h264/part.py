"""H.264 macroblock partition geometry and block-granular motion
prediction (reference: h264_mvpred.h pred_motion/pred_16x8_motion/
pred_8x16_motion/pred_pskip_motion, h264_direct.c
pred_spatial_direct_motion; spec ISO 14496-10 §8.4.1.3, Tables 7-13/
7-14/7-17/7-18).

All motion state lives on 4x4-block grids of shape (4*mb_h, 4*mb_w):
`bref[lst]` holds the per-block reference index with the sentinel values
-2 = unavailable (outside the picture, a different slice, or not yet
decoded) and -1 = no reference (intra, or the list is unused by the
covering partition); `bmv[lst]` the final quarter-pel MV. The encoder
and decoder share these functions verbatim so prediction can never
diverge between them."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

UNAVAIL = -2          # PART_NOT_AVAILABLE analogue
NOREF = -1            # LIST_NOT_USED analogue

# partition layouts in 4x4-block units within the MB: (x4, y4, w4, h4)
# P mb_type 0..2 (Table 7-13); index 3/4 (P_8x8/P_8x8ref0) via P_SUB
P_PARTS = {
    0: [(0, 0, 4, 4)],
    1: [(0, 0, 4, 2), (0, 2, 4, 2)],            # 16x8
    2: [(0, 0, 2, 4), (2, 0, 2, 4)],            # 8x16
}
# P sub_mb_type 0..3 (Table 7-17), offsets within the 8x8 (2x2 blocks)
P_SUB = {
    0: [(0, 0, 2, 2)],
    1: [(0, 0, 2, 1), (0, 1, 2, 1)],            # 8x4
    2: [(0, 0, 1, 2), (1, 0, 1, 2)],            # 4x8
    3: [(0, 0, 1, 1), (1, 0, 1, 1), (0, 1, 1, 1), (1, 1, 1, 1)],
}

# B mb_type 1..21 (Table 7-14): (parts, predflags) where predflag bits:
# 1 = list0, 2 = list1, 3 = bi. Type 0 = B_Direct_16x16, 22 = B_8x8.
_B16x8 = P_PARTS[1]
_B8x16 = P_PARTS[2]
B_MB = {
    1: (P_PARTS[0], (1,)), 2: (P_PARTS[0], (2,)), 3: (P_PARTS[0], (3,)),
    4: (_B16x8, (1, 1)), 5: (_B8x16, (1, 1)),
    6: (_B16x8, (2, 2)), 7: (_B8x16, (2, 2)),
    8: (_B16x8, (1, 2)), 9: (_B8x16, (1, 2)),
    10: (_B16x8, (2, 1)), 11: (_B8x16, (2, 1)),
    12: (_B16x8, (1, 3)), 13: (_B8x16, (1, 3)),
    14: (_B16x8, (2, 3)), 15: (_B8x16, (2, 3)),
    16: (_B16x8, (3, 1)), 17: (_B8x16, (3, 1)),
    18: (_B16x8, (3, 2)), 19: (_B8x16, (3, 2)),
    20: (_B16x8, (3, 3)), 21: (_B8x16, (3, 3)),
}
# B sub_mb_type 0..12 (Table 7-18): (sub-partition layout key, predflag)
# layout keys match P_SUB; type 0 = B_Direct_8x8
B_SUB = {
    1: (0, 1), 2: (0, 2), 3: (0, 3),
    4: (1, 1), 5: (2, 1), 6: (1, 2), 7: (2, 2),
    8: (1, 3), 9: (2, 3),
    10: (3, 1), 11: (3, 2), 12: (3, 3),
}

_ZERO = (0, 0)


class MotionGrids:
    """Per-frame block-granular motion state (always present, filled by
    every code path so partitioned and 16x16 MBs interoperate)."""

    def __init__(self, mb_w: int, mb_h: int, alloc: bool = True):
        self.mb_w = mb_w
        self.bw, self.bh = 4 * mb_w, 4 * mb_h
        self.any_part = False
        if not alloc:
            # backing arrays arrive later as views of the native arena
            self.bref = self.bmv = self.bmvd = self.bdirect = None
            self.slice_id = None
            return
        self.bref = np.full((2, self.bh, self.bw), UNAVAIL, dtype=np.int8)
        self.bmv = np.zeros((2, self.bh, self.bw, 2), dtype=np.int32)
        # |mvd| clipped per block, for CABAC ctxIdxInc (9.3.3.1.1.7)
        self.bmvd = np.zeros((2, self.bh, self.bw, 2), dtype=np.int16)
        self.bdirect = np.zeros((self.bh, self.bw), dtype=bool)
        # slice id of the covering MB; -1 = not yet decoded
        self.slice_id = np.full(mb_w * (self.bh // 4), -1, dtype=np.int32)
        self.any_part = False

    def reset(self):
        self.bref[:] = UNAVAIL
        self.bmv[:] = 0
        self.bmvd[:] = 0
        self.bdirect[:] = False
        self.slice_id[:] = -1
        self.any_part = False

    # -- state writes --------------------------------------------------- #

    def set_intra(self, mb_x: int, mb_y: int):
        y0, x0 = 4 * mb_y, 4 * mb_x
        self.bref[:, y0:y0 + 4, x0:x0 + 4] = NOREF
        self.bmv[:, y0:y0 + 4, x0:x0 + 4] = 0
        self.bmvd[:, y0:y0 + 4, x0:x0 + 4] = 0

    def set_part(self, lst: int, bx: int, by: int, w4: int, h4: int,
                 ref: int, mv: Tuple[int, int],
                 mvd: Tuple[int, int] = _ZERO, direct: bool = False):
        self.bref[lst, by:by + h4, bx:bx + w4] = ref
        self.bmv[lst, by:by + h4, bx:bx + w4] = mv
        self.bmvd[lst, by:by + h4, bx:bx + w4] = (min(abs(mvd[0]), 127),
                                                  min(abs(mvd[1]), 127))
        if direct:
            self.bdirect[by:by + h4, bx:bx + w4] = True

    def set_unused(self, lst: int, bx: int, by: int, w4: int, h4: int):
        self.bref[lst, by:by + h4, bx:bx + w4] = NOREF
        self.bmv[lst, by:by + h4, bx:bx + w4] = 0
        self.bmvd[lst, by:by + h4, bx:bx + w4] = 0

    # -- neighbor fetch ------------------------------------------------- #

    def fetch(self, lst: int, bx: int, by: int, cur_slice: int):
        """-> (mv, ref); ref = UNAVAIL for out-of-picture / other-slice /
        not-yet-decoded blocks (8.4.1.3.2 via 6.4.11.7 availability)."""
        if bx < 0 or by < 0 or bx >= self.bw or by >= self.bh:
            return _ZERO, UNAVAIL
        mb = (by >> 2) * self.mb_w + (bx >> 2)
        if self.slice_id[mb] != cur_slice:
            return _ZERO, UNAVAIL
        r = int(self.bref[lst, by, bx])
        if r == UNAVAIL:
            return _ZERO, UNAVAIL
        return (int(self.bmv[lst, by, bx, 0]),
                int(self.bmv[lst, by, bx, 1])), r

    def neighbors(self, lst: int, bx: int, by: int, w4: int,
                  cur_slice: int):
        """A, B, C candidates with the D substitution applied to C."""
        A = self.fetch(lst, bx - 1, by, cur_slice)
        B = self.fetch(lst, bx, by - 1, cur_slice)
        C = self.fetch(lst, bx + w4, by - 1, cur_slice)
        if C[1] == UNAVAIL:
            C = self.fetch(lst, bx - 1, by - 1, cur_slice)
        return A, B, C

    def amvd(self, lst: int, bx: int, by: int, comp: int,
             cur_slice: int) -> int:
        """Sum of neighbor-block |mvd| for the CABAC mvd context
        (9.3.3.1.1.7): left + top block of the partition."""
        tot = 0
        for nx, ny in ((bx - 1, by), (bx, by - 1)):
            if nx < 0 or ny < 0 or nx >= self.bw:
                continue
            mb = (ny >> 2) * self.mb_w + (nx >> 2)
            if self.slice_id[mb] != cur_slice:
                continue
            if self.bref[lst, ny, nx] == UNAVAIL:
                continue
            tot += int(self.bmvd[lst, ny, nx, comp])
        return tot


def _median3(a, b, c):
    return max(min(a, b), min(c, max(a, b)))


def pred_motion(g: MotionGrids, lst: int, ref: int, bx: int, by: int,
                w4: int, h4: int, cur_slice: int,
                special: int = 0) -> Tuple[int, int]:
    """Luma MV prediction, spec 8.4.1.3 (= h264_mvpred.h pred_motion).
    special: 1 = 16x8 top, 2 = 16x8 bottom, 3 = 8x16 left,
    4 = 8x16 right (the directional shortcuts of 8.4.1.3 step 2)."""
    A, B, C = g.neighbors(lst, bx, by, w4, cur_slice)
    if special == 1 and B[1] == ref:
        return B[0]
    if special in (2, 3) and A[1] == ref:
        return A[0]
    if special == 4 and C[1] == ref:
        return C[0]

    match = [n for n in (A, B, C) if n[1] == ref]
    if len(match) == 1:
        return match[0][0]
    if len(match) == 0 and B[1] == UNAVAIL and C[1] == UNAVAIL and \
            A[1] != UNAVAIL:
        return A[0]
    return (_median3(A[0][0], B[0][0], C[0][0]),
            _median3(A[0][1], B[0][1], C[0][1]))


def pred_pskip(g: MotionGrids, mb_x: int, mb_y: int,
               cur_slice: int) -> Tuple[int, int]:
    """P_Skip motion, spec 8.4.1.1 (= pred_pskip_motion): zero when A or
    B is unavailable or is a zero-MV ref-0 block, else the 16x16
    prediction with ref 0."""
    bx, by = 4 * mb_x, 4 * mb_y
    A = g.fetch(0, bx - 1, by, cur_slice)
    B = g.fetch(0, bx, by - 1, cur_slice)
    if A[1] == UNAVAIL or B[1] == UNAVAIL:
        return _ZERO
    if (A[1] == 0 and A[0] == _ZERO) or (B[1] == 0 and B[0] == _ZERO):
        return _ZERO
    return pred_motion(g, 0, 0, bx, by, 4, 4, cur_slice)


def _min_positive(a: int, b: int) -> int:
    """MinPositive (8.4.1.2.2): min of non-negative args, else the max."""
    if a >= 0 and b >= 0:
        return min(a, b)
    return max(a, b)


def pred_spatial_direct(g: MotionGrids, mb_x: int, mb_y: int,
                        cur_slice: int, col):
    """Spatial direct luma motion, spec 8.4.1.2.2 (= h264_direct.c
    pred_spatial_direct_motion). Returns (ref0, ref1, mv0, mv1,
    col_zero (4,4) bool) — col_zero marks 4x4 blocks whose MV must be
    forced to 0 for each list with ref 0. `col` is the colocated
    picture's saved l0 motion: (bref (bh,bw) int8, bmv (bh,bw,2)) or
    None when unavailable."""
    bx, by = 4 * mb_x, 4 * mb_y
    refs = [0, 0]
    for lst in (0, 1):
        A, B, C = g.neighbors(lst, bx, by, 4, cur_slice)
        ra = A[1] if A[1] >= 0 else -1
        rb = B[1] if B[1] >= 0 else -1
        rc = C[1] if C[1] >= 0 else -1
        refs[lst] = _min_positive(_min_positive(ra, rb), rc)
    ref0, ref1 = refs
    direct_zero = ref0 < 0 and ref1 < 0
    if direct_zero:
        ref0 = ref1 = 0
        mv0 = mv1 = _ZERO
    else:
        mv0 = pred_motion(g, 0, ref0, bx, by, 4, 4, cur_slice) \
            if ref0 >= 0 else _ZERO
        mv1 = pred_motion(g, 1, ref1, bx, by, 4, 4, cur_slice) \
            if ref1 >= 0 else _ZERO

    col_zero = np.zeros((4, 4), dtype=bool)
    if not direct_zero and col is not None:
        cref, cmv = col[0], col[1]
        cr = cref[by:by + 4, bx:bx + 4]
        cm = cmv[by:by + 4, bx:bx + 4]
        col_zero = (cr == 0) & (np.abs(cm[..., 0]) <= 1) & \
            (np.abs(cm[..., 1]) <= 1)
    return ref0, ref1, mv0, mv1, col_zero


# --------------------------------------------------------------------- #
# Shared inter-MB coding walk (encoder and decoder drive the identical
# function through a reader/writer `rd`, so partition order, prediction
# state, and CABAC context evolution can never diverge).
#
# rd interface:
#   sub_mb_type_p() / sub_mb_type_b()       -> int (parse or emit)
#   ref_idx(lst, bx, by, nref)              -> int
#   motion(lst, bx, by, pred)               -> (mv, mvd)
# --------------------------------------------------------------------- #

def temporal_direct_mb_motion(fd, mb_x: int, mb_y: int, cur_slice: int,
                              quads=None):
    """Temporal direct prediction (spec 8.4.1.2.3; reference
    h264_direct.c pred_temp_direct_motion): per 8x8 quadrant (the
    direct_8x8_inference corner sampling), scale the colocated list-0
    motion by the POC distance ratio. fd.tdirect = (cur_poc, l0pocs,
    colref, colmv, colpoc) where colpoc holds the POC of the picture
    each colocated block referenced (sentinel None entries handled as
    intra)."""
    g = fd.grids
    cur_poc, l0pocs, cref, cmv, cpoc = fd.tdirect
    poc_of_idx = {}
    for k, p in enumerate(l0pocs):
        poc_of_idx.setdefault(p, k)
    bx0, by0 = 4 * mb_x, 4 * mb_y
    # direct_8x8_inference: corner block per quadrant (spec 8.4.1.2.2);
    # when 0 every 4x4 samples its own colocated block
    inference = bool(getattr(fd, "t8_params", (0, 1))[1])
    corner = {0: (0, 0), 1: (3, 0), 2: (0, 3), 3: (3, 3)}

    def derive(ccx, ccy):
        r = int(cref[by0 + ccy, bx0 + ccx]) if cref is not None else -1
        if r < 0:                       # colocated intra/unavailable
            return 0, (0, 0), (0, 0)
        mvc = (int(cmv[by0 + ccy, bx0 + ccx, 0]),
               int(cmv[by0 + ccy, bx0 + ccx, 1]))
        colpoc = int(cpoc[by0 + ccy, bx0 + ccx])
        ref0 = poc_of_idx.get(colpoc, 0)
        poc0 = l0pocs[ref0] if ref0 < len(l0pocs) else colpoc
        poc1 = fd.col_poc              # the colocated picture itself
        td = min(127, max(-128, poc1 - poc0))
        if td == 0:
            return ref0, mvc, (0, 0)
        tb = min(127, max(-128, cur_poc - poc0))
        num = 16384 + (abs(td) >> 1)
        tx = num // td if td > 0 else -(num // -td)
        dsf = min(1023, max(-1024, (tb * tx + 32) >> 6))
        mv0 = (((dsf * mvc[0] + 128) >> 8),
               ((dsf * mvc[1] + 128) >> 8))
        return ref0, mv0, (mv0[0] - mvc[0], mv0[1] - mvc[1])

    for q in (range(4) if quads is None else quads):
        qx, qy = 2 * (q & 1), 2 * (q >> 1)
        qd = derive(*corner[q]) if inference else None
        for dy in range(2):
            for dx in range(2):
                lx, ly = qx + dx, qy + dy
                ref0, mv0, mv1 = qd if qd is not None else derive(lx, ly)
                g.set_part(0, bx0 + lx, by0 + ly, 1, 1, ref0, mv0,
                           (0, 0), direct=True)
                g.set_part(1, bx0 + lx, by0 + ly, 1, 1, 0, mv1,
                           (0, 0), direct=True)
        g.bdirect[by0 + qy:by0 + qy + 2, bx0 + qx:bx0 + qx + 2] = True
    g.any_part = True


def direct_mb_motion(fd, mb_x: int, mb_y: int, cur_slice: int, col,
                     quads=None):
    """Apply direct prediction to the whole MB or the listed quadrants:
    spatial (8.4.1.2.2) by default, temporal (8.4.1.2.3) when the slice
    header cleared direct_spatial_mv_pred_flag (fd.tdirect set)."""
    if getattr(fd, "tdirect", None) is not None:
        return temporal_direct_mb_motion(fd, mb_x, mb_y, cur_slice,
                                         quads)
    g = fd.grids
    ref0, ref1, mv0, mv1, col_zero = pred_spatial_direct(
        g, mb_x, mb_y, cur_slice, col)
    bx0, by0 = 4 * mb_x, 4 * mb_y
    for q in (range(4) if quads is None else quads):
        qx, qy = 2 * (q & 1), 2 * (q >> 1)
        for dy in range(2):
            for dx in range(2):
                lx, ly = qx + dx, qy + dy
                cz = bool(col_zero[ly, lx])
                for lst, ref, mv in ((0, ref0, mv0), (1, ref1, mv1)):
                    if ref < 0:
                        g.set_unused(lst, bx0 + lx, by0 + ly, 1, 1)
                    else:
                        m = (0, 0) if (cz and ref == 0) else mv
                        g.set_part(lst, bx0 + lx, by0 + ly, 1, 1,
                                   ref, m, (0, 0), direct=True)
        g.bdirect[by0 + qy:by0 + qy + 2, bx0 + qx:bx0 + qx + 2] = True
    g.any_part = True


def pskip_mb_motion(fd, i: int, mb_x: int, mb_y: int, cur_slice: int):
    """Commit P_Skip motion to the grids + dense arrays (8.4.1.1)."""
    g = fd.grids
    mv = pred_pskip(g, mb_x, mb_y, cur_slice)
    g.set_part(0, 4 * mb_x, 4 * mb_y, 4, 4, 0, mv)
    g.set_unused(1, 4 * mb_x, 4 * mb_y, 4, 4)
    fd.mv[i] = mv
    fd.ref_idx[i] = 0
    return mv


def code_inter_mb(rd, fd, i: int, mb_x: int, mb_y: int, bslice: bool,
                  mb_type: int, nref0: int, nref1: int, cur_slice: int,
                  col, subs=None):
    """Code (parse or emit) one inter MB's prediction units and fill the
    motion grids, with the reference's exact decode-order visibility:
    refs become visible minus each partition's top-left cell during the
    ref pass (h264_cabac.c:2140-2143), the top-left cell at that
    partition's turn in the MV pass (:2151), and for B_8x8 with direct
    quadrants the two C-fetch-sensitive cells are masked after the
    direct fill (:2109-2112). P mb_type 0..4 (Table 7-13), B 0..22
    (Table 7-14). `subs` (encode side) pre-supplies sub_mb_types."""
    from libav_tpu.avutil.error import AVError, INVALIDDATA
    g = fd.grids
    bx0, by0 = 4 * mb_x, 4 * mb_y
    nref = (nref0, nref1)
    pending = {}                     # (lst, quad) -> saved masked cell
    if bslice and mb_type == 0:      # B_Direct_16x16
        direct_mb_motion(fd, mb_x, mb_y, cur_slice, col)
        return
    if bslice and mb_type == 22:     # B_8x8
        subs = [rd.sub_mb_type_b() for _ in range(4)]
        big = []
        for q in range(4):
            pf = 0 if subs[q] == 0 else B_SUB[subs[q]][1]
            big.append((2 * (q & 1), 2 * (q >> 1), 2, 2, pf, q))
        direct_quads = [q for q in range(4) if subs[q] == 0]
        if direct_quads:
            direct_mb_motion(fd, mb_x, mb_y, cur_slice, col,
                             quads=direct_quads)
            for (cx, cy), q in (((bx0 + 2, by0), 1),
                                ((bx0 + 2, by0 + 2), 3)):
                for lst in (0, 1):
                    pending[(lst, q)] = (
                        int(g.bref[lst, cy, cx]),
                        (int(g.bmv[lst, cy, cx, 0]),
                         int(g.bmv[lst, cy, cx, 1])))
                    g.bref[lst, cy, cx] = UNAVAIL
                    g.bmv[lst, cy, cx] = 0
    elif bslice:
        parts, pfs = B_MB[mb_type]
        big = [(x, y, w, h, pf, None)
               for (x, y, w, h), pf in zip(parts, pfs)]
    elif mb_type <= 2:
        big = [(x, y, w, h, 1, None) for x, y, w, h in P_PARTS[mb_type]]
    else:                            # P_8x8 / P_8x8ref0
        subs = [rd.sub_mb_type_p() for _ in range(4)]
        big = [(2 * (q & 1), 2 * (q >> 1), 2, 2, 1, q) for q in range(4)]
    if len(big) > 1 or subs is not None:
        g.any_part = True

    # ref pass: all list0, then all list1; each value becomes visible
    # over its region minus the top-left cell
    refs = [[0] * len(big) for _ in range(2)]
    for lst in (0, 1):
        for k, (x, y, w, h, pf, q) in enumerate(big):
            if pf == 0:
                continue
            if not (pf >> lst) & 1:
                refs[lst][k] = NOREF
            elif nref[lst] > 1 and (bslice or mb_type != 4):
                r = rd.ref_idx(lst, bx0 + x, by0 + y, nref[lst])
                if r >= nref[lst]:
                    raise AVError(INVALIDDATA, "ref_idx out of range")
                refs[lst][k] = r
            else:
                refs[lst][k] = 0
            val = refs[lst][k]
            g.bref[lst, by0 + y:by0 + y + h, bx0 + x:bx0 + x + w] = val
            g.bref[lst, by0 + y, bx0 + x] = UNAVAIL
            g.bmv[lst, by0 + y:by0 + y + h, bx0 + x:bx0 + x + w] = 0

    # MV pass: all list0, then all list1, partitions in order
    for lst in (0, 1):
        for k, (x, y, w, h, pf, q) in enumerate(big):
            if pf == 0:
                sv = pending.pop((lst, q), None)
                if sv is not None:       # unmask the direct quad's cell
                    g.bref[lst, by0 + y, bx0 + x] = sv[0]
                    g.bmv[lst, by0 + y, bx0 + x] = sv[1]
                continue
            ref = refs[lst][k]
            if not (pf >> lst) & 1:
                g.set_unused(lst, bx0 + x, by0 + y, w, h)
                continue
            g.bref[lst, by0 + y, bx0 + x] = ref       # top-left visible
            if q is None:
                if (w, h) == (4, 2):
                    special = 1 + k
                elif (w, h) == (2, 4):
                    special = 3 + k
                else:
                    special = 0
                pred = pred_motion(g, lst, ref, bx0 + x, by0 + y, w, h,
                                   cur_slice, special)
                mv, mvd = rd.motion(lst, bx0 + x, by0 + y, pred)
                g.set_part(lst, bx0 + x, by0 + y, w, h, ref, mv, mvd)
                if (w, h) == (4, 4):
                    # keep the dense per-MB arrays valid for the 16x16
                    # device fast path
                    if lst == 0:
                        fd.mv[i] = mv
                        fd.ref_idx[i] = ref
                    else:
                        fd.mv1[i] = mv
            else:
                layout = subs[q] if not bslice else B_SUB[subs[q]][0]
                for sx, sy, sw, sh in P_SUB[layout]:
                    pred = pred_motion(g, lst, ref, bx0 + x + sx,
                                       by0 + y + sy, sw, sh, cur_slice, 0)
                    mv, mvd = rd.motion(lst, bx0 + x + sx, by0 + y + sy,
                                        pred)
                    g.set_part(lst, bx0 + x + sx, by0 + y + sy, sw, sh,
                               ref, mv, mvd)
    if bslice:
        if mb_type in (1, 2, 3):
            fd.sel[i] = mb_type - 1
        if mb_type > 3 or max(refs[0]) > 0 or max(refs[1]) > 0:
            g.any_part = True
    return subs


def t8_inter_allowed(bslice: bool, mb_type: int, subs,
                     direct_8x8_inference: bool) -> bool:
    """noSubMbPartSizeLessThan8x8Flag && the B_Direct inference condition
    (spec 7.3.5 transform_size_8x8_flag presence for inter MBs)."""
    if bslice:
        if mb_type == 0:
            return bool(direct_8x8_inference)
        if mb_type == 22:
            return all((s == 0 and direct_8x8_inference) or
                       (s != 0 and B_SUB[s][0] == 0) for s in subs)
        return True
    if mb_type <= 2:
        return True
    return all(s == 0 for s in subs)
