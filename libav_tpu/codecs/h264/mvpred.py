"""Motion vector prediction for 16x16 partitions + P_Skip rule
(reference: h264_mvpred.h pred_motion / pred_pskip_motion; spec
ISO 14496-10 §8.4.1.3). Shared verbatim by encoder and decoder so the
prediction loops can never diverge."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def pred_mv_16x16(mvs: np.ndarray, intra: np.ndarray, coded: np.ndarray,
                  mb_x: int, mb_y: int, mb_w: int,
                  refs: np.ndarray = None,
                  cur_ref: int = 0) -> Tuple[int, int]:
    """Median MV prediction. mvs (nmb,2) holds final MVs of already
    processed MBs; intra marks intra MBs (ref 'not available' for
    prediction purposes -> candidate (0,0) with different-ref semantics);
    coded marks MBs decoded so far (decode order). With multi-reference
    slices, refs holds each MB's refIdxL0 and the exactly-one-same-ref
    rule compares against cur_ref (spec 8.4.1.3.1).
    """

    def cand(x, y):
        """returns (mv, same_ref) or None if out of frame/not yet coded."""
        if x < 0 or y < 0 or x >= mb_w:
            return None
        i = y * mb_w + x
        if not coded[i]:
            return None
        if intra[i]:
            return ((0, 0), False)
        same = True if refs is None else int(refs[i]) == cur_ref
        return ((int(mvs[i][0]), int(mvs[i][1])), same)

    A = cand(mb_x - 1, mb_y)
    B = cand(mb_x, mb_y - 1)
    C = cand(mb_x + 1, mb_y - 1)
    if C is None:
        C = cand(mb_x - 1, mb_y - 1)   # D substitutes for C

    # spec: if B and C unavailable and A available -> predictor is A
    if B is None and C is None:
        if A is not None:
            return A[0]
        return (0, 0)

    # exactly-one-same-ref rule (all our inter refs are 0)
    usable = [x for x in (A, B, C)]
    same = [x for x in usable if x is not None and x[1]]
    if len(same) == 1:
        return same[0][0]

    vals = [(x[0] if x is not None else (0, 0)) for x in (A, B, C)]
    px = int(np.median([v[0] for v in vals]))
    py = int(np.median([v[1] for v in vals]))
    return (px, py)


def pred_pskip(mvs: np.ndarray, intra: np.ndarray, coded: np.ndarray,
               mb_x: int, mb_y: int, mb_w: int,
               refs: np.ndarray = None) -> Tuple[int, int]:
    """P_Skip motion (spec 8.4.1.1): zero if A or B unavailable or zero
    with ref 0, else the normal 16x16 prediction (cur_ref = 0)."""

    def get(x, y):
        if x < 0 or y < 0 or x >= mb_w:
            return None
        i = y * mb_w + x
        if not coded[i]:
            return None
        if intra[i]:
            return ((0, 0), False)
        same = True if refs is None else int(refs[i]) == 0
        return ((int(mvs[i][0]), int(mvs[i][1])), same)

    A = get(mb_x - 1, mb_y)
    B = get(mb_x, mb_y - 1)
    if A is None or B is None:
        return (0, 0)
    if A[1] and A[0] == (0, 0):
        return (0, 0)
    if B[1] and B[0] == (0, 0):
        return (0, 0)
    return pred_mv_16x16(mvs, intra, coded, mb_x, mb_y, mb_w, refs, 0)
