"""Shared error concealment for the mpegvideo family (reference:
libavcodec/error_resilience.c — the codec-shared ERContext that marks
damaged slices and conceals missing macroblocks by interpolating motion
from decoded neighbors, er_add_slice/guess_mv).

Re-expressed for the command-tensor architecture: instead of fixing up
pixels after the fact, missing MBs are rewritten in the MB command
tensors (inter, zero residual, guessed forward MV) BEFORE the single
whole-frame device reconstruction — concealment costs nothing extra on
device.  H.264 has its own richer DPB-aware concealment
(codecs/h264/dec.py); this module serves MPEG-1/2/4.
"""

from __future__ import annotations

import numpy as np


def guess_mvs(ok: np.ndarray, mvs: np.ndarray, mb_w: int,
              mb_h: int) -> np.ndarray:
    """Median-of-decoded-neighbors MV fill (reference guess_mv, the
    MV_BLOCKED iterative pass): repeatedly assign each missing MB the
    component-median of its already-known 4-neighbors until the grid is
    full (isolated frames fall back to zero MVs)."""
    known = ok.reshape(mb_h, mb_w).copy()
    grid = mvs.reshape(mb_h, mb_w, 2).copy()
    grid[~known] = 0
    if not known.any():
        return grid.reshape(-1, 2)
    for _ in range(mb_w + mb_h):
        todo = np.nonzero(~known)
        if len(todo[0]) == 0:
            break
        new_known = known.copy()
        for y, x in zip(*todo):
            cands = []
            for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                yy, xx = y + dy, x + dx
                if 0 <= yy < mb_h and 0 <= xx < mb_w and known[yy, xx]:
                    cands.append(grid[yy, xx])
            if cands:
                c = np.asarray(cands)
                grid[y, x] = np.median(c, axis=0).astype(np.int32)
                new_known[y, x] = True
        known = new_known
    return grid.reshape(-1, 2)


def conceal_missing(mb, mb_w: int, mb_h: int, have_ref: bool) -> int:
    """Rewrite undecoded MBs (mb.ok == False) as zero-residual inter
    MBs predicting from the forward reference at guessed MVs; returns
    the number of MBs concealed.  Without a reference the MBs stay
    as initialized (flat mid-grey), matching the reference's behavior
    when no picture is available to conceal from."""
    missing = ~mb.ok
    n = int(missing.sum())
    if n == 0 or not have_ref:
        return 0 if n == 0 else -n
    src_mv = np.where(mb.intra[:, None], 0, mb.mv_fwd)
    guessed = guess_mvs(mb.ok, src_mv, mb_w, mb_h)
    mb.intra[missing] = False
    mb.coeffs[missing] = 0
    mb.use_fwd[missing] = True
    mb.use_bwd[missing] = False
    mb.mv_fwd[missing] = guessed[missing]
    mb.mv_bwd[missing] = 0
    # mpeg12 interlace extras, when present
    for name in ("field_mc", "dct_field", "dp", "coded", "use4",
                 "skipped"):
        arr = getattr(mb, name, None)
        if arr is not None and arr.dtype == bool:
            arr[missing] = False
    return n
