"""CAVLC residual coding: decode + encode (reference:
libavcodec/h264_cavlc.c decode_residual; spec ISO 14496-10 §9.2).

Tables are the normative spec tables 9-5..9-10 (same values as the
reference's coeff_token/total_zeros/run tables).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

from libav_tpu.avutil.error import AVError, INVALIDDATA
from libav_tpu.bitstream import GetBits, PutBits
from libav_tpu.bitstream.vlc import VLC

# coeff_token tables: [nC class][4*17]: entry (4*tc + t1s) -> (len, bits);
# class 0: 0<=nC<2, 1: 2<=nC<4, 2: 4<=nC<8, 3: nC>=8 (FLC)
COEFF_TOKEN_LEN = [
    [1, 0, 0, 0,
     6, 2, 0, 0, 8, 6, 3, 0, 9, 8, 7, 5, 10, 9, 8, 6,
     11, 10, 9, 7, 13, 11, 10, 8, 13, 13, 11, 9, 13, 13, 13, 10,
     14, 14, 13, 11, 14, 14, 14, 13, 15, 15, 14, 14, 15, 15, 15, 14,
     16, 15, 15, 15, 16, 16, 16, 15, 16, 16, 16, 16, 16, 16, 16, 16],
    [2, 0, 0, 0,
     6, 2, 0, 0, 6, 5, 3, 0, 7, 6, 6, 4, 8, 6, 6, 4,
     8, 7, 7, 5, 9, 8, 8, 6, 11, 9, 9, 6, 11, 11, 11, 7,
     12, 11, 11, 9, 12, 12, 12, 11, 12, 12, 12, 11, 13, 13, 13, 12,
     13, 13, 13, 13, 13, 14, 13, 13, 14, 14, 14, 13, 14, 14, 14, 14],
    [4, 0, 0, 0,
     6, 4, 0, 0, 6, 5, 4, 0, 6, 5, 5, 4, 7, 5, 5, 4,
     7, 5, 5, 4, 7, 6, 6, 4, 7, 6, 6, 4, 8, 7, 7, 5,
     8, 8, 7, 6, 9, 8, 8, 7, 9, 9, 8, 8, 9, 9, 9, 8,
     10, 9, 9, 9, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10],
    [6, 0, 0, 0,
     6, 6, 0, 0, 6, 6, 6, 0, 6, 6, 6, 6, 6, 6, 6, 6,
     6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6,
     6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6,
     6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6],
]
COEFF_TOKEN_BITS = [
    [1, 0, 0, 0,
     5, 1, 0, 0, 7, 4, 1, 0, 7, 6, 5, 3, 7, 6, 5, 3,
     7, 6, 5, 4, 15, 6, 5, 4, 11, 14, 5, 4, 8, 10, 13, 4,
     15, 14, 9, 4, 11, 10, 13, 12, 15, 14, 9, 12, 11, 10, 13, 8,
     15, 1, 9, 12, 11, 14, 13, 8, 7, 10, 9, 12, 4, 6, 5, 8],
    [3, 0, 0, 0,
     11, 2, 0, 0, 7, 7, 3, 0, 7, 10, 9, 5, 7, 6, 5, 4,
     4, 6, 5, 6, 7, 6, 5, 8, 15, 6, 5, 4, 11, 14, 13, 4,
     15, 10, 9, 4, 11, 14, 13, 12, 8, 10, 9, 8, 15, 14, 13, 12,
     11, 10, 9, 12, 7, 11, 6, 8, 9, 8, 10, 1, 7, 6, 5, 4],
    [15, 0, 0, 0,
     15, 14, 0, 0, 11, 15, 13, 0, 8, 12, 14, 12, 15, 10, 11, 11,
     11, 8, 9, 10, 9, 14, 13, 9, 8, 10, 9, 8, 15, 14, 13, 13,
     11, 14, 10, 12, 15, 10, 13, 12, 11, 14, 9, 12, 8, 10, 13, 8,
     13, 7, 9, 12, 9, 12, 11, 10, 5, 8, 7, 6, 1, 4, 3, 2],
    [3, 0, 0, 0,
     0, 1, 0, 0, 4, 5, 6, 0, 8, 9, 10, 11, 12, 13, 14, 15,
     16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31,
     32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47,
     48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63],
]
CHROMA_DC_COEFF_TOKEN_LEN = [2, 0, 0, 0, 6, 1, 0, 0, 6, 6, 3, 0,
                             6, 7, 7, 6, 6, 8, 8, 7]
CHROMA_DC_COEFF_TOKEN_BITS = [1, 0, 0, 0, 7, 1, 0, 0, 4, 6, 1, 0,
                              3, 3, 2, 5, 2, 3, 2, 0]

TOTAL_ZEROS_LEN = [
    [1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9],
    [3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6, 6, 6, 6],
    [4, 3, 3, 3, 4, 4, 3, 3, 4, 5, 5, 6, 5, 6],
    [5, 3, 4, 4, 3, 3, 3, 4, 3, 4, 5, 5, 5],
    [4, 4, 4, 3, 3, 3, 3, 3, 4, 5, 4, 5],
    [6, 5, 3, 3, 3, 3, 3, 3, 4, 3, 6],
    [6, 5, 3, 3, 3, 2, 3, 4, 3, 6],
    [6, 4, 5, 3, 2, 2, 3, 3, 6],
    [6, 6, 4, 2, 2, 3, 2, 5],
    [5, 5, 3, 2, 2, 2, 4],
    [4, 4, 3, 3, 1, 3],
    [4, 4, 2, 1, 3],
    [3, 3, 1, 2],
    [2, 2, 1],
    [1, 1],
]
TOTAL_ZEROS_BITS = [
    [1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1],
    [7, 6, 5, 4, 3, 5, 4, 3, 2, 3, 2, 3, 2, 1, 0],
    [5, 7, 6, 5, 4, 3, 4, 3, 2, 3, 2, 1, 1, 0],
    [3, 7, 5, 4, 6, 5, 4, 3, 3, 2, 2, 1, 0],
    [5, 4, 3, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 5, 4, 3, 3, 2, 1, 1, 0],
    [1, 1, 1, 3, 3, 2, 2, 1, 0],
    [1, 0, 1, 3, 2, 1, 1, 1],
    [1, 0, 1, 3, 2, 1, 1],
    [0, 1, 1, 2, 1, 3],
    [0, 1, 1, 1, 1],
    [0, 1, 1, 1],
    [0, 1, 1],
    [0, 1],
]
CHROMA_DC_TZ_LEN = [[1, 2, 3, 3], [1, 2, 2], [1, 1]]
CHROMA_DC_TZ_BITS = [[1, 1, 1, 0], [1, 1, 0], [1, 0]]

RUN_LEN = [
    [1, 1], [1, 2, 2], [2, 2, 2, 2], [2, 2, 2, 3, 3], [2, 2, 3, 3, 3, 3],
    [2, 3, 3, 3, 3, 3, 3],
    [3, 3, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9, 10, 11],
]
RUN_BITS = [
    [1, 0], [1, 1, 0], [3, 2, 1, 0], [3, 2, 1, 1, 0], [3, 2, 3, 2, 1, 0],
    [3, 0, 1, 3, 2, 5, 4],
    [7, 6, 5, 4, 3, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1],
]

# 4x4 zigzag scan (spec figure 8-8)
SCAN4x4 = np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15],
                   dtype=np.int32)


@functools.lru_cache(maxsize=None)
def _coeff_token_vlc(cls: int) -> VLC:
    codes, lens, vals = [], [], []
    tab_l = COEFF_TOKEN_LEN[cls]
    tab_b = COEFF_TOKEN_BITS[cls]
    for tc in range(17):
        for t1 in range(4):
            if t1 > tc or (tc == 0 and t1 > 0):
                continue
            i = 4 * tc + t1
            if tab_l[i] == 0:
                continue
            codes.append(tab_b[i])
            lens.append(tab_l[i])
            vals.append(i)
    return VLC(9, codes=codes, lengths=lens, values=vals)


@functools.lru_cache(maxsize=None)
def _chroma_dc_token_vlc() -> VLC:
    codes, lens, vals = [], [], []
    for tc in range(5):
        for t1 in range(4):
            if t1 > tc:
                continue
            i = 4 * tc + t1
            if CHROMA_DC_COEFF_TOKEN_LEN[i] == 0:
                continue
            codes.append(CHROMA_DC_COEFF_TOKEN_BITS[i])
            lens.append(CHROMA_DC_COEFF_TOKEN_LEN[i])
            vals.append(i)
    return VLC(8, codes=codes, lengths=lens, values=vals)


@functools.lru_cache(maxsize=None)
def _tz_vlc(total_coeff: int) -> VLC:
    lens = TOTAL_ZEROS_LEN[total_coeff - 1]
    bits = TOTAL_ZEROS_BITS[total_coeff - 1]
    return VLC(9, codes=list(bits), lengths=list(lens))


@functools.lru_cache(maxsize=None)
def _chroma_tz_vlc(total_coeff: int) -> VLC:
    return VLC(3, codes=list(CHROMA_DC_TZ_BITS[total_coeff - 1]),
               lengths=list(CHROMA_DC_TZ_LEN[total_coeff - 1]))


@functools.lru_cache(maxsize=None)
def _run_vlc(zeros_left: int) -> VLC:
    i = min(zeros_left, 7) - 1
    return VLC(11, codes=list(RUN_BITS[i]), lengths=list(RUN_LEN[i]))


def _nc_class(nc: int) -> int:
    if nc < 2:
        return 0
    if nc < 4:
        return 1
    if nc < 8:
        return 2
    return 3


# ---------------------------------------------------------------------- #
# Decode
# ---------------------------------------------------------------------- #

def decode_residual(gb: GetBits, nc: int, max_coeff: int) -> np.ndarray:
    """Decode one residual block; returns levels in scan order (length
    max_coeff) plus total_coeff via .total attr convention:
    returns (levels, total_coeff)."""
    levels = np.zeros(max_coeff, dtype=np.int32)
    if nc == -1:
        v = _chroma_dc_token_vlc().read(gb)
    else:
        v = _coeff_token_vlc(_nc_class(nc)).read(gb)
    total_coeff = v >> 2
    trailing_ones = v & 3
    if total_coeff == 0:
        return levels, 0
    if total_coeff > max_coeff:
        raise AVError(INVALIDDATA, "total_coeff > max_coeff")

    lv = np.zeros(total_coeff, dtype=np.int64)
    for i in range(trailing_ones):
        lv[i] = -1 if gb.get_bits(1) else 1

    suffix_length = 1 if total_coeff > 10 and trailing_ones < 3 else 0
    for i in range(trailing_ones, total_coeff):
        prefix = 0
        while gb.get_bits(1) == 0:
            prefix += 1
            if prefix > 32:
                raise AVError(INVALIDDATA, "level prefix too long")
        if prefix < 15:
            suffix_size = suffix_length
            if prefix == 14 and suffix_length == 0:
                suffix_size = 4
        else:
            suffix_size = prefix - 3
        level_code = min(15, prefix) << suffix_length
        if suffix_size > 0:
            level_code += gb.get_bits(suffix_size)
        if prefix >= 15 and suffix_length == 0:
            level_code += 15
        if prefix >= 16:
            level_code += (1 << (prefix - 3)) - 4096
        if i == trailing_ones and trailing_ones < 3:
            level_code += 2
        if level_code & 1:
            lv[i] = (-level_code - 1) >> 1
        else:
            lv[i] = (level_code + 2) >> 1
        if suffix_length == 0:
            suffix_length = 1
        if abs(lv[i]) > (3 << (suffix_length - 1)) and suffix_length < 6:
            suffix_length += 1

    if total_coeff < max_coeff:
        if nc == -1:
            total_zeros = _chroma_tz_vlc(total_coeff).read(gb)
        else:
            total_zeros = _tz_vlc(total_coeff).read(gb)
    else:
        total_zeros = 0

    zeros_left = total_zeros
    pos = total_coeff - 1 + total_zeros
    for i in range(total_coeff):
        if pos >= max_coeff:
            raise AVError(INVALIDDATA, "coefficient position overflow")
        levels[pos] = lv[i]
        if i < total_coeff - 1:
            if zeros_left > 0:
                run = _run_vlc(zeros_left).read(gb)
            else:
                run = 0
            zeros_left -= run
            pos -= 1 + run
    return levels, total_coeff


# ---------------------------------------------------------------------- #
# Encode
# ---------------------------------------------------------------------- #

def encode_residual(pb: PutBits, levels: np.ndarray, nc: int,
                    max_coeff: int) -> int:
    """Encode one residual block (scan-order levels). Returns total_coeff."""
    nz = [(i, int(levels[i])) for i in range(max_coeff) if levels[i]]
    total_coeff = len(nz)
    # trailing ones: up to 3 consecutive |1|s at the end of scan
    t1 = 0
    for i in range(total_coeff - 1, -1, -1):
        if abs(nz[i][1]) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    v = 4 * total_coeff + t1
    if nc == -1:
        if total_coeff > 4:
            raise AVError(INVALIDDATA, "chroma DC too many coeffs")
        pb.put_bits(CHROMA_DC_COEFF_TOKEN_LEN[v], CHROMA_DC_COEFF_TOKEN_BITS[v])
    else:
        cls = _nc_class(nc)
        pb.put_bits(COEFF_TOKEN_LEN[cls][v], COEFF_TOKEN_BITS[cls][v])
    if total_coeff == 0:
        return 0

    # levels high-to-low frequency
    ordered = [lv for _, lv in reversed(nz)]
    for i in range(t1):
        pb.put_bits(1, 1 if ordered[i] < 0 else 0)

    suffix_length = 1 if total_coeff > 10 and t1 < 3 else 0
    for i in range(t1, total_coeff):
        level = ordered[i]
        if level > 0:
            level_code = (level << 1) - 2
        else:
            level_code = (-level << 1) - 1
        if i == t1 and t1 < 3:
            level_code -= 2
        # write with current suffix_length
        if suffix_length == 0:
            if level_code < 14:
                pb.put_bits(level_code + 1, 1)     # prefix zeros + '1'
            elif level_code < 30:
                pb.put_bits(15, 1)                 # prefix 14
                pb.put_bits(4, level_code - 14)
            else:
                # decode adds min(15,prefix)<<0 (=15) plus the extra +15
                # for prefix>=15 && sl==0 => suffix = level_code - 30
                lc = level_code - 30
                if lc < 0 or lc >= 4096:
                    raise AVError(INVALIDDATA, "level too large for CAVLC")
                pb.put_bits(16, 1)                 # prefix 15
                pb.put_bits(12, lc)
        else:
            # for suffix_length > 0 prefixes 0..14 are regular codes
            # (the sl==0-only "prefix 14 with 4-bit suffix" special case
            # does not exist here); escape begins at prefix 15
            if (level_code >> suffix_length) < 15:
                pb.put_bits((level_code >> suffix_length) + 1, 1)
                pb.put_bits(suffix_length,
                            level_code & ((1 << suffix_length) - 1))
            else:
                lc = level_code - (15 << suffix_length)
                if lc < 0 or lc >= 4096:
                    raise AVError(INVALIDDATA, "level too large for CAVLC")
                pb.put_bits(16, 1)                 # prefix 15
                pb.put_bits(12, lc)
        if suffix_length == 0:
            suffix_length = 1
        if abs(level) > (3 << (suffix_length - 1)) and suffix_length < 6:
            suffix_length += 1

    # total zeros
    last_pos = nz[-1][0]
    total_zeros = last_pos + 1 - total_coeff
    if total_coeff < max_coeff:
        if nc == -1:
            pb.put_bits(CHROMA_DC_TZ_LEN[total_coeff - 1][total_zeros],
                        CHROMA_DC_TZ_BITS[total_coeff - 1][total_zeros])
        else:
            pb.put_bits(TOTAL_ZEROS_LEN[total_coeff - 1][total_zeros],
                        TOTAL_ZEROS_BITS[total_coeff - 1][total_zeros])

    # runs (high to low frequency)
    zeros_left = total_zeros
    positions = [i for i, _ in nz]
    for k in range(total_coeff - 1, 0, -1):
        if zeros_left <= 0:
            break
        run = positions[k] - positions[k - 1] - 1
        tab = min(zeros_left, 7) - 1
        pb.put_bits(RUN_LEN[tab][run], RUN_BITS[tab][run])
        zeros_left -= run
    return total_coeff


# field scan for PAFF field macroblocks (spec 8.5.6 Table 8-8;
# reference h264_slice.c:50 field_scan): raster positions in coding order
FIELD_SCAN4x4 = np.array([0, 4, 1, 8, 12, 5, 9, 13, 2, 6, 10, 14,
                          3, 7, 11, 15], dtype=np.int32)

# permutation between the two coding orders: ZZ_FROM_FIELD maps a
# field-scan coefficient sequence to zigzag sequence positions
# (new_zz[j] = field_seq[ZZ_FROM_FIELD[j]]) and FIELD_FROM_ZZ inverts it
_fpos = np.empty(16, np.int32)
_fpos[FIELD_SCAN4x4] = np.arange(16)
ZZ_FROM_FIELD = _fpos[SCAN4x4].copy()
_zpos = np.empty(16, np.int32)
_zpos[SCAN4x4] = np.arange(16)
FIELD_FROM_ZZ = _zpos[FIELD_SCAN4x4].copy()
del _fpos, _zpos
