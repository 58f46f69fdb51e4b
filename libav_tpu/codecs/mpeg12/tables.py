"""ISO/IEC 11172-2 + 13818-2 spec constant tables (Annex B VLC tables,
default quantizer matrices). Same constants as reference
libavcodec/mpeg12data.c / mpeg12.c — they are normative spec values.
"""

from __future__ import annotations

import functools

import numpy as np

from libav_tpu.bitstream.vlc import VLC

# ISO 11172-2 default intra quantizer matrix (raster order)
DEFAULT_INTRA_MATRIX = np.array([
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83,
], dtype=np.int32)

DEFAULT_NON_INTRA_MATRIX = np.full(64, 16, dtype=np.int32)

# Table B.5a — dct_dc_size_luminance
DC_LUM = ([0x4, 0x0, 0x1, 0x5, 0x6, 0xE, 0x1E, 0x3E, 0x7E, 0xFE, 0x1FE, 0x1FF],
          [3, 2, 2, 3, 3, 4, 5, 6, 7, 8, 9, 9])
# Table B.5b — dct_dc_size_chrominance
DC_CHROMA = ([0x0, 0x1, 0x2, 0x6, 0xE, 0x1E, 0x3E, 0x7E, 0xFE, 0x1FE, 0x3FE, 0x3FF],
             [2, 2, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10])

# Table B.1 — macroblock_address_increment (index = increment-1; plus
# escape at 34 meaning +33, and stuffing at 35)
MB_ADDR_INC = (
    [0x1, 0x3, 0x2, 0x3, 0x2, 0x3, 0x2, 0x7, 0x6, 0xB, 0xA, 0x9, 0x8, 0x7,
     0x6, 0x17, 0x16, 0x15, 0x14, 0x13, 0x12, 0x23, 0x22, 0x21, 0x20, 0x1F,
     0x1E, 0x1D, 0x1C, 0x1B, 0x1A, 0x19, 0x18, 0x8, 0xF],
    [1, 3, 3, 4, 4, 5, 5, 7, 7, 8, 8, 8, 8, 8,
     8, 10, 10, 10, 10, 10, 10, 11, 11, 11, 11, 11,
     11, 11, 11, 11, 11, 11, 11, 11, 11])
MB_ADDR_ESCAPE = 33     # value index 33 => escape
MB_ADDR_STUFFING = 34

# macroblock_type flag bits (spec semantics order)
MB_QUANT = 0x10
MB_FOR = 0x08    # forward MV
MB_BACK = 0x04   # backward MV
MB_PAT = 0x02    # coded block pattern present
MB_INTRA = 0x01

# Table B.2b — P-picture macroblock_type: (code, bits) -> flags
MB_PTYPE = (
    [0x3, 0x1, 0x1, 0x1, 0x1, 0x1, 0x2],
    [5, 2, 3, 1, 6, 5, 5],
    [MB_INTRA, MB_PAT, MB_FOR, MB_FOR | MB_PAT, MB_QUANT | MB_INTRA,
     MB_QUANT | MB_PAT, MB_QUANT | MB_FOR | MB_PAT])

# Table B.2c — B-picture macroblock_type
MB_BTYPE = (
    [0x3, 0x2, 0x3, 0x2, 0x3, 0x2, 0x3, 0x1, 0x2, 0x3, 0x2],
    [5, 3, 3, 4, 4, 2, 2, 6, 6, 6, 5],
    [MB_INTRA, MB_BACK, MB_BACK | MB_PAT, MB_FOR, MB_FOR | MB_PAT,
     MB_FOR | MB_BACK, MB_FOR | MB_BACK | MB_PAT, MB_QUANT | MB_INTRA,
     MB_QUANT | MB_BACK | MB_PAT, MB_QUANT | MB_FOR | MB_PAT,
     MB_QUANT | MB_FOR | MB_BACK | MB_PAT])

# Table B.3 — coded_block_pattern: value order is cbp 60, 4, 8, ... —
# tabulated as (code, bits) indexed by the cbp value list below
MB_PAT_CODES = [
    (0x1, 9), (0xB, 5), (0x9, 5), (0xD, 6), (0xD, 4), (0x17, 7), (0x13, 7),
    (0x1F, 8), (0xC, 4), (0x16, 7), (0x12, 7), (0x1E, 8), (0x13, 5),
    (0x1B, 8), (0x17, 8), (0x13, 8), (0xB, 4), (0x15, 7), (0x11, 7),
    (0x1D, 8), (0x11, 5), (0x19, 8), (0x15, 8), (0x11, 8), (0xF, 6),
    (0xF, 8), (0xD, 8), (0x3, 9), (0xF, 5), (0xB, 8), (0x7, 8), (0x7, 9),
    (0xA, 4), (0x14, 7), (0x10, 7), (0x1C, 8), (0xE, 6), (0xE, 8),
    (0xC, 8), (0x2, 9), (0x10, 5), (0x18, 8), (0x14, 8), (0x10, 8),
    (0xE, 5), (0xA, 8), (0x6, 8), (0x6, 9), (0x12, 5), (0x1A, 8),
    (0x16, 8), (0x12, 8), (0xD, 5), (0x9, 8), (0x5, 8), (0x5, 9),
    (0xC, 5), (0x8, 8), (0x4, 8), (0x4, 9), (0x7, 3), (0xA, 5),
    (0x8, 5), (0xC, 6),
]
# The value decoded by index i of MB_PAT_CODES is cbp value i itself? No —
# spec table B.3 maps codes to cbp values 0..63 in this exact index order
# (index == cbp). Reference mpeg12data.c mbPatTable is indexed by cbp.

# Table B.4 — motion_code 0..16 (sign bit follows for nonzero)
MOTION_CODE = (
    [0x1, 0x1, 0x1, 0x1, 0x3, 0x5, 0x4, 0x3, 0xB, 0xA, 0x9, 0x11, 0x10,
     0xF, 0xE, 0xD, 0xC],
    [1, 2, 3, 4, 6, 7, 7, 7, 9, 9, 9, 10, 10, 10, 10, 10, 10])

# Tables B.14 (MPEG-1) / B.15 (MPEG-2 intra) — dct_coefficients.
# (code, bits) in the index order of RUN_LEVEL below; last two entries are
# escape and EOB. Same normative values as reference mpeg12data.c
# mpeg1_vlc/mpeg2_vlc.
DCT_VLC_MPEG1 = [
    (0x3, 2), (0x4, 4), (0x5, 5), (0x6, 7), (0x26, 8), (0x21, 8), (0xA, 10),
    (0x1D, 12), (0x18, 12), (0x13, 12), (0x10, 12), (0x1A, 13), (0x19, 13),
    (0x18, 13), (0x17, 13), (0x1F, 14), (0x1E, 14), (0x1D, 14), (0x1C, 14),
    (0x1B, 14), (0x1A, 14), (0x19, 14), (0x18, 14), (0x17, 14), (0x16, 14),
    (0x15, 14), (0x14, 14), (0x13, 14), (0x12, 14), (0x11, 14), (0x10, 14),
    (0x18, 15), (0x17, 15), (0x16, 15), (0x15, 15), (0x14, 15), (0x13, 15),
    (0x12, 15), (0x11, 15), (0x10, 15), (0x3, 3), (0x6, 6), (0x25, 8),
    (0xC, 10), (0x1B, 12), (0x16, 13), (0x15, 13), (0x1F, 15), (0x1E, 15),
    (0x1D, 15), (0x1C, 15), (0x1B, 15), (0x1A, 15), (0x19, 15), (0x13, 16),
    (0x12, 16), (0x11, 16), (0x10, 16), (0x5, 4), (0x4, 7), (0xB, 10),
    (0x14, 12), (0x14, 13), (0x7, 5), (0x24, 8), (0x1C, 12), (0x13, 13),
    (0x6, 5), (0xF, 10), (0x12, 12), (0x7, 6), (0x9, 10), (0x12, 13),
    (0x5, 6), (0x1E, 12), (0x14, 16), (0x4, 6), (0x15, 12), (0x7, 7),
    (0x11, 12), (0x5, 7), (0x11, 13), (0x27, 8), (0x10, 13), (0x23, 8),
    (0x1A, 16), (0x22, 8), (0x19, 16), (0x20, 8), (0x18, 16), (0xE, 10),
    (0x17, 16), (0xD, 10), (0x16, 16), (0x8, 10), (0x15, 16), (0x1F, 12),
    (0x1A, 12), (0x19, 12), (0x17, 12), (0x16, 12), (0x1F, 13), (0x1E, 13),
    (0x1D, 13), (0x1C, 13), (0x1B, 13), (0x1F, 16), (0x1E, 16), (0x1D, 16),
    (0x1C, 16), (0x1B, 16),
    (0x1, 6),   # escape
    (0x2, 2),   # EOB
]

DCT_VLC_MPEG2 = [
    (0x02, 2), (0x06, 3), (0x07, 4), (0x1C, 5), (0x1D, 5), (0x05, 6),
    (0x04, 6), (0x7B, 7), (0x7C, 7), (0x23, 8), (0x22, 8), (0xFA, 8),
    (0xFB, 8), (0xFE, 8), (0xFF, 8), (0x1F, 14), (0x1E, 14), (0x1D, 14),
    (0x1C, 14), (0x1B, 14), (0x1A, 14), (0x19, 14), (0x18, 14), (0x17, 14),
    (0x16, 14), (0x15, 14), (0x14, 14), (0x13, 14), (0x12, 14), (0x11, 14),
    (0x10, 14), (0x18, 15), (0x17, 15), (0x16, 15), (0x15, 15), (0x14, 15),
    (0x13, 15), (0x12, 15), (0x11, 15), (0x10, 15), (0x02, 3), (0x06, 5),
    (0x79, 7), (0x27, 8), (0x20, 8), (0x16, 13), (0x15, 13), (0x1F, 15),
    (0x1E, 15), (0x1D, 15), (0x1C, 15), (0x1B, 15), (0x1A, 15), (0x19, 15),
    (0x13, 16), (0x12, 16), (0x11, 16), (0x10, 16), (0x05, 5), (0x07, 7),
    (0xFC, 8), (0x0C, 10), (0x14, 13), (0x07, 5), (0x26, 8), (0x1C, 12),
    (0x13, 13), (0x06, 6), (0xFD, 8), (0x12, 12), (0x07, 6), (0x04, 9),
    (0x12, 13), (0x06, 7), (0x1E, 12), (0x14, 16), (0x04, 7), (0x15, 12),
    (0x05, 7), (0x11, 12), (0x78, 7), (0x11, 13), (0x7A, 7), (0x10, 13),
    (0x21, 8), (0x1A, 16), (0x25, 8), (0x19, 16), (0x24, 8), (0x18, 16),
    (0x05, 9), (0x17, 16), (0x07, 9), (0x16, 16), (0x0D, 10), (0x15, 16),
    (0x1F, 12), (0x1A, 12), (0x19, 12), (0x17, 12), (0x16, 12), (0x1F, 13),
    (0x1E, 13), (0x1D, 13), (0x1C, 13), (0x1B, 13), (0x1F, 16), (0x1E, 16),
    (0x1D, 16), (0x1C, 16), (0x1B, 16),
    (0x01, 6),  # escape
    (0x06, 4),  # EOB
]

# (run, level) for indices 0..110 of the VLC tables above (spec B.14 order)
RUN_LEVEL = (
    [0] * 40 + [1] * 18 + [2] * 5 + [3] * 4 + [4] * 3 + [5] * 3 + [6] * 3 +
    [7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15,
     16, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31],
    list(range(1, 41)) + list(range(1, 19)) + [1, 2, 3, 4, 5] +
    [1, 2, 3, 4] + [1, 2, 3] * 3 +
    [1, 2] * 10 + [1] * 15)

ESCAPE_INDEX = 111
EOB_INDEX = 112

# MPEG-2 non-linear quantizer_scale (q_scale_type == 1), ISO 13818-2
# table 7-6
NON_LINEAR_QSCALE = np.array([
    0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 18, 20, 22,
    24, 28, 32, 36, 40, 44, 48, 52, 56, 64, 72, 80, 88, 96, 104, 112,
], dtype=np.int32)

# MPEG-2 aspect_ratio_information / MPEG-1 pel aspect (tables 6-3, 11172-2)
FRAME_RATES = [  # frame_rate_code 1..8 (ISO 11172-2 table 2-D.1)
    (0, 1), (24000, 1001), (24, 1), (25, 1), (30000, 1001), (30, 1),
    (50, 1), (60000, 1001), (60, 1),
]


@functools.lru_cache(maxsize=None)
def dc_lum_vlc() -> VLC:
    return VLC(9, codes=DC_LUM[0], lengths=DC_LUM[1])


@functools.lru_cache(maxsize=None)
def dc_chroma_vlc() -> VLC:
    return VLC(10, codes=DC_CHROMA[0], lengths=DC_CHROMA[1])


@functools.lru_cache(maxsize=None)
def mb_addr_vlc() -> VLC:
    return VLC(11, codes=MB_ADDR_INC[0], lengths=MB_ADDR_INC[1])


@functools.lru_cache(maxsize=None)
def mb_ptype_vlc() -> VLC:
    return VLC(6, codes=MB_PTYPE[0], lengths=MB_PTYPE[1],
               values=MB_PTYPE[2])


@functools.lru_cache(maxsize=None)
def mb_btype_vlc() -> VLC:
    return VLC(6, codes=MB_BTYPE[0], lengths=MB_BTYPE[1],
               values=MB_BTYPE[2])


@functools.lru_cache(maxsize=None)
def cbp_vlc() -> VLC:
    codes = [c for c, b in MB_PAT_CODES]
    bits = [b for c, b in MB_PAT_CODES]
    return VLC(9, codes=codes, lengths=bits)


@functools.lru_cache(maxsize=None)
def motion_vlc() -> VLC:
    return VLC(10, codes=MOTION_CODE[0], lengths=MOTION_CODE[1])


@functools.lru_cache(maxsize=None)
def dct_vlc(mpeg2_intra: bool = False) -> VLC:
    tab = DCT_VLC_MPEG2 if mpeg2_intra else DCT_VLC_MPEG1
    codes = [c for c, b in tab]
    bits = [b for c, b in tab]
    return VLC(9, codes=codes, lengths=bits)
