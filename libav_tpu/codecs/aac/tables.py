"""AAC table helpers on top of the generated normative tables."""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

from libav_tpu.bitstream.vlc import VLC
from libav_tpu.codecs.aac import tables_gen as G

SAMPLE_RATES = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
                16000, 12000, 11025, 8000, 7350]

_SWB_1024 = {
    96000: G.SWB_OFFSET_1024_96, 88200: G.SWB_OFFSET_1024_96,
    64000: G.SWB_OFFSET_1024_64, 48000: G.SWB_OFFSET_1024_48,
    44100: G.SWB_OFFSET_1024_48, 32000: G.SWB_OFFSET_1024_32,
    24000: G.SWB_OFFSET_1024_24, 22050: G.SWB_OFFSET_1024_24,
    16000: G.SWB_OFFSET_1024_16, 12000: G.SWB_OFFSET_1024_16,
    11025: G.SWB_OFFSET_1024_16, 8000: G.SWB_OFFSET_1024_8,
}


def swb_offsets_long(sample_rate: int) -> np.ndarray:
    return np.asarray(_SWB_1024[sample_rate], dtype=np.int32)


_SWB_128 = {
    96000: G.SWB_OFFSET_128_96, 88200: G.SWB_OFFSET_128_96,
    64000: G.SWB_OFFSET_128_96, 48000: G.SWB_OFFSET_128_48,
    44100: G.SWB_OFFSET_128_48, 32000: G.SWB_OFFSET_128_48,
    24000: G.SWB_OFFSET_128_24, 22050: G.SWB_OFFSET_128_24,
    16000: G.SWB_OFFSET_128_16, 12000: G.SWB_OFFSET_128_16,
    11025: G.SWB_OFFSET_128_16, 8000: G.SWB_OFFSET_128_8,
}


def swb_offsets_short(sample_rate: int) -> np.ndarray:
    """Short-window (128) scalefactor band offsets (reference:
    aactab.c ff_swb_offset_128 :1252)."""
    return np.asarray(_SWB_128[sample_rate], dtype=np.int32)


# codebook properties: (dimension, is_signed, max_abs)
CB_INFO = {
    1: (4, True, 1), 2: (4, True, 1), 3: (4, False, 2), 4: (4, False, 2),
    5: (2, True, 4), 6: (2, True, 4), 7: (2, False, 7), 8: (2, False, 7),
    9: (2, False, 12), 10: (2, False, 12), 11: (2, False, 16),
}
ZERO_HCB = 0
ESC_HCB = 11
NOISE_HCB = 13
INTENSITY_HCB2 = 14
INTENSITY_HCB = 15


@functools.lru_cache(maxsize=None)
def scalefactor_vlc() -> VLC:
    return VLC(10, codes=list(G.SCALEFACTOR_CODE),
               lengths=list(G.SCALEFACTOR_BITS))


@functools.lru_cache(maxsize=None)
def spectral_vlc(cb: int) -> VLC:
    return VLC(10, codes=list(G.SPECTRAL_CODES[cb - 1]),
               lengths=list(G.SPECTRAL_BITS[cb - 1]))


@functools.lru_cache(maxsize=None)
def unpack_index(cb: int):
    """index -> tuple of dim values (pre-sign for unsigned books)."""
    dim, signed, maxa = CB_INFO[cb]
    if dim == 4:
        mod = 3 if signed else 3
        if cb in (1, 2):
            # values -1..1, index = ((a+1)*3+(b+1))*3 ...
            def unpack(idx):
                vals = []
                for _ in range(4):
                    vals.append(idx % 3)
                    idx //= 3
                return tuple(v - 1 for v in reversed(vals))
        else:
            def unpack(idx):
                vals = []
                for _ in range(4):
                    vals.append(idx % 3)
                    idx //= 3
                return tuple(reversed(vals))
    else:
        if signed:
            n = 2 * maxa + 1

            def unpack(idx):
                return (idx // n - maxa, idx % n - maxa)
        else:
            n = maxa + 1

            def unpack(idx):
                return (idx // n, idx % n)
    return unpack


# encoder side: (value tuple) -> index
@functools.lru_cache(maxsize=None)
def pack_index(cb: int):
    dim, signed, maxa = CB_INFO[cb]
    if dim == 2:
        if signed:
            n = 2 * maxa + 1
            return lambda a, b: (a + maxa) * n + (b + maxa)
        n = maxa + 1
        return lambda a, b: a * n + b
    raise NotImplementedError("encoder uses 2-dim codebooks only")
