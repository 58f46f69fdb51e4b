"""Audio sample formats + channel layouts (reference: libavutil/samplefmt.h
(244 lines) and channel_layout.h (187 lines))."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class SampleFormat:
    """reference: samplefmt.h:28 AVSampleFormat"""
    NONE = "none"
    U8 = "u8"
    S16 = "s16"
    S32 = "s32"
    FLT = "flt"
    DBL = "dbl"
    U8P = "u8p"
    S16P = "s16p"
    S32P = "s32p"
    FLTP = "fltp"
    DBLP = "dblp"


_INFO: Dict[str, tuple] = {
    # name: (bytes, planar, numpy dtype, packed_alt, planar_alt)
    "u8":   (1, False, np.uint8,   "u8",  "u8p"),
    "s16":  (2, False, np.int16,   "s16", "s16p"),
    "s32":  (4, False, np.int32,   "s32", "s32p"),
    "flt":  (4, False, np.float32, "flt", "fltp"),
    "dbl":  (8, False, np.float64, "dbl", "dblp"),
    "u8p":  (1, True,  np.uint8,   "u8",  "u8p"),
    "s16p": (2, True,  np.int16,   "s16", "s16p"),
    "s32p": (4, True,  np.int32,   "s32", "s32p"),
    "fltp": (4, True,  np.float32, "flt", "fltp"),
    "dblp": (8, True,  np.float64, "dbl", "dblp"),
}


def bytes_per_sample(fmt: str) -> int:
    """reference: samplefmt.c av_get_bytes_per_sample"""
    return _INFO[fmt][0]


def is_planar(fmt: str) -> bool:
    """reference: samplefmt.c av_sample_fmt_is_planar"""
    return _INFO[fmt][1]


def np_dtype(fmt: str):
    return _INFO[fmt][2]


def packed_sample_fmt(fmt: str) -> str:
    return _INFO[fmt][3]


def planar_sample_fmt(fmt: str) -> str:
    return _INFO[fmt][4]


# Channel layouts (reference: channel_layout.h:47-141 AV_CH_* masks)
CH_FRONT_LEFT = 0x1
CH_FRONT_RIGHT = 0x2
CH_FRONT_CENTER = 0x4
CH_LOW_FREQUENCY = 0x8
CH_BACK_LEFT = 0x10
CH_BACK_RIGHT = 0x20
CH_BACK_CENTER = 0x100
CH_SIDE_LEFT = 0x200
CH_SIDE_RIGHT = 0x400

LAYOUT_MONO = CH_FRONT_CENTER
LAYOUT_STEREO = CH_FRONT_LEFT | CH_FRONT_RIGHT
LAYOUT_2_1 = LAYOUT_STEREO | CH_BACK_CENTER
LAYOUT_SURROUND = LAYOUT_STEREO | CH_FRONT_CENTER
LAYOUT_4POINT0 = LAYOUT_SURROUND | CH_BACK_CENTER
LAYOUT_QUAD = LAYOUT_STEREO | CH_BACK_LEFT | CH_BACK_RIGHT
LAYOUT_5POINT0 = LAYOUT_SURROUND | CH_SIDE_LEFT | CH_SIDE_RIGHT
LAYOUT_5POINT1 = LAYOUT_5POINT0 | CH_LOW_FREQUENCY
LAYOUT_5POINT0_BACK = LAYOUT_SURROUND | CH_BACK_LEFT | CH_BACK_RIGHT
LAYOUT_5POINT1_BACK = LAYOUT_5POINT0_BACK | CH_LOW_FREQUENCY
LAYOUT_7POINT1 = LAYOUT_5POINT1 | CH_BACK_LEFT | CH_BACK_RIGHT

_LAYOUT_NAMES = {
    "mono": LAYOUT_MONO, "stereo": LAYOUT_STEREO, "quad": LAYOUT_QUAD,
    "surround": LAYOUT_SURROUND, "4.0": LAYOUT_4POINT0,
    "5.0": LAYOUT_5POINT0, "5.1": LAYOUT_5POINT1,
    "5.0(side)": LAYOUT_5POINT0, "5.1(side)": LAYOUT_5POINT1,
    "7.1": LAYOUT_7POINT1,
}


def channel_layout_nb_channels(layout: int) -> int:
    """reference: channel_layout.c av_get_channel_layout_nb_channels"""
    return bin(layout).count("1")


def get_channel_layout(name: str) -> int:
    """reference: channel_layout.c av_get_channel_layout"""
    if name in _LAYOUT_NAMES:
        return _LAYOUT_NAMES[name]
    raise KeyError(f"unknown channel layout {name!r}")


def default_channel_layout(nb_channels: int) -> int:
    """reference: channel_layout.c av_get_default_channel_layout"""
    defaults = {1: LAYOUT_MONO, 2: LAYOUT_STEREO, 3: LAYOUT_SURROUND,
                4: LAYOUT_QUAD, 5: LAYOUT_5POINT0, 6: LAYOUT_5POINT1,
                8: LAYOUT_7POINT1}
    return defaults.get(nb_channels, 0)
