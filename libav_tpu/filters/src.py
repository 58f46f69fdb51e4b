"""Source filters (reference: libavfilter/vsrc_testsrc.c, asrc_anullsrc;
the FATE vsynth generators tests/videogen.c / rotozoom.c live here too
since they are the sample-free encode-test sources — SURVEY.md §4 tier 2).
"""

from __future__ import annotations

import math
from typing import List

import numpy as np

from libav_tpu.avutil.frame import Frame
from libav_tpu.avutil.opt import Option
from libav_tpu.avutil.rational import Rational
from libav_tpu.filters.graph import Filter, register_filter


def testsrc_frame(w: int, h: int, n: int, fmt: str = "yuv420p") -> Frame:
    """Moving test pattern (reference: vsrc_testsrc.c testsrc)."""
    f = Frame.alloc_video(w, h, fmt)
    yy, xx = np.mgrid[0:h, 0:w]
    f.planes[0] = ((xx + n * 2) % 256).astype(np.uint8)
    if fmt != "gray":
        ch, cw = f.planes[1].shape
        yy, xx = np.mgrid[0:ch, 0:cw]
        f.planes[1] = ((128 + 64 * np.sin((xx + n) / 10)).astype(np.uint8))
        f.planes[2] = ((128 + 64 * np.cos((yy + n) / 10)).astype(np.uint8))
    f.pts = n
    return f


def vsynth1_frame(w: int, h: int, n: int) -> Frame:
    """Port of the FATE synthetic source generator semantics
    (reference: tests/videogen.c — moving smooth color wheels). Not
    bit-identical to videogen's output; serves the same role: a smooth,
    motion-rich, sample-free encode test source."""
    f = Frame.alloc_video(w, h, "yuv420p")
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cx = w / 2 + w / 4 * math.cos(n * 0.1)
    cy = h / 2 + h / 4 * math.sin(n * 0.13)
    r = np.hypot(xx - cx, yy - cy)
    f.planes[0] = (128 + 100 * np.cos(r / 6 - n * 0.2)).astype(np.uint8)
    ch, cw = f.planes[1].shape
    yy, xx = np.mgrid[0:ch, 0:cw].astype(np.float64)
    f.planes[1] = (128 + 60 * np.sin((xx + n) / 11)).astype(np.uint8)
    f.planes[2] = (128 + 60 * np.cos((yy + 2 * n) / 13)).astype(np.uint8)
    f.pts = n
    return f


def rotozoom_frame(w: int, h: int, n: int) -> Frame:
    """Rotating/zooming checker (reference: tests/rotozoom.c role)."""
    f = Frame.alloc_video(w, h, "yuv420p")
    ang = n * 0.05
    zoom = 1.0 + 0.3 * math.sin(n * 0.08)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    u = ((xx - w / 2) * math.cos(ang) - (yy - h / 2) * math.sin(ang)) * zoom
    v = ((xx - w / 2) * math.sin(ang) + (yy - h / 2) * math.cos(ang)) * zoom
    f.planes[0] = (((np.floor(u / 8) + np.floor(v / 8)) % 2) * 160 + 48
                   ).astype(np.uint8)
    f.planes[1][:] = 128
    f.planes[2][:] = 128
    f.pts = n
    return f


def audiogen(nb_samples: int, sample_rate: int = 44100, channels: int = 2,
             seed: int = 0) -> Frame:
    """Multi-tone test audio (reference: tests/audiogen.c role)."""
    t = np.arange(nb_samples) / sample_rate
    freqs = [440.0, 880.0, 1320.0]
    x = sum(np.sin(2 * math.pi * fq * t + i) / (i + 1)
            for i, fq in enumerate(freqs)) / 1.85
    f = Frame(nb_samples=nb_samples, sample_rate=sample_rate, format="fltp",
              channels=channels, channel_layout=3 if channels == 2 else 4)
    f.planes = [(x * (0.9 - 0.1 * c)).astype(np.float32)
                for c in range(channels)]
    f.pts = 0
    return f


@register_filter
class TestSrcFilter(Filter):
    """Generator filter: ignores input, used via .generate()"""
    NAME = "testsrc"
    OPTIONS = [
        Option("size", "WxH", "string", "320x240"),
        Option("rate", "frame rate", "rational", Rational(25, 1)),
        Option("duration", "number of frames", "int", 25, 1, 1 << 20),
    ]

    def generate(self):
        w, h = (int(x) for x in self.size.lower().split("x"))
        for n in range(self.duration):
            f = testsrc_frame(w, h, n)
            f.time_base = self.rate.inv()
            yield f
