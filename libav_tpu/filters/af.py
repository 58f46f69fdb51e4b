"""Audio filters (reference: libavfilter/af_*.c — af_resample.c wraps
avresample :205, af_volume.c, af_amix.c, af_channelmap.c)."""

from __future__ import annotations

from typing import List

import numpy as np

from libav_tpu.avutil.frame import Frame
from libav_tpu.avutil.rational import NOPTS_VALUE
from libav_tpu.avutil.opt import Option
from libav_tpu.avutil.samplefmt import is_planar, np_dtype
from libav_tpu.filters.graph import Filter, register_filter


@register_filter
class ANullFilter(Filter):
    """reference: af_anull.c"""
    NAME = "anull"
    TYPE = "audio"


@register_filter
class AResampleFilter(Filter):
    """reference: af_resample.c — rate/format/layout conversion."""
    NAME = "aresample"
    TYPE = "audio"
    OPTIONS = [
        Option("rate", "output sample rate", "int", 0, 0, 1 << 24),
        Option("fmt", "output sample format", "string", ""),
    ]

    def configure(self, frame: Frame):
        from libav_tpu.avresample import AudioResampler
        self._r = AudioResampler(
            in_sample_rate=frame.sample_rate,
            out_sample_rate=self.rate or frame.sample_rate,
            in_sample_fmt=frame.format,
            out_sample_fmt=self.fmt or frame.format,
            in_channel_layout=frame.channel_layout or (1 if frame.channels == 1 else 3),
            out_channel_layout=frame.channel_layout or (1 if frame.channels == 1 else 3),
        ).open()

    def filter_frame(self, frame: Frame) -> List[Frame]:
        return [self._r.convert(frame)]


@register_filter
class VolumeFilter(Filter):
    """reference: af_volume.c"""
    NAME = "volume"
    TYPE = "audio"
    OPTIONS = [Option("volume", "gain factor", "float", 1.0, 0.0, 1000.0)]

    def filter_frame(self, frame: Frame) -> List[Frame]:
        out = frame.clone_props()
        g = self.volume
        planes = []
        for p in frame.planes:
            a = np.asarray(p)
            if np.issubdtype(a.dtype, np.integer):
                info = np.iinfo(a.dtype)
                planes.append(np.clip(np.round(a.astype(np.float64) * g),
                                      info.min, info.max).astype(a.dtype))
            else:
                planes.append((a * g).astype(a.dtype))
        out.planes = planes
        return [out]


@register_filter
class AMixFilter(Filter):
    """reference: af_amix.c — averages its inputs.  In a DAG the pad>=1
    frames arrive via push_secondary and are mixed sample-wise with the
    main input; in a linear chain it mixes one frame's channels down."""
    NAME = "amix"
    TYPE = "audio"
    N_INPUTS = 2

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._side: List[Frame] = []

    def push_secondary(self, frame: Frame):
        self._side.append(frame)

    def filter_frame(self, frame: Frame) -> List[Frame]:
        if self._side:
            srcs = [frame] + self._side
            self._side = []
            n = min(len(np.asarray(f.planes[0]).reshape(-1))
                    for f in srcs)
            a0 = np.asarray(frame.planes[0]).reshape(-1)[:n]
            acc = np.mean([np.asarray(f.planes[0], dtype=np.float64)
                           .reshape(-1)[:n] for f in srcs], axis=0)
            if np.issubdtype(a0.dtype, np.integer):
                info = np.iinfo(a0.dtype)
                acc = np.clip(np.round(acc), info.min, info.max)
            out = frame.clone_props()
            out.planes = [acc.astype(a0.dtype)]
            return [out]
        if len(frame.planes) <= 1:
            return [frame]
        out = frame.clone_props()
        acc = np.mean([np.asarray(p, dtype=np.float64)
                       for p in frame.planes], axis=0)
        a0 = np.asarray(frame.planes[0])
        if np.issubdtype(a0.dtype, np.integer):
            info = np.iinfo(a0.dtype)
            acc = np.clip(np.round(acc), info.min, info.max)
        out.planes = [acc.astype(a0.dtype)]
        out.channels = 1
        out.channel_layout = 4
        return [out]


@register_filter
class ChannelMapFilter(Filter):
    """reference: af_channelmap.c — 'map=1|0' reorders planar channels."""
    NAME = "channelmap"
    TYPE = "audio"
    OPTIONS = [Option("map", "pipe-separated source indices", "string", "")]

    def filter_frame(self, frame: Frame) -> List[Frame]:
        if not self.map:
            return [frame]
        order = [int(x) for x in self.map.split("|")]
        out = frame.clone_props()
        out.planes = [frame.planes[i] for i in order]
        out.channels = len(order)
        return [out]


@register_filter
class ATrimFilter(Filter):
    """reference: af_atrim/trim — sample-count based trim."""
    NAME = "atrim"
    TYPE = "audio"
    OPTIONS = [
        Option("start_sample", "", "int64", 0, 0, 1 << 60),
        Option("end_sample", "", "int64", 1 << 60, 0, 1 << 62),
    ]

    def configure(self, frame):
        self._pos = 0

    def filter_frame(self, frame: Frame) -> List[Frame]:
        n = frame.nb_samples
        lo = max(self._pos, self.start_sample)
        hi = min(self._pos + n, self.end_sample)
        self._pos += n
        if hi <= lo:
            return []
        a = lo - (self._pos - n)
        b = hi - (self._pos - n)
        if a == 0 and b == n:
            return [frame]
        out = frame.clone_props()
        if is_planar(frame.format):
            out.planes = [np.asarray(p)[a:b] for p in frame.planes]
        else:
            ch = frame.channels
            out.planes = [np.asarray(frame.planes[0])[a * ch:b * ch]]
        out.nb_samples = b - a
        return [out]


@register_filter
class AFormatFilter(Filter):
    """reference: af_aformat.c — constrain/convert sample format and
    rate (conversion via the avresample core when needed)."""
    NAME = "aformat"
    TYPE = "audio"
    OPTIONS = [
        Option("sample_fmts", "target sample format", "string", ""),
        Option("sample_rates", "target sample rate", "int", 0, 0,
               768000),
    ]

    def filter_frame(self, frame: Frame) -> List[Frame]:
        fmt = self.sample_fmts.split("|")[0] if self.sample_fmts else ""
        rate = self.sample_rates
        if (not fmt or frame.format == fmt) and \
                (not rate or frame.sample_rate == rate):
            return [frame]
        from libav_tpu.avresample import AudioResampler
        r = getattr(self, "_conv", None)
        if r is None:
            lay = frame.channel_layout or (1 if frame.channels == 1
                                           else 3)
            r = AudioResampler(
                in_sample_rate=frame.sample_rate,
                out_sample_rate=rate or frame.sample_rate,
                in_sample_fmt=frame.format,
                out_sample_fmt=fmt or frame.format,
                in_channel_layout=lay,
                out_channel_layout=lay).open()
            self._conv = r
        return [r.convert(frame)]


@register_filter
class ASetPtsFilter(Filter):
    """reference: af_asetpts (setpts.c audio instance)."""
    NAME = "asetpts"
    TYPE = "audio"
    OPTIONS = [Option("expr", "pts expression", "string", "PTS")]

    def configure(self, frame):
        self._n = 0
        self._prev = None

    def filter_frame(self, frame: Frame) -> List[Frame]:
        from libav_tpu.avutil.eval import expr_eval
        out = frame.clone_props()
        out.planes = list(frame.planes)
        pts = frame.pts if frame.pts is not None else 0
        env = {"PTS": pts, "N": self._n, "NB_SAMPLES": frame.nb_samples,
               "SAMPLE_RATE": frame.sample_rate,
               "PREV_OUTPTS": self._prev if self._prev is not None
               else 0}
        out.pts = int(expr_eval(self.expr, env))
        self._prev = out.pts
        self._n += 1
        return [out]


@register_filter
class ASetTbFilter(Filter):
    """reference: af_asettb (settb.c audio instance)."""
    NAME = "asettb"
    TYPE = "audio"
    OPTIONS = [Option("tb", "time base expression", "string", "intb")]

    def filter_frame(self, frame: Frame) -> List[Frame]:
        from libav_tpu.avutil.rational import Rational
        out = frame.clone_props()
        out.planes = list(frame.planes)
        tb = self.tb
        if tb in ("intb", "AVTB"):
            if tb == "AVTB":
                new = Rational(1, 1000000)
            else:
                return [out]
        elif "/" in tb:
            n, d = tb.split("/")
            new = Rational(int(n), int(d))
        else:
            new = Rational(1, int(tb))
        if out.pts is not None and out.time_base and out.time_base.den:
            out.pts = out.pts * out.time_base.num * new.den // \
                (out.time_base.den * new.num)
        out.time_base = new
        return [out]


@register_filter
class AShowInfoFilter(Filter):
    """reference: af_ashowinfo.c — per-frame log line with an adler32
    plane checksum."""
    NAME = "ashowinfo"
    TYPE = "audio"

    def configure(self, frame):
        self._n = 0

    def filter_frame(self, frame: Frame) -> List[Frame]:
        import sys

        from libav_tpu.avutil.crc import adler32
        sums = [adler32(np.ascontiguousarray(p).tobytes(), 0)
                for p in frame.planes]
        sys.stderr.write(
            f"[ashowinfo] n:{self._n} pts:{frame.pts} "
            f"nb_samples:{frame.nb_samples} rate:{frame.sample_rate} "
            f"fmt:{frame.format} channels:{frame.channels} "
            f"checksums:[{' '.join('%08X' % s for s in sums)}]\n")
        self._n += 1
        return [frame]


@register_filter
class ASplitFilter(Filter):
    """reference: split.c asplit — identity; the DAG executor fans out."""
    NAME = "asplit"
    TYPE = "audio"
    OPTIONS = [Option("outputs", "number of outputs", "int", 2, 1, 16)]


@register_filter
class AFifoFilter(Filter):
    """reference: fifo.c afifo — a pass-through buffer (our push graph
    has no pull scheduling, so identity preserves semantics)."""
    NAME = "afifo"
    TYPE = "audio"


@register_filter
class ASyncTsFilter(Filter):
    """reference: af_asyncts.c — audio timestamp sync: inserts silence
    for gaps / drops samples on overlap so output pts stay contiguous
    (min_delta compensation path)."""
    NAME = "asyncts"
    TYPE = "audio"
    OPTIONS = [
        Option("min_delta", "resync threshold in samples", "int", 100,
               0, 1 << 30),
    ]

    def configure(self, frame):
        self._next = None

    def filter_frame(self, frame: Frame) -> List[Frame]:
        if frame.pts is None or frame.pts == NOPTS_VALUE:
            return [frame]
        if self._next is None:
            self._next = frame.pts + frame.nb_samples
            return [frame]
        delta = frame.pts - self._next
        out = frame.clone_props()
        out.planes = list(frame.planes)
        if abs(delta) < self.min_delta:
            out.pts = self._next          # snap small drift
        elif delta > 0:
            # gap: prepend silence (packed + planar layouts)
            if is_planar(frame.format):
                out.planes = [np.concatenate(
                    [np.zeros((delta,) + np.asarray(p).shape[1:],
                              np.asarray(p).dtype), np.asarray(p)])
                    for p in frame.planes]
            else:
                ch = max(frame.channels, 1)
                p = np.asarray(frame.planes[0])
                out.planes = [np.concatenate(
                    [np.zeros(delta * ch, p.dtype), p])]
            out.nb_samples = frame.nb_samples + delta
            out.pts = self._next
        else:
            drop = min(-delta, frame.nb_samples)
            if is_planar(frame.format):
                out.planes = [np.asarray(p)[drop:]
                              for p in frame.planes]
            else:
                ch = max(frame.channels, 1)
                out.planes = [np.asarray(frame.planes[0])[drop * ch:]]
            out.nb_samples = frame.nb_samples - drop
            out.pts = self._next
            if out.nb_samples == 0:
                self._next += 0
                return []
        self._next = out.pts + out.nb_samples
        return [out]
