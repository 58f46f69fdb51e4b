"""Audio filters (reference: libavfilter/af_*.c — af_resample.c wraps
avresample :205, af_volume.c, af_amix.c, af_channelmap.c)."""

from __future__ import annotations

from typing import List

import numpy as np

from libav_tpu.avutil.frame import Frame
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
    """reference: af_amix.c — mixes the inputs pushed into it (single-link
    simplification: averages consecutive pairs is not meaningful in a
    linear chain, so this filter mixes the channels of one frame down)."""
    NAME = "amix"
    TYPE = "audio"

    def filter_frame(self, frame: Frame) -> List[Frame]:
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
