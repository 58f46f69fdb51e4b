"""Frame and Packet containers (reference: libavutil/frame.h:147 AVFrame,
libavcodec/avcodec.h:1130 AVPacket).

Data model:
  - Packet.data is host bytes (demuxed bitstream) — always host-side, since
    entropy decode is host work.
  - Frame.planes is a list of arrays, each either numpy (host) or
    jax.Array (device/HBM). Frames produced by decoders stay device-resident
    so the filter/scale/encode pipeline never bounces through the host —
    the TPU replacement for libav's refcounted zero-copy AVBufferRef sharing
    (reference: buffer.h:81, frame.h:323). `to_host()` / `to_device()` are
    the equivalents of av_hwframe_transfer_data (hwcontext.h:388).

Reference counting is Python GC; copy-on-write is "jax arrays are immutable".
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from libav_tpu.avutil.pixfmt import pixdesc, plane_dims
from libav_tpu.avutil.rational import NOPTS_VALUE, Rational
from libav_tpu.avutil.samplefmt import (bytes_per_sample, is_planar, np_dtype)


class PictureType:
    """reference: avutil.h:274 AVPictureType"""
    NONE = 0
    I = 1
    P = 2
    B = 3
    S = 4
    SI = 5
    SP = 6
    BI = 7

    NAMES = {0: '?', 1: 'I', 2: 'P', 3: 'B', 4: 'S', 5: 'i', 6: 'p', 7: 'b'}


PKT_FLAG_KEY = 0x0001       # reference: avcodec.h AV_PKT_FLAG_KEY
PKT_FLAG_CORRUPT = 0x0002


@dataclass
class Packet:
    """reference: avcodec.h:1130 AVPacket"""
    data: bytes = b""
    pts: int = NOPTS_VALUE
    dts: int = NOPTS_VALUE
    duration: int = 0
    pos: int = -1
    stream_index: int = 0
    flags: int = 0
    time_base: Rational = field(default_factory=lambda: Rational(0, 1))
    side_data: Dict[str, Any] = field(default_factory=dict)

    @property
    def size(self) -> int:
        return len(self.data)

    @property
    def is_key(self) -> bool:
        return bool(self.flags & PKT_FLAG_KEY)

    def clone(self) -> "Packet":
        return Packet(self.data, self.pts, self.dts, self.duration, self.pos,
                      self.stream_index, self.flags, self.time_base,
                      dict(self.side_data))


@dataclass
class Frame:
    """reference: frame.h:147 AVFrame. One struct for audio and video."""
    # video
    planes: List[Any] = field(default_factory=list)  # np.ndarray or jax.Array
    width: int = 0
    height: int = 0
    format: str = "none"          # PixelFormat or SampleFormat name
    pict_type: int = PictureType.NONE
    key_frame: bool = False
    interlaced_frame: bool = False
    top_field_first: bool = False
    repeat_pict: int = 0
    sample_aspect_ratio: Rational = field(default_factory=lambda: Rational(0, 1))
    crop: tuple = (0, 0, 0, 0)    # top, bottom, left, right (frame.h:600)
    color_range: str = "tv"       # 'tv' (mpeg) | 'pc' (jpeg)  pixfmt.h AVColorRange
    colorspace: str = "bt470bg"

    # audio
    nb_samples: int = 0
    sample_rate: int = 0
    channel_layout: int = 0
    channels: int = 0

    # common
    pts: int = NOPTS_VALUE
    pkt_dts: int = NOPTS_VALUE
    time_base: Rational = field(default_factory=lambda: Rational(0, 1))
    side_data: Dict[str, Any] = field(default_factory=dict)
    opaque: Any = None

    # ------------------------------------------------------------------ #

    @property
    def is_video(self) -> bool:
        return self.width > 0

    def to_host(self) -> "Frame":
        """Device→host transfer (reference: hwcontext.h:388
        av_hwframe_transfer_data). No-op for host frames."""
        out = self.clone_props()
        out.planes = [np.asarray(p) for p in self.planes]
        return out

    def to_device(self, device=None) -> "Frame":
        """Host→device transfer. Places planes in HBM as jax arrays."""
        import jax
        out = self.clone_props()
        out.planes = [jax.device_put(p, device) for p in self.planes]
        return out

    def clone_props(self) -> "Frame":
        """Copy metadata, share plane references (like av_frame_ref)."""
        out = Frame()
        for f in ("width", "height", "format", "pict_type", "key_frame",
                  "interlaced_frame", "top_field_first", "repeat_pict",
                  "sample_aspect_ratio", "crop", "color_range", "colorspace",
                  "nb_samples", "sample_rate", "channel_layout", "channels",
                  "pts", "pkt_dts", "time_base", "opaque"):
            setattr(out, f, getattr(self, f))
        out.side_data = dict(self.side_data)
        out.planes = list(self.planes)
        return out

    # ------------------------------------------------------------------ #

    @staticmethod
    def alloc_video(width: int, height: int, fmt: str,
                    fill: Optional[int] = None) -> "Frame":
        """reference: frame.c av_frame_get_buffer (video branch)"""
        f = Frame(width=width, height=height, format=fmt)
        desc = pixdesc(fmt)
        dtype = np.uint8 if max(c.depth for c in desc.comp) <= 8 else np.uint16
        for (w, h) in plane_dims(fmt, width, height):
            # packed formats: single plane w*step bytes wide
            plane_w = w
            if desc.nb_planes == 1 and desc.nb_components > 1:
                plane_w = w * desc.comp[0].step
            elif fmt in ("nv12", "nv21"):
                pass
            arr = np.zeros((h, plane_w), dtype=dtype)
            if fill is not None:
                arr[:] = fill
            f.planes.append(arr)
        if fmt in ("nv12", "nv21") and len(f.planes) == 2:
            # interleaved chroma: width doubles
            w, h = plane_dims(fmt, width, height)[1]
            f.planes[1] = np.zeros((h, w * 2), dtype=dtype)
        return f

    @staticmethod
    def alloc_audio(nb_samples: int, sample_rate: int, fmt: str,
                    channels: int, channel_layout: int = 0) -> "Frame":
        """reference: frame.c av_frame_get_buffer (audio branch)"""
        f = Frame(nb_samples=nb_samples, sample_rate=sample_rate, format=fmt,
                  channels=channels, channel_layout=channel_layout)
        dt = np_dtype(fmt)
        if is_planar(fmt):
            f.planes = [np.zeros(nb_samples, dtype=dt) for _ in range(channels)]
        else:
            f.planes = [np.zeros(nb_samples * channels, dtype=dt)]
        return f
