"""image2 demuxer/muxer: single images and printf-style sequences
(reference: libavformat/img2dec.c / img2enc.c)."""

from __future__ import annotations

import glob
import os
import re
from typing import List, Optional

from libav_tpu.avutil.error import AVError, EOF_, INVALIDDATA
from libav_tpu.avutil.frame import Packet, PKT_FLAG_KEY
from libav_tpu.avutil.opt import Option
from libav_tpu.avutil.rational import Rational
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.formats.api import (InputFormat, OutputFormat, Stream,
                                   register_input, register_output)
from libav_tpu.formats.io import url_open

_EXT_TO_CODEC = {
    "jpg": "mjpeg", "jpeg": "mjpeg", "mjpeg": "mjpeg", "mjpg": "mjpeg",
    "png": "png", "bmp": "bmp", "ppm": "ppm", "pgm": "pgm",
}


def _expand_sequence(url: str) -> List[str]:
    """%d pattern -> sorted file list (reference: img2dec.c find_images)."""
    if "%" in url:
        pat = re.sub(r"%0?\d*d", "*", url)
        return sorted(glob.glob(pat))
    return [url]


@register_input
class Image2Demuxer(InputFormat):
    NAME = "image2,mjpeg"
    LONG_NAME = "image2 sequence / single images"
    EXTENSIONS = ("jpg", "jpeg", "mjpeg", "mjpg", "png", "bmp", "ppm", "pgm")

    OPTIONS = [
        Option("framerate", "sequence frame rate", "rational", Rational(25, 1)),
    ]

    @classmethod
    def probe(cls, data: bytes, url: str = "") -> int:
        if data[:2] == b"\xFF\xD8":
            return 90   # JPEG SOI
        ext = url.rsplit(".", 1)[-1].lower() if "." in url else ""
        if ext in cls.EXTENSIONS:
            return 60
        return 0

    def read_header(self, pb):
        self.pb = pb
        self._files = _expand_sequence(self.url) if "%" in self.url else None
        self._idx = 0
        self._mjpeg_stream_data: Optional[bytes] = None

        ext = self.url.rsplit(".", 1)[-1].lower() if "." in self.url else "jpg"
        codec_id = _EXT_TO_CODEC.get(ext, "mjpeg")
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id=codec_id)
        fr = self.framerate
        st = Stream(index=0, codecpar=par, time_base=fr.inv(),
                    avg_frame_rate=fr)
        self.streams = [st]

        if self._files is None:
            # single resource: may be a concatenated MJPEG stream
            self._mjpeg_stream_data = pb.read_all()
            self._pos = 0

    def read_packet(self) -> Packet:
        if self._files is not None:
            if self._idx >= len(self._files):
                raise AVError(EOF_)
            with url_open(self._files[self._idx], "r") as f:
                data = f.read_all()
            pkt = Packet(data=data, pts=self._idx, dts=self._idx,
                         duration=1, stream_index=0, flags=PKT_FLAG_KEY)
            self._idx += 1
            return pkt
        # split the blob at JPEG SOI/EOI boundaries
        data = self._mjpeg_stream_data
        if self._pos >= len(data):
            raise AVError(EOF_)
        start = data.find(b"\xFF\xD8", self._pos)
        if start < 0:
            raise AVError(EOF_)
        # find matching EOI scanning past stuffing
        end = data.find(b"\xFF\xD9", start + 2)
        end = len(data) if end < 0 else end + 2
        self._pos = end
        pkt = Packet(data=data[start:end], pts=self._idx, dts=self._idx,
                     duration=1, stream_index=0, flags=PKT_FLAG_KEY)
        self._idx += 1
        return pkt


@register_output
class Image2Muxer(OutputFormat):
    NAME = "image2"
    LONG_NAME = "image2 sequence"
    EXTENSIONS = ("jpg", "jpeg", "mjpg", "mjpeg")
    VIDEO_CODEC = "mjpeg"
    FLAG_NOFILE = True   # reference: img2enc.c AVFMT_NOFILE

    def write_header(self, pb):
        self.pb = pb
        self._idx = 1
        self._pattern = "%" in self.url

    def write_packet(self, pkt: Packet):
        if self._pattern:
            path = self.url % self._idx
            with url_open(path, "w") as f:
                f.write(pkt.data)
            self._idx += 1
        else:
            with url_open(self.url, "w") as f:
                f.write(pkt.data)


@register_output
class MJPEGRawMuxer(OutputFormat):
    """Concatenated JPEGs (reference: rawenc.c mjpeg muxer)."""
    NAME = "mjpeg"
    EXTENSIONS = ("mjpg",)
    VIDEO_CODEC = "mjpeg"

    def write_packet(self, pkt: Packet):
        self.pb.write(pkt.data)
