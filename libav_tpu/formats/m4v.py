"""Raw MPEG-4 part 2 elementary stream (.m4v) demuxer/muxer (reference:
libavformat/m4vdec.c / rawenc.c m4v muxer)."""

from __future__ import annotations

from libav_tpu.avutil.error import AVError, EOF_
from libav_tpu.avutil.frame import Packet, PKT_FLAG_KEY
from libav_tpu.avutil.opt import Option
from libav_tpu.avutil.rational import Rational
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.formats.api import (InputFormat, OutputFormat, Stream,
                                   register_input, register_output)

VOP = b"\x00\x00\x01\xB6"


def split_vops(data: bytes):
    """One chunk per VOP, with preceding config headers attached."""
    positions = []
    pos = 0
    while True:
        i = data.find(b"\x00\x00\x01", pos)
        if i < 0 or i + 3 >= len(data):
            break
        positions.append((i, data[i + 3]))
        pos = i + 3
    vop_idx = [k for k, (_, c) in enumerate(positions) if c == 0xB6]
    if not vop_idx:
        if data:
            yield data
        return
    starts = []
    for vi in vop_idx:
        j = vi
        while j > 0 and positions[j - 1][1] != 0xB6:
            j -= 1
        starts.append(positions[j][0])
    starts = sorted(set(starts))
    for k, s in enumerate(starts):
        e = starts[k + 1] if k + 1 < len(starts) else len(data)
        yield data[s:e]


@register_input
class M4VDemuxer(InputFormat):
    NAME = "m4v"
    EXTENSIONS = ("m4v",)

    OPTIONS = [
        Option("framerate", "frame rate", "rational", Rational(25, 1)),
    ]

    @classmethod
    def probe(cls, data: bytes, url: str = "") -> int:
        if data[:4] in (b"\x00\x00\x01\xB0", b"\x00\x00\x01\xB5") or \
                data[:3] == b"\x00\x00\x01" and data[3:4] == b"\x20":
            return 70
        ext = url.rsplit(".", 1)[-1].lower() if "." in url else ""
        return 55 if ext in cls.EXTENSIONS else 0

    def read_header(self, pb):
        self.pb = pb
        data = pb.read_all()
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="mpeg4",
                              pix_fmt="yuv420p")
        fr = self.framerate
        self.streams = [Stream(index=0, codecpar=par, time_base=fr.inv(),
                               avg_frame_rate=fr)]
        self._chunks = list(split_vops(data))
        self._idx = 0

    def read_packet(self) -> Packet:
        if self._idx >= len(self._chunks):
            raise AVError(EOF_)
        chunk = self._chunks[self._idx]
        is_key = b"\x00\x00\x01\xB0" in chunk[:64] or \
                 b"\x00\x00\x01\x20" in chunk[:128]
        # raw ES carries no display timestamps: with B-VOPs the decode
        # order differs from presentation, so pts stays unset and the
        # decoder/output clock derives display times (reference: raw
        # video parsers leave pts to the decoder's reorder)
        pkt = Packet(data=chunk, dts=self._idx, duration=1,
                     stream_index=0, flags=PKT_FLAG_KEY if is_key else 0)
        self._idx += 1
        return pkt


@register_output
class M4VMuxer(OutputFormat):
    NAME = "m4v"
    EXTENSIONS = ("m4v",)
    VIDEO_CODEC = "mpeg4"

    def write_packet(self, pkt: Packet):
        self.pb.write(pkt.data)
