"""Raw H.264 Annex-B elementary stream (.h264/.264) demuxer/muxer
(reference: libavformat/h264dec.c raw demuxer + rawenc.c)."""

from __future__ import annotations

from libav_tpu.avutil.error import AVError, EOF_
from libav_tpu.avutil.frame import Packet, PKT_FLAG_KEY
from libav_tpu.avutil.opt import Option
from libav_tpu.avutil.rational import Rational
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.formats.api import (InputFormat, OutputFormat, Stream,
                                   register_input, register_output)


def split_access_units(data: bytes):
    """One chunk per primary coded picture: cut before SPS/AUD/first slice
    NAL with first_mb_in_slice == 0."""
    # find NAL start positions
    poss = []
    i = 0
    n = len(data)
    while i < n - 3:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            poss.append(i + 3)
            i += 3
        else:
            i += 1
    starts = []
    for k, p in enumerate(poss):
        ntype = data[p] & 0x1F
        if ntype in (1, 5):
            # first_mb_in_slice == 0 <=> first payload bit is '1' (ue(0))
            if p + 1 < n and (data[p + 1] & 0x80):
                s = k
                while s > 0 and (data[poss[s - 1]] & 0x1F) in (6, 7, 8, 9):
                    s -= 1
                start = poss[s] - 3
                if start >= 1 and data[start - 1] == 0:
                    start -= 1   # 4-byte start code
                starts.append(start)
    starts = sorted(set(starts))
    if not starts:
        if data:
            yield data
        return
    for k, s in enumerate(starts):
        e = starts[k + 1] if k + 1 < len(starts) else n
        yield data[s:e]


@register_input
class H264Demuxer(InputFormat):
    NAME = "h264"
    EXTENSIONS = ("h264", "264", "avc")

    OPTIONS = [
        Option("framerate", "frame rate", "rational", Rational(25, 1)),
    ]

    @classmethod
    def probe(cls, data: bytes, url: str = "") -> int:
        if data[:4] == b"\x00\x00\x00\x01" and (data[4] & 0x1F) in (7, 9):
            return 80
        ext = url.rsplit(".", 1)[-1].lower() if "." in url else ""
        return 55 if ext in cls.EXTENSIONS else 0

    def read_header(self, pb):
        self.pb = pb
        data = pb.read_all()
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                              pix_fmt="yuv420p")
        fr = self.framerate
        self.streams = [Stream(index=0, codecpar=par, time_base=fr.inv(),
                               avg_frame_rate=fr)]
        self._chunks = list(split_access_units(data))
        self._idx = 0

    def read_packet(self) -> Packet:
        if self._idx >= len(self._chunks):
            raise AVError(EOF_)
        chunk = self._chunks[self._idx]
        is_key = any((chunk[i] & 0x1F) == 5
                     for i in range(3, min(len(chunk), 256))
                     if chunk[i - 3:i] in (b"\x00\x00\x01",))
        # raw Annex-B has no timestamps at all and the reference's
        # demux core skips pts/dts interpolation for H.264 entirely
        # (utils.c:716 "We skip H.264 ... delay and has_b_frames are
        # not reliably set"), so packets stay unstamped and the decode
        # output clock numbers frames 0,1,2,... like reference avconv
        pkt = Packet(data=chunk, pts=None, dts=None, duration=1,
                     stream_index=0, flags=PKT_FLAG_KEY if is_key else 0)
        self._idx += 1
        return pkt


@register_output
class H264Muxer(OutputFormat):
    NAME = "h264"
    EXTENSIONS = ("h264", "264")
    VIDEO_CODEC = "h264"

    def write_packet(self, pkt: Packet):
        self.pb.write(pkt.data)
