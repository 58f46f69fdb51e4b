"""Raw MPEG-1/2 video elementary stream demuxer/muxer (reference:
libavformat/rawdec.c mpegvideo branch + mpeg1video muxer in rawenc.c).

Packets are split at picture start codes; sequence/GOP headers travel with
the following picture (same as the reference's parser contract).
"""

from __future__ import annotations

from libav_tpu.avutil.error import AVError, EOF_
from libav_tpu.avutil.frame import Packet, PKT_FLAG_KEY
from libav_tpu.avutil.opt import Option
from libav_tpu.avutil.rational import Rational
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.formats.api import (InputFormat, OutputFormat, Stream,
                                   register_input, register_output)

PICTURE_CODE = 0x00
SEQ_CODE = 0xB3


def split_pictures(data: bytes):
    """Yield one chunk per coded picture, headers attached in front."""
    # collect all start code positions
    positions = []
    pos = 0
    while True:
        idx = data.find(b"\x00\x00\x01", pos)
        if idx < 0 or idx + 3 >= len(data):
            break
        positions.append((idx, data[idx + 3]))
        pos = idx + 3
    if not positions:
        return
    # chunk boundaries: at each picture start code, cut before any
    # directly preceding seq/gop/ext headers
    pic_idx = [i for i, (_, c) in enumerate(positions) if c == PICTURE_CODE]
    if not pic_idx:
        yield data
        return
    starts = []
    for pi in pic_idx:
        j = pi
        while j > 0 and positions[j - 1][1] in (0xB3, 0xB8, 0xB5, 0xB2):
            j -= 1
        starts.append(positions[j][0])
    starts = sorted(set(starts))
    for k, s in enumerate(starts):
        e = starts[k + 1] if k + 1 < len(starts) else len(data)
        yield data[s:e]


@register_input
class MPEGVideoDemuxer(InputFormat):
    NAME = "mpegvideo,m1v,m2v"
    EXTENSIONS = ("m1v", "m2v", "mpgv", "mpv")

    OPTIONS = [
        Option("framerate", "frame rate", "rational", Rational(25, 1)),
    ]

    @classmethod
    def probe(cls, data: bytes, url: str = "") -> int:
        if data[:4] == b"\x00\x00\x01\xB3":
            return 80
        ext = url.rsplit(".", 1)[-1].lower() if "." in url else ""
        if ext in cls.EXTENSIONS:
            return 55
        return 0

    def read_header(self, pb):
        self.pb = pb
        data = pb.read_all()
        codec = "mpeg1video"
        # sequence_extension right after sequence header => MPEG-2
        seq = data.find(b"\x00\x00\x01\xB3")
        if seq >= 0:
            nxt = data.find(b"\x00\x00\x01\xB5", seq)
            if 0 <= nxt < seq + 200:
                codec = "mpeg2video"
        w = h = 0
        if seq >= 0 and len(data) > seq + 7:
            w = (data[seq + 4] << 4) | (data[seq + 5] >> 4)
            h = ((data[seq + 5] & 0xF) << 8) | data[seq + 6]
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id=codec,
                              width=w, height=h, pix_fmt="yuv420p")
        fr = self.framerate
        self.streams = [Stream(index=0, codecpar=par, time_base=fr.inv(),
                               avg_frame_rate=fr)]
        self._chunks = list(split_pictures(data))
        self._idx = 0

    def read_packet(self) -> Packet:
        if self._idx >= len(self._chunks):
            raise AVError(EOF_)
        chunk = self._chunks[self._idx]
        is_key = b"\x00\x00\x01\xB3" in chunk[:64]   # carries a seq header
        # raw ES carries only a decode-order dts chain; pts stays unset
        # because presentation is delayed (reference compute_pkt_fields,
        # utils.c:641 delayed branch: "Cannot compute PTS").  Quirk kept
        # for parity: the reference's MPEG-1 probe path stamps pts on
        # the FIRST packet only (update_initial_durations, utils.c:629,
        # fills buffered pts while avctx->has_b_frames is still 0 —
        # by the same point an MPEG-2 stream has already opened its
        # decoder with has_b_frames=1), observable in avprobe output.
        pts = None
        if self._idx == 0 and \
                self.streams[0].codecpar.codec_id == "mpeg1video":
            pts = 0
        pkt = Packet(data=chunk, pts=pts, dts=self._idx, duration=1,
                     stream_index=0, flags=PKT_FLAG_KEY if is_key else 0)
        self._idx += 1
        return pkt


@register_output
class MPEG1VideoMuxer(OutputFormat):
    NAME = "mpeg1video,m1v"
    EXTENSIONS = ("m1v", "mpgv")
    VIDEO_CODEC = "mpeg1video"

    def write_packet(self, pkt: Packet):
        self.pb.write(pkt.data)

    def write_trailer(self):
        self.pb.write(b"\x00\x00\x01\xB7")   # sequence_end_code


@register_output
class MPEG2VideoMuxer(MPEG1VideoMuxer):
    NAME = "mpeg2video,m2v"
    EXTENSIONS = ("m2v",)
    VIDEO_CODEC = "mpeg2video"
