"""rawvideo demuxer/muxer (reference: libavformat/rawdec.c rawvideo branch,
rawenc.c)."""

from __future__ import annotations

from libav_tpu.avutil.error import AVError, EOF_, EINVAL
from libav_tpu.avutil.frame import Packet, PKT_FLAG_KEY
from libav_tpu.avutil.imgutils import image_get_buffer_size
from libav_tpu.avutil.opt import Option
from libav_tpu.avutil.rational import Rational
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.formats.api import (InputFormat, OutputFormat, Stream,
                                   register_input, register_output)


@register_input
class RawVideoDemuxer(InputFormat):
    NAME = "rawvideo"
    LONG_NAME = "raw video"
    EXTENSIONS = ("yuv", "rgb", "raw")

    OPTIONS = [
        Option("video_size", "WxH", "string", None),
        Option("pixel_format", "pixel format", "string", "yuv420p"),
        Option("framerate", "frame rate", "rational", Rational(25, 1)),
    ]

    def read_header(self, pb):
        self.pb = pb
        if not self.video_size:
            raise AVError(EINVAL, "rawvideo requires video_size (WxH)")
        w, h = (int(x) for x in self.video_size.lower().split("x"))
        self._frame_size = image_get_buffer_size(self.pixel_format, w, h)
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="rawvideo",
                              width=w, height=h, pix_fmt=self.pixel_format)
        fr = self.framerate
        self.streams = [Stream(index=0, codecpar=par, time_base=fr.inv(),
                               avg_frame_rate=fr)]
        self._idx = 0

    def read_packet(self) -> Packet:
        data = self.pb.read(self._frame_size)
        if len(data) < self._frame_size:
            raise AVError(EOF_)
        pkt = Packet(data=data, pts=self._idx, dts=self._idx, duration=1,
                     stream_index=0, flags=PKT_FLAG_KEY)
        self._idx += 1
        return pkt


@register_output
class RawVideoMuxer(OutputFormat):
    NAME = "rawvideo"
    EXTENSIONS = ("yuv", "rgb", "raw")
    VIDEO_CODEC = "rawvideo"

    def write_packet(self, pkt: Packet):
        self.pb.write(pkt.data)


@register_output
class NullMuxer(OutputFormat):
    """reference: nullenc.c — discard output (benchmarks)."""
    NAME = "null"
    VIDEO_CODEC = "rawvideo"
    AUDIO_CODEC = "pcm_s16le"

    def write_packet(self, pkt: Packet):
        pass
