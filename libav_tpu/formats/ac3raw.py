"""Raw AC-3 elementary stream (.ac3) demuxer/muxer (reference:
libavformat/ac3dec.c raw demuxer + rawenc.c)."""

from __future__ import annotations

from libav_tpu.avutil.error import AVError, EOF_
from libav_tpu.avutil.frame import Packet, PKT_FLAG_KEY
from libav_tpu.avutil.rational import Rational
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.codecs.ac3.tables import FRAME_SIZE, SAMPLE_RATES, CHANNELS
from libav_tpu.formats.api import (InputFormat, OutputFormat, Stream,
                                   register_input, register_output)


@register_input
class AC3Demuxer(InputFormat):
    NAME = "ac3"
    EXTENSIONS = ("ac3",)

    @classmethod
    def probe(cls, data: bytes, url: str = "") -> int:
        if data[:2] == b"\x0b\x77":
            return 75
        ext = url.rsplit(".", 1)[-1].lower() if "." in url else ""
        return 50 if ext in cls.EXTENSIONS else 0

    def read_header(self, pb):
        self.pb = pb
        self._data = pb.read_all()
        self._pos = 0
        self._pts = 0
        # peek first frame header for stream parameters
        i = self._data.find(b"\x0b\x77")
        rate, ch = 48000, 2
        if i >= 0 and len(self._data) > i + 7:
            fscod = self._data[i + 4] >> 6
            acmod = self._data[i + 6] >> 5
            if fscod < 3:
                rate = SAMPLE_RATES[fscod]
            ch = CHANNELS[acmod]
            # lfeon follows acmod and the acmod-dependent mix levels
            # (bsi layout: bsid(5) bsmod(3) acmod(3) [cmix][surmix]
            # [dsurmod] lfeon — byte 6 holds acmod in the top 3 bits)
            bits = (self._data[i + 6] << 8) | self._data[i + 7]
            pos = 3                      # past acmod within these 13 bits
            if acmod & 1 and acmod != 1:
                pos += 2
            if acmod & 4:
                pos += 2
            if acmod == 2:
                pos += 2
            lfeon = (bits >> (15 - pos)) & 1
            ch += lfeon
        par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="ac3",
                              sample_rate=rate, channels=ch,
                              sample_fmt="fltp", frame_size=1536)
        self.streams = [Stream(index=0, codecpar=par,
                               time_base=Rational(1, rate))]

    def read_packet(self) -> Packet:
        i = self._data.find(b"\x0b\x77", self._pos)
        if i < 0 or i + 5 >= len(self._data):
            raise AVError(EOF_)
        fscod = self._data[i + 4] >> 6
        frmsizecod = self._data[i + 4] & 0x3F
        if fscod == 3 or frmsizecod >= 38:
            raise AVError(EOF_)
        size = int(FRAME_SIZE[frmsizecod][fscod]) * 2
        chunk = self._data[i:i + size]
        if len(chunk) < size:
            raise AVError(EOF_)
        self._pos = i + size
        pkt = Packet(data=chunk, pts=self._pts, dts=self._pts,
                     duration=1536, stream_index=0, flags=PKT_FLAG_KEY)
        self._pts += 1536
        return pkt


@register_output
class AC3Muxer(OutputFormat):
    NAME = "ac3"
    EXTENSIONS = ("ac3",)
    AUDIO_CODEC = "ac3"

    def write_packet(self, pkt: Packet):
        self.pb.write(pkt.data)
