"""framecrc / framemd5 / crc muxers — the FATE bit-exactness oracles
(reference: libavformat/framecrcenc.c:28-30 per-packet Adler-32 lines,
md5enc.c, crcenc.c; output format `stream, dts, pts, duration, size,
0x<adler32>` matching tests/ref/fate/* files)."""

from __future__ import annotations

from libav_tpu.avutil.crc import adler32, md5_hex
from libav_tpu.avutil.frame import Packet
from libav_tpu.avutil.rational import NOPTS_VALUE
from libav_tpu.formats.api import OutputFormat, register_output


def _ts(v: int) -> str:
    return "X" if v == NOPTS_VALUE else str(v)


@register_output
class FrameCRCMuxer(OutputFormat):
    """reference: framecrcenc.c framecrc_write_packet"""
    NAME = "framecrc"

    def write_header(self, pb):
        self.pb = pb

    def write_packet(self, pkt: Packet):
        crc = adler32(pkt.data)
        line = (f"{pkt.stream_index}, {_ts(pkt.dts)}, {_ts(pkt.pts)}, "
                f"{pkt.duration}, {len(pkt.data)}, 0x{crc:08x}\n")
        self.pb.write(line.encode())


@register_output
class FrameMD5Muxer(OutputFormat):
    """reference: md5enc.c framemd5"""
    NAME = "framemd5"

    def write_header(self, pb):
        self.pb = pb

    def write_packet(self, pkt: Packet):
        line = (f"{pkt.stream_index}, {_ts(pkt.dts)}, {_ts(pkt.pts)}, "
                f"{pkt.duration}, {len(pkt.data)}, {md5_hex(pkt.data)}\n")
        self.pb.write(line.encode())


@register_output
class CRCMuxer:
    """reference: crcenc.c — single rolling Adler-32 over all packets."""
    NAME = "crc"

    def __init__(self, options=None):
        self.streams = []
        self._crc = 1

    def write_header(self, pb):
        self.pb = pb

    def write_packet(self, pkt: Packet):
        self._crc = adler32(pkt.data, self._crc)

    def write_trailer(self):
        self.pb.write(f"CRC=0x{self._crc:08x}\n".encode())


@register_output
class MD5Muxer:
    """reference: md5enc.c md5 — one md5 over all packet payloads."""
    NAME = "md5"

    def __init__(self, options=None):
        import hashlib
        self.streams = []
        self._h = hashlib.md5()

    def write_header(self, pb):
        self.pb = pb

    def write_packet(self, pkt: Packet):
        self._h.update(pkt.data)

    def write_trailer(self):
        self.pb.write(f"MD5={self._h.hexdigest()}\n".encode())
