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


def _tb_header(streams) -> bytes:
    """reference: framehash.c ff_framehash_write_header '#tb i: num/den'"""
    out = []
    for i, st in enumerate(streams):
        tb = st.time_base
        out.append(f"#tb {i}: {tb.num}/{tb.den}\n")
    return "".join(out).encode()


@register_output
class FrameCRCMuxer(OutputFormat):
    """reference: framecrcenc.c framecrc_write_packet. The line format is
    byte-identical to the reference's
    '%d, %10PRId64, %10PRId64, %8PRId64, %8d, 0x%08x' so outputs diff
    cleanly against tests/ref/fate/* and reference-avconv output."""
    NAME = "framecrc"

    def write_header(self, pb):
        self.pb = pb
        pb.write(_tb_header(self.streams))

    def write_packet(self, pkt: Packet):
        crc = adler32(pkt.data, 0)   # framecrcenc.c:30 seeds with 0
        line = (f"{pkt.stream_index}, {_ts(pkt.dts):>10}, "
                f"{_ts(pkt.pts):>10}, {pkt.duration:>8}, "
                f"{len(pkt.data):>8}, 0x{crc:08x}\n")
        self.pb.write(line.encode())


@register_output
class FrameMD5Muxer(OutputFormat):
    """reference: md5enc.c framemd5 (same column layout as framecrc)"""
    NAME = "framemd5"

    def write_header(self, pb):
        self.pb = pb
        pb.write(_tb_header(self.streams))

    def write_packet(self, pkt: Packet):
        line = (f"{pkt.stream_index}, {_ts(pkt.dts):>10}, "
                f"{_ts(pkt.pts):>10}, {pkt.duration:>8}, "
                f"{len(pkt.data):>8}, {md5_hex(pkt.data)}\n")
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
