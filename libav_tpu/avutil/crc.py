"""Checksums used by the FATE oracles (reference: libavutil/adler32.c —
framecrc muxer computes per-packet Adler-32, libavformat/framecrcenc.c:28-30;
md5 via hashlib for framemd5/md5 modes)."""

from __future__ import annotations

import hashlib
import zlib


def adler32(data: bytes, seed: int = 1) -> int:
    """reference: adler32.c av_adler32_update (same algorithm as zlib)."""
    return zlib.adler32(data, seed) & 0xFFFFFFFF


def md5_hex(data: bytes) -> str:
    return hashlib.md5(data).hexdigest()


class MD5Stream:
    def __init__(self):
        self._h = hashlib.md5()

    def update(self, data: bytes):
        self._h.update(data)

    def hexdigest(self) -> str:
        return self._h.hexdigest()


# CRC (reference: libavutil/crc.c) — table-driven, used by mpegts etc.
_CRC32_IEEE_TABLE = None


def _crc32_table(poly: int):
    table = []
    for i in range(256):
        c = i << 24
        for _ in range(8):
            c = ((c << 1) ^ poly) if (c & 0x80000000) else (c << 1)
            c &= 0xFFFFFFFF
        table.append(c)
    return table


def crc32_mpeg2(data: bytes, crc: int = 0xFFFFFFFF) -> int:
    """CRC-32/MPEG-2 (big-endian, poly 0x04C11DB7, no final xor) —
    used by MPEG-TS PSI sections (reference: crc.c AV_CRC_32_IEEE)."""
    global _CRC32_IEEE_TABLE
    if _CRC32_IEEE_TABLE is None:
        _CRC32_IEEE_TABLE = _crc32_table(0x04C11DB7)
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC32_IEEE_TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc
