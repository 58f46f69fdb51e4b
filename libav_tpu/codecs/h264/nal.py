"""NAL unit layer (reference: libavcodec/h2645_parse.c — Annex-B/AVCC
splitting + emulation prevention)."""

from __future__ import annotations

from typing import List, Tuple

NAL_SLICE = 1
NAL_IDR = 5
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8
NAL_AUD = 9


def split_annexb(data: bytes) -> List[bytes]:
    """Split an Annex-B byte stream into NAL units (without start codes).
    Scans with bytes.find (C speed), not a per-byte Python loop."""
    nals = []
    n = len(data)
    starts = []
    i = 0
    while True:
        j = data.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        starts.append(j + 3)
        i = j + 3
    for k, s in enumerate(starts):
        e = starts[k + 1] - 3 if k + 1 < len(starts) else n
        while e > s and data[e - 1] == 0:
            e -= 1
        if e > s:
            nals.append(data[s:e])
    return nals


def unescape(nal: bytes) -> bytes:
    """Remove emulation prevention bytes (00 00 03 -> 00 00).
    bytes.replace scans left-to-right non-overlapping, which is exactly
    the serial removal semantics (the zero-run restarts after each
    stripped 03), so this is equivalent to the byte loop — and runs at
    memcpy speed instead of ~6 ms per 100 KB slice."""
    return nal.replace(b"\x00\x00\x03", b"\x00\x00")


def escape(rbsp: bytes) -> bytes:
    """Insert emulation prevention bytes."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def nal_header(nal: bytes) -> Tuple[int, int]:
    """(nal_ref_idc, nal_unit_type)"""
    return (nal[0] >> 5) & 3, nal[0] & 0x1F


def make_nal(nal_type: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    """Start code + header + escaped payload."""
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | nal_type]) + \
        escape(rbsp)
