"""Bit writer (reference: libavcodec/put_bits.h:237 PutBitContext).

Accumulates into a Python int cache flushed bytewise; encoders' frame-rate
bit packing goes through the native C packer (libav_tpu/native) — this class
serves header writing and tests.
"""

from __future__ import annotations


class PutBits:
    __slots__ = ("_buf", "_cache", "_nbits")

    def __init__(self):
        self._buf = bytearray()
        self._cache = 0
        self._nbits = 0

    def put_bits(self, n: int, value: int):
        """reference: put_bits.h put_bits(pb, n, value)"""
        assert 0 <= value < (1 << n), (n, value)
        self._cache = (self._cache << n) | value
        self._nbits += n
        while self._nbits >= 8:
            self._nbits -= 8
            self._buf.append((self._cache >> self._nbits) & 0xFF)
        self._cache &= (1 << self._nbits) - 1

    def put_sbits(self, n: int, value: int):
        self.put_bits(n, value & ((1 << n) - 1))

    def put_ue_golomb(self, v: int):
        """reference: golomb.h set_ue_golomb"""
        v += 1
        nbits = v.bit_length()
        self.put_bits(2 * nbits - 1, v)

    def put_se_golomb(self, v: int):
        self.put_ue_golomb(2 * v - 1 if v > 0 else -2 * v)

    def align(self, pad_bit: int = 0):
        """reference: put_bits.h avpriv_align_put_bits / flush_put_bits"""
        while self._nbits & 7:
            self.put_bits(1, pad_bit)

    def align_ones(self):
        self.align(1)

    def bits_written(self) -> int:
        return len(self._buf) * 8 + self._nbits

    def flush(self) -> bytes:
        """reference: put_bits.h flush_put_bits (zero-pads last byte)"""
        if self._nbits:
            self.put_bits(8 - self._nbits, 0)
        return bytes(self._buf)

    def data(self) -> bytes:
        return self.flush()

    def copy_bits(self, other: "PutBits"):
        """Append another writer's content bit-exactly (reference:
        bitstream.c avpriv_copy_bits role in merge_partitions)."""
        for byte in other._buf:
            self.put_bits(8, byte)
        if other._nbits:
            self.put_bits(other._nbits, other._cache)
