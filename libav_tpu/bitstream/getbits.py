"""Bit reader (reference: libavcodec/get_bits.h:54 GetBitContext, the
OPEN_READER/UPDATE_CACHE cache-based design get_bits.h:113).

The reference keeps a 32/64-bit cache refilled from memory; in Python the
equivalent trick is int.from_bytes over the whole buffer once, then all
reads are shifts against one big int — O(1) per read against a Python long
window. For longer buffers we chunk the window to keep shift costs bounded.
"""

from __future__ import annotations

from libav_tpu.avutil.error import AVError, INVALIDDATA


class GetBits:
    __slots__ = ("data", "size_bits", "pos", "_cache", "_cache_pos", "_cache_bits")

    _CHUNK = 8192  # bytes per cache window

    def __init__(self, data: bytes, size_bits: int = -1):
        self.data = data
        self.size_bits = len(data) * 8 if size_bits < 0 else size_bits
        self.pos = 0
        self._cache = 0
        self._cache_pos = -1   # byte offset the cache starts at
        self._cache_bits = 0

    # ------------------------------------------------------------------ #

    def _fill(self, byte_off: int):
        end = min(byte_off + self._CHUNK, len(self.data))
        self._cache = int.from_bytes(self.data[byte_off:end], "big")
        self._cache_pos = byte_off
        self._cache_bits = (end - byte_off) * 8

    def get_bits(self, n: int) -> int:
        """reference: get_bits.h get_bits(gb, n), n in 1..32 (here any n)"""
        if n == 0:
            return 0
        pos = self.pos
        if pos + n > self.size_bits:
            raise AVError(INVALIDDATA, "bitstream overread")
        byte_off = pos >> 3
        if (self._cache_pos < 0 or byte_off < self._cache_pos or
                pos + n > (self._cache_pos * 8 + self._cache_bits)):
            self._fill(byte_off)
        bit_in_cache = pos - self._cache_pos * 8
        shift = self._cache_bits - bit_in_cache - n
        self.pos = pos + n
        return (self._cache >> shift) & ((1 << n) - 1)

    def get_bit(self) -> int:
        return self.get_bits(1)

    def show_bits(self, n: int) -> int:
        """reference: get_bits.h show_bits (peek without consuming)"""
        save = self.pos
        # tolerate peeking past the end by padding with zeros
        avail = self.size_bits - self.pos
        if avail >= n:
            v = self.get_bits(n)
        else:
            v = (self.get_bits(max(avail, 0)) << (n - max(avail, 0))) if avail > 0 else 0
        self.pos = save
        return v

    def skip_bits(self, n: int):
        self.pos += n

    def get_bits_long(self, n: int) -> int:
        return self.get_bits(n)

    def get_xbits(self, n: int) -> int:
        """reference: get_bits.h get_xbits — n-bit value where a 0 MSB
        means negative: v - (2^n - 1)."""
        v = self.get_bits(n)
        if n and not (v >> (n - 1)):
            v -= (1 << n) - 1
        return v

    def get_sbits(self, n: int) -> int:
        v = self.get_bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def bits_left(self) -> int:
        return self.size_bits - self.pos

    def bits_read(self) -> int:
        return self.pos

    def align(self):
        """reference: get_bits.h align_get_bits"""
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return (self.pos + 7) >> 3

    # exp-Golomb here for convenience (reference: golomb.h:525)
    def get_ue_golomb(self) -> int:
        """reference: golomb.h get_ue_golomb"""
        zeros = 0
        while self.get_bits(1) == 0:
            zeros += 1
            if zeros > 31:
                raise AVError(INVALIDDATA, "golomb code too long")
        if zeros == 0:
            return 0
        return (1 << zeros) - 1 + self.get_bits(zeros)

    def get_se_golomb(self) -> int:
        """reference: golomb.h get_se_golomb (signed mapping)"""
        v = self.get_ue_golomb()
        if v & 1:
            return (v + 1) >> 1
        return -(v >> 1)
