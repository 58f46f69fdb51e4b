"""Bitstream kit tests (mirrors reference libavcodec/tests/golomb.c and the
get_bits/put_bits contracts)."""

import pytest

from libav_tpu.avutil.error import AVError
from libav_tpu.bitstream import GetBits, PutBits, VLC
from libav_tpu.bitstream.vlc import build_huffman_codes


class TestGetBits:
    def test_basic(self):
        gb = GetBits(bytes([0b10110001, 0b01000000]))
        assert gb.get_bits(1) == 1
        assert gb.get_bits(3) == 0b011
        assert gb.get_bits(4) == 0b0001
        assert gb.get_bits(2) == 0b01
        assert gb.bits_left() == 6

    def test_show_skip(self):
        gb = GetBits(b"\xDE\xAD\xBE\xEF")
        assert gb.show_bits(16) == 0xDEAD
        assert gb.get_bits(16) == 0xDEAD
        gb.skip_bits(8)
        assert gb.get_bits(8) == 0xEF

    def test_long_reads(self):
        gb = GetBits(b"\x12\x34\x56\x78\x9A")
        assert gb.get_bits(32) == 0x12345678

    def test_sbits(self):
        gb = GetBits(bytes([0b11110000]))
        assert gb.get_sbits(4) == -1
        assert gb.get_sbits(4) == 0

    def test_overread_raises(self):
        gb = GetBits(b"\xFF")
        gb.get_bits(8)
        with pytest.raises(AVError):
            gb.get_bits(1)

    def test_cache_boundary(self):
        # force reads spanning the chunked cache window
        data = bytes(range(256)) * 40  # 10240 bytes > _CHUNK
        gb = GetBits(data)
        acc = bytearray()
        # misalign, then read across the 8192-byte boundary
        gb.skip_bits(4)
        gb2 = GetBits(data)
        total_bits = 0
        vals = []
        for n in (7, 13, 3, 32, 9):
            vals.append((n, gb2.get_bits(n)))
            total_bits += n
        # reconstruct from the big int directly
        big = int.from_bytes(data, "big")
        pos = 0
        for n, v in vals:
            shift = len(data) * 8 - pos - n
            assert (big >> shift) & ((1 << n) - 1) == v
            pos += n


class TestPutBits:
    def test_roundtrip(self):
        pb = PutBits()
        seq = [(1, 1), (3, 0b011), (4, 0b0001), (8, 0xAB), (13, 0x1234 & 0x1FFF)]
        for n, v in seq:
            pb.put_bits(n, v)
        data = pb.flush()
        gb = GetBits(data)
        for n, v in seq:
            assert gb.get_bits(n) == v

    def test_golomb_roundtrip(self):
        pb = PutBits()
        for v in range(50):
            pb.put_ue_golomb(v)
        for v in range(-25, 26):
            pb.put_se_golomb(v)
        gb = GetBits(pb.flush())
        for v in range(50):
            assert gb.get_ue_golomb() == v
        for v in range(-25, 26):
            assert gb.get_se_golomb() == v


class TestVLC:
    def test_simple_table(self):
        # codes: 0 (len 1) -> A, 10 (len 2) -> B, 11 (len 2) -> C
        vlc = VLC(2, codes=[0b0, 0b10, 0b11], lengths=[1, 2, 2], values=[65, 66, 67])
        pb = PutBits()
        for bits, n in [(0b0, 1), (0b10, 2), (0b11, 2), (0b0, 1)]:
            pb.put_bits(n, bits)
        gb = GetBits(pb.flush())
        assert [vlc.read(gb) for _ in range(4)] == [65, 66, 67, 65]

    def test_long_codes_subtable(self):
        # lengths up to 12 with a 6-bit first level forces subtables
        lengths = [1, 3, 5, 8, 12, 12]
        codes = [0b0, 0b100, 0b10100, 0b10101000, 0b101010010000, 0b101010010001]
        vlc = VLC(6, codes=codes, lengths=lengths)
        pb = PutBits()
        order = [4, 0, 5, 2, 3, 1, 4]
        for i in order:
            pb.put_bits(lengths[i], codes[i])
        gb = GetBits(pb.flush())
        assert [vlc.read(gb) for _ in range(len(order))] == order

    def test_jpeg_canonical_codes(self):
        # DHT-style: counts per length
        counts = [0, 2, 3, 1]  # lengths 1..4
        codes = build_huffman_codes(counts)
        lengths = []
        for ln, c in enumerate(counts, 1):
            lengths += [ln] * c
        assert len(codes) == 6
        vlc = VLC(8, codes=codes, lengths=lengths)
        pb = PutBits()
        for c, ln in zip(codes, lengths):
            pb.put_bits(ln, c)
        gb = GetBits(pb.flush())
        assert [vlc.read(gb) for _ in range(6)] == list(range(6))

    def test_invalid_code(self):
        vlc = VLC(3, codes=[0b00, 0b01], lengths=[2, 2])
        gb = GetBits(bytes([0b11000000]))
        with pytest.raises(AVError):
            vlc.read(gb)
