"""Core layer tests (mirrors reference libavutil/tests/: eval, opt, rational,
adler32 — SURVEY.md §4 tier 4)."""

import numpy as np
import pytest

from libav_tpu.avutil import crc, eval as aveval, log
from libav_tpu.avutil.error import AVError, EAGAIN, EOF_, INVALIDDATA
from libav_tpu.avutil.frame import Frame, Packet
from libav_tpu.avutil.imgutils import bytes_to_frame, frame_to_bytes, image_get_buffer_size
from libav_tpu.avutil.opt import Option, OptionedObject
from libav_tpu.avutil.pixfmt import chroma_sub, pixdesc, plane_dims
from libav_tpu.avutil.rational import (NOPTS_VALUE, Rational, Rounding,
                                       compare_ts, rescale_q, rescale_rnd)


class TestRational:
    def test_reduce(self):
        assert Rational.reduce(4, 8) == Rational(1, 2)
        assert Rational.reduce(-4, 8) == Rational(-1, 2)
        assert Rational.reduce(4, -8) == Rational(-1, 2)

    def test_arith(self):
        assert Rational(1, 2) * Rational(2, 3) == Rational(1, 3)
        assert Rational(1, 2) + Rational(1, 3) == Rational(5, 6)

    def test_rescale_q(self):
        # 90kHz -> 1kHz: ts 90000 -> 1000
        assert rescale_q(90000, Rational(1, 90000), Rational(1, 1000)) == 1000
        assert rescale_q(NOPTS_VALUE, Rational(1, 90000), Rational(1, 1000)) == NOPTS_VALUE

    def test_rescale_rounding(self):
        assert rescale_rnd(1, 1, 2, Rounding.ZERO) == 0
        assert rescale_rnd(1, 1, 2, Rounding.INF) == 1
        assert rescale_rnd(-1, 1, 2, Rounding.DOWN) == -1
        assert rescale_rnd(-1, 1, 2, Rounding.UP) == 0
        assert rescale_rnd(1, 1, 2, Rounding.NEAR_INF) == 1  # half away from 0
        assert rescale_rnd(-1, 1, 2, Rounding.NEAR_INF) == -1

    def test_compare_ts(self):
        assert compare_ts(100, Rational(1, 100), 1, Rational(1, 1)) == 0
        assert compare_ts(101, Rational(1, 100), 1, Rational(1, 1)) == 1


class TestEval:
    def test_basic(self):
        assert aveval.expr_eval("1+2*3") == 7
        assert aveval.expr_eval("(1+2)*3") == 9
        assert aveval.expr_eval("2^10") == 1024
        assert aveval.expr_eval("-3+5") == 2

    def test_rc_eq(self):
        # the default rate-control equation (reference: ratecontrol.c:486)
        v = aveval.expr_eval("tex^qComp", {"tex": 1000.0, "qComp": 0.6})
        assert abs(v - 1000.0 ** 0.6) < 1e-9

    def test_funcs(self):
        assert aveval.expr_eval("max(3, min(10, 5))") == 5
        assert aveval.expr_eval("gt(2,1)") == 1.0
        assert abs(aveval.expr_eval("sqrt(2)") - 2 ** 0.5) < 1e-12

    def test_errors(self):
        with pytest.raises(AVError):
            aveval.expr_eval("1+")
        with pytest.raises(AVError):
            aveval.expr_eval("nosuchvar")


class TestOpt:
    class Ctx(OptionedObject):
        OPTIONS = [
            Option("bit_rate", "target bitrate", "int64", 200000, 0, 2**40),
            Option("qscale", "quantizer", "float", 2.0, 1.0, 31.0),
            Option("preset", "preset name", "string", "medium"),
            Option("framerate", "fps", "rational", Rational(25, 1)),
            Option("flags", "codec flags", "flags", 0, unit="flags"),
            Option("bitexact", "", "const", unit="flags", const_value=1),
            Option("lowres", "", "const", unit="flags", const_value=2),
            Option("idct", "idct impl", "int", 0, 0, 10, unit="idct"),
            Option("simple", "", "const", unit="idct", const_value=2),
        ]

        def __init__(self):
            self.init_defaults()

    def test_defaults(self):
        c = self.Ctx()
        assert c.bit_rate == 200000
        assert c.qscale == 2.0

    def test_set_string(self):
        c = self.Ctx()
        c.set_opt("bit_rate", "500000")
        assert c.bit_rate == 500000
        c.set_opt("framerate", "30000/1001")
        assert c.framerate == Rational(30000, 1001)

    def test_named_const(self):
        c = self.Ctx()
        c.set_opt("idct", "simple")
        assert c.idct == 2

    def test_flags_syntax(self):
        c = self.Ctx()
        c.set_opt("flags", "+bitexact+lowres")
        assert c.flags == 3
        c.set_opt("flags", "-lowres")
        assert c.flags == 1

    def test_range_check(self):
        c = self.Ctx()
        with pytest.raises(AVError):
            c.set_opt("qscale", "99")

    def test_leftover(self):
        c = self.Ctx()
        left = c.set_opts({"qscale": "5", "zzz": 1}, ignore_unknown=True)
        assert left == {"zzz": 1}
        assert c.qscale == 5.0


class TestPixFmt:
    def test_yuv420p(self):
        d = pixdesc("yuv420p")
        assert d.nb_planes == 3
        assert chroma_sub("yuv420p") == (1, 1)
        assert plane_dims("yuv420p", 1920, 1080) == [(1920, 1080), (960, 540), (960, 540)]
        assert d.bits_per_pixel == 12

    def test_odd_dims(self):
        assert plane_dims("yuv420p", 175, 145) == [(175, 145), (88, 73), (88, 73)]

    def test_buffer_size(self):
        assert image_get_buffer_size("yuv420p", 16, 16) == 16 * 16 * 3 // 2
        assert image_get_buffer_size("rgb24", 10, 10) == 300
        assert image_get_buffer_size("yuyv422", 10, 2) == 40


class TestFrame:
    def test_alloc_video(self):
        f = Frame.alloc_video(64, 48, "yuv420p")
        assert [p.shape for p in f.planes] == [(48, 64), (24, 32), (24, 32)]
        assert f.is_video

    def test_roundtrip_bytes(self):
        f = Frame.alloc_video(32, 16, "yuv420p")
        rng = np.random.default_rng(0)
        f.planes = [rng.integers(0, 255, p.shape, dtype=np.uint8) for p in f.planes]
        data = frame_to_bytes(f)
        g = bytes_to_frame(data, "yuv420p", 32, 16)
        for a, b in zip(f.planes, g.planes):
            np.testing.assert_array_equal(a, b)

    def test_alloc_audio(self):
        f = Frame.alloc_audio(1024, 48000, "fltp", 2)
        assert len(f.planes) == 2
        assert f.planes[0].shape == (1024,)

    def test_packet(self):
        p = Packet(data=b"abc", pts=100)
        q = p.clone()
        assert q.data == b"abc" and q.pts == 100


class TestCrc:
    def test_adler32(self):
        # adler32 of "Wikipedia" is the canonical test vector
        assert crc.adler32(b"Wikipedia") == 0x11E60398

    def test_crc32_mpeg2(self):
        # CRC-32/MPEG-2 of "123456789" == 0x0376E6E7 (standard check value)
        assert crc.crc32_mpeg2(b"123456789") == 0x0376E6E7


class TestAVDictionary:
    def test_set_get_case(self):
        from libav_tpu.avutil.dict import (AVDictionary, MATCH_CASE,
                                           DONT_OVERWRITE, APPEND,
                                           IGNORE_SUFFIX, MULTIKEY)
        d = AVDictionary()
        d.set("Language", "eng")
        assert d.get_value("language") == "eng"          # case-insensitive
        assert d.get_value("language", flags=MATCH_CASE) is None
        d.set("language", "ger")                          # replaces
        assert len(d) == 1 and d["Language"] == "ger"
        d.set("language", "fra", DONT_OVERWRITE)
        assert d["language"] == "ger"
        d.set("language", "+sub", APPEND)
        assert d["language"] == "ger+sub"
        d.set("lang_alt", "x")
        assert d.get_value("lang", flags=IGNORE_SUFFIX) in ("ger+sub", "x")
        d.set("tag", "a", MULTIKEY)
        d.set("tag", "b", MULTIKEY)
        e = d.get("tag")
        assert e[1] == "a"
        assert d.get("tag", prev=e)[1] == "b"
        d.set("tag", None)                                # delete all
        assert "tag" not in d

    def test_parse_string(self):
        from libav_tpu.avutil.dict import AVDictionary
        d = AVDictionary()
        d.parse_string("a=1:b=2:c")
        assert d.to_dict() == {"a": "1", "b": "2", "c": ""}
