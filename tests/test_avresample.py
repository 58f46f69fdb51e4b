"""Audio resampler tests (mirrors reference libavresample/tests/):
streaming polyphase core across internal formats, spectral fidelity of
a sine through 48k->44.1k, mix matrix behavior."""

import numpy as np
import pytest

from libav_tpu.avresample import AudioResampler
from libav_tpu.avresample.refexact import (StreamingResampler,
                                           _build_filter_bank)
from libav_tpu.avutil.frame import Frame
from libav_tpu.avutil.samplefmt import LAYOUT_MONO, LAYOUT_STEREO


def sine_frame(freq, rate, n, channels=1, fmt="fltp"):
    t = np.arange(n) / rate
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    f = Frame(nb_samples=n, sample_rate=rate, format=fmt, channels=channels,
              channel_layout=LAYOUT_MONO if channels == 1 else LAYOUT_STEREO)
    f.planes = [x.copy() for _ in range(channels)]
    return f


def convert_all(r, f):
    """convert + drain, concatenated planes (ch, n)."""
    out = r.convert(f)
    chunks = [np.stack([np.asarray(p) for p in out.planes])]
    tail = r.flush_resampler()
    if tail is not None:
        chunks.append(np.stack([np.asarray(p) for p in tail.planes]))
    return np.concatenate(chunks, axis=1)


class TestFilterBank:
    def test_unity_dc_gain(self):
        bank, taps = _build_filter_bank(48000, 48000, "dbl")
        np.testing.assert_allclose(bank.sum(axis=1), 1.0, atol=1e-12)

    def test_phase_zero_center(self):
        bank, taps = _build_filter_bank(44100, 48000, "dbl")
        assert np.argmax(np.abs(bank[0])) == (taps - 1) // 2


class TestResample:
    def test_flt_tracks_dbl_core(self):
        """The float32 streaming core agrees with the float64 core to
        single precision (same bank/walk, only the FELEM differs —
        resample_template.c flt vs dbl instantiations)."""
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 4800)) * 0.5
        rf = StreamingResampler(2, 48000, 44100, felem="flt")
        rd = StreamingResampler(2, 48000, 44100, felem="dbl")
        yf = np.concatenate([rf.feed(x.astype(np.float32)), rf.flush()], 1)
        yd = np.concatenate([rd.feed(x), rd.flush()], 1)
        assert yf.shape == yd.shape and yf.shape[1] > 4000
        assert np.abs(yf - yd).max() < 1e-5

    def test_streaming_chunks_equal_oneshot(self):
        """Chunked feeding produces the identical sample stream."""
        rng = np.random.default_rng(1)
        x = (rng.standard_normal((1, 4000)) * 0.4).astype(np.float32)
        a = StreamingResampler(1, 48000, 32000, felem="flt")
        ya = np.concatenate([a.feed(x), a.flush()], 1)
        b = StreamingResampler(1, 48000, 32000, felem="flt")
        parts = [b.feed(x[:, i:i + 377]) for i in range(0, 4000, 377)]
        yb = np.concatenate(parts + [b.flush()], 1)
        np.testing.assert_array_equal(ya, yb)

    def test_sine_fidelity_downsample(self):
        """1 kHz sine through 48k->44.1k must come out a 1 kHz sine."""
        n = 4800
        f = sine_frame(1000, 48000, n)
        r = AudioResampler(in_sample_rate=48000, out_sample_rate=44100,
                           in_sample_fmt="fltp", out_sample_fmt="fltp")
        y = convert_all(r, f)[0].astype(np.float64)
        # streaming delay: total output within one filter length of ideal
        assert abs(y.size - n * 44100 / 48000) <= 24
        t = np.arange(y.size) / 44100
        expect = np.sin(2 * np.pi * 1000 * t)
        core = slice(64, -64)
        err = y[core] - expect[core]
        assert np.sqrt((err ** 2).mean()) < 0.01, "rms error too high"

    def test_sine_fidelity_upsample(self):
        n = 4410
        f = sine_frame(1000, 44100, n)
        r = AudioResampler(in_sample_rate=44100, out_sample_rate=48000,
                           in_sample_fmt="fltp", out_sample_fmt="fltp")
        y = convert_all(r, f)[0].astype(np.float64)
        t = np.arange(y.size) / 48000
        expect = np.sin(2 * np.pi * 1000 * t)
        core = slice(64, -64)
        err = y[core] - expect[core]
        assert np.sqrt((err ** 2).mean()) < 0.01

    def test_format_conversion_s16(self):
        f = sine_frame(440, 8000, 800)
        r = AudioResampler(in_sample_rate=8000, out_sample_rate=8000,
                           in_sample_fmt="fltp", out_sample_fmt="s16")
        out = r.convert(f)
        assert out.format == "s16"
        y = np.asarray(out.planes[0])
        assert y.dtype == np.int16
        assert 30000 < y.max() <= 32767

    def test_stereo_to_mono(self):
        f = sine_frame(440, 8000, 800, channels=2)
        f.planes[1] = -f.planes[0]  # L = -R cancels to silence
        r = AudioResampler(in_sample_rate=8000, out_sample_rate=8000,
                           in_channel_layout=LAYOUT_STEREO,
                           out_channel_layout=LAYOUT_MONO,
                           in_sample_fmt="fltp", out_sample_fmt="fltp")
        out = r.convert(f)
        assert out.channels == 1
        assert np.abs(np.asarray(out.planes[0])).max() < 1e-6

    def test_mono_to_stereo(self):
        f = sine_frame(440, 8000, 400)
        r = AudioResampler(in_sample_rate=8000, out_sample_rate=8000,
                           in_channel_layout=LAYOUT_MONO,
                           out_channel_layout=LAYOUT_STEREO,
                           in_sample_fmt="fltp", out_sample_fmt="fltp")
        out = r.convert(f)
        assert out.channels == 2
        np.testing.assert_allclose(out.planes[0], out.planes[1])


class TestMixMatrix:
    """Full coefficient builder vs golden matrices produced by the BUILT
    reference's avresample_build_matrix (audio_mix_matrix.c:87) — values
    captured from .refbuild objects with default mix levels."""

    L51B = 0x3F      # FL FR FC LFE BL BR (5POINT1_BACK)
    L51 = 0x60F      # FL FR FC LFE SL SR (AV_CH_LAYOUT_5POINT1)
    L71 = 0x63F

    def test_51_to_stereo(self):
        from libav_tpu.avresample.mixmatrix import build_matrix
        m = build_matrix(self.L51B, LAYOUT_STEREO)
        exp = [[0.4142135624, 0, 0.2928932188, 0, 0.2928932188, 0],
               [0, 0.4142135624, 0.2928932188, 0, 0, 0.2928932188]]
        np.testing.assert_allclose(m, exp, atol=1e-9)

    def test_51_to_stereo_dplii_lfe(self):
        from libav_tpu.avresample.mixmatrix import build_matrix, ENC_DPLII
        m = build_matrix(self.L51B, LAYOUT_STEREO, lfe_mix_level=0.5,
                         matrix_encoding=ENC_DPLII)
        exp = [[0.2918271834, 0, 0.2063529803, 0.1031764902,
                -0.2527297544, -0.1459135917],
               [0, 0.2918271834, 0.2063529803, 0.1031764902,
                0.1459135917, 0.2527297544]]
        np.testing.assert_allclose(m, exp, atol=1e-9)

    def test_71_to_51_side(self):
        from libav_tpu.avresample.mixmatrix import build_matrix
        m = build_matrix(self.L71, self.L51)
        exp = np.zeros((6, 8))
        d, o = 0.5857864376, 0.4142135624
        for i in range(4):
            exp[i][i] = d
        exp[4][4], exp[4][6] = o, d
        exp[5][5], exp[5][7] = o, d
        np.testing.assert_allclose(m, exp, atol=1e-9)

    def test_51_to_mono(self):
        from libav_tpu.avresample.mixmatrix import build_matrix
        m = build_matrix(self.L51B, LAYOUT_MONO)
        exp = [[0.2071067812, 0.2071067812, 0.2928932188, 0,
                0.1464466094, 0.1464466094]]
        np.testing.assert_allclose(m, exp, atol=1e-9)

    def test_51_downmix_through_resampler(self):
        f = sine_frame(440, 8000, 400, channels=1)
        x = np.asarray(f.planes[0])
        f.channels = 6
        f.channel_layout = self.L51B
        f.planes = [x * 0, x * 0, x.copy(), x * 0, x * 0, x * 0]  # FC only
        r = AudioResampler(in_sample_rate=8000, out_sample_rate=8000,
                           in_channel_layout=self.L51B,
                           out_channel_layout=LAYOUT_STEREO,
                           in_sample_fmt="fltp", out_sample_fmt="fltp")
        out = r.convert(f)
        assert out.channels == 2
        np.testing.assert_allclose(np.asarray(out.planes[0]),
                                   x * 0.2928932188, atol=1e-6)


class TestDither:
    def test_lfg_exact(self):
        """av_lfg bit-parity (golden values from the built reference's
        lfg.o/md5.o: seeds 0xC0FFEE and 12345)."""
        from libav_tpu.avresample.dither import LFG
        g = LFG(0xC0FFEE)
        assert [g.get() for _ in range(8)] == [1686963069, 261825884, 1423273809, 2253072374, 782051914, 3763861190, 3395184246, 775382381]
        h = LFG(12345)
        assert [h.get() for _ in range(4)] == [1094691679, 1921044346, 3067413608, 590768453]

    def test_dither_determinism_and_noise_floor(self):
        """Dithered s16 quantization: deterministic, unbiased, and the
        added noise stays within +-1.5 LSB of the undithered rounding
        (rect/tri/hp); silence stays silent on average."""
        from libav_tpu.avresample.dither import Ditherer, S16_SCALE
        rng = np.random.default_rng(7)
        x = (rng.standard_normal((2, 4096)) * 0.2).astype(np.float32)
        for method in ("rectangular", "triangular", "triangular_hp",
                       "triangular_ns"):
            d1 = Ditherer(2, method, 48000)
            d2 = Ditherer(2, method, 48000)
            y1 = d1.quantize(x.copy())
            y2 = d2.quantize(x.copy())
            np.testing.assert_array_equal(y1, y2)
            plain = np.clip(np.rint(x * float(S16_SCALE)), -32768, 32767)
            err = y1 - plain
            # noise bounds: rect +-(0.5+0.5), tri +-(1+0.5), hp
            # +-(4*sqrt(1/6)+0.5) ~= 2.13, ns feedback loop a few LSB
            lim = {"rectangular": 1.1, "triangular": 1.6,
                   "triangular_hp": 2.3, "triangular_ns": 16.0}[method]
            assert np.abs(err).max() <= lim, method
            assert abs(err.mean()) < 0.1, method

    def test_dither_through_resampler(self):
        f = sine_frame(440, 48000, 4800)
        r = AudioResampler(in_sample_rate=48000, out_sample_rate=48000,
                           in_sample_fmt="fltp", out_sample_fmt="s16",
                           dither_method="triangular_hp")
        out = r.convert(f)
        y = np.asarray(out.planes[0])
        assert y.dtype == np.int16
        # dithered scale is S16_SCALE = 32753 (reference dither.c:82)
        assert 32600 < y.max() <= 32767
