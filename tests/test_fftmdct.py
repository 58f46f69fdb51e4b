"""MDCT/FFT tests (mirrors reference libavcodec/tests/fft.c): TDAC perfect
reconstruction, golden vs jitted equivalence."""

import numpy as np
import pytest

from libav_tpu.ops import fftmdct as F


class TestMDCT:
    @pytest.mark.parametrize("N", [128, 256, 1024])
    def test_jit_matches_golden(self, N):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((4, 2 * N)).astype(np.float32)
        ref = F.mdct_ref(x.astype(np.float64))
        got = np.asarray(F.mdct(x))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3)

    @pytest.mark.parametrize("N", [256, 1024])
    def test_tdac_perfect_reconstruction(self, N):
        """window -> MDCT -> IMDCT -> window -> overlap-add == input
        (the property AAC/AC-3 rely on)."""
        rng = np.random.default_rng(1)
        nblocks = 6
        x = rng.standard_normal((nblocks + 1) * N)
        w = F.sine_window(2 * N)
        frames = np.stack([x[i * N:(i + 2) * N] * w for i in range(nblocks)])
        spec = F.mdct_ref(frames)
        rec = F.imdct_ref(spec) * w
        out = F.overlap_add_ref(rec, N)
        # interior region (first/last half-window lack their partner)
        core = slice(N, nblocks * N)
        np.testing.assert_allclose(out[core], x[core], atol=1e-10)

    @pytest.mark.parametrize("N", [256])
    def test_tdac_kbd_window(self, N):
        rng = np.random.default_rng(2)
        nblocks = 4
        x = rng.standard_normal((nblocks + 1) * N)
        w = F.kbd_window(2 * N, alpha=4.0)
        # Princen-Bradley condition for any valid TDAC window
        pb = w[:N] ** 2 + w[N:] ** 2
        np.testing.assert_allclose(pb, 1.0, atol=1e-12)
        frames = np.stack([x[i * N:(i + 2) * N] * w for i in range(nblocks)])
        rec = F.imdct_ref(F.mdct_ref(frames)) * w
        out = F.overlap_add_ref(rec, N)
        core = slice(N, nblocks * N)
        np.testing.assert_allclose(out[core], x[core], atol=1e-10)

    def test_sine_window_princen_bradley(self):
        for L in (128, 2048):
            w = F.sine_window(L)
            pb = w[:L // 2] ** 2 + w[L // 2:] ** 2
            np.testing.assert_allclose(pb, 1.0, atol=1e-12)
            # symmetry
            np.testing.assert_allclose(w, w[::-1], atol=1e-12)


class TestFFT:
    def test_fft_matches_numpy(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((3, 512)) + 1j * rng.standard_normal((3, 512))
        got = np.asarray(F.fft(x.astype(np.complex64)))
        ref = F.fft_ref(x)
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
