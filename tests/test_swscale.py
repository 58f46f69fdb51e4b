"""swscale tests (mirrors reference libswscale/tests/swscale.c self-test:
scale known patterns, check round-trip and interpolation quality)."""

import numpy as np
import pytest

from libav_tpu.avutil.frame import Frame
from libav_tpu.swscale import (BICUBIC, BILINEAR, POINT, SwsContext,
                               build_filter, _scale_axis_np)


def gradient_frame(w, h, fmt="yuv420p"):
    f = Frame.alloc_video(w, h, fmt)
    yy, xx = np.mgrid[0:h, 0:w]
    f.planes[0] = (xx * 255 / max(w - 1, 1)).astype(np.uint8)
    if fmt != "gray":
        for i in (1, 2):
            ch, cw = f.planes[i].shape
            yy, xx = np.mgrid[0:ch, 0:cw]
            f.planes[i] = (128 + (xx - cw / 2) * 0.5).astype(np.uint8)
    return f


class TestFilter:
    def test_weights_normalized(self):
        for flags in (POINT, BILINEAR, BICUBIC):
            pos, w = build_filter(100, 37, flags)
            np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)

    def test_identity(self):
        pos, w = build_filter(64, 64, BILINEAR)
        # 1:1 scale: each output should take exactly its own pixel
        x = np.arange(64, dtype=np.float64)[:, None]
        out = _scale_axis_np(x, pos, w, axis=0)
        np.testing.assert_allclose(out[:, 0], x[:, 0], atol=1e-9)


class TestScale:
    def test_downscale_gradient_is_gradient(self):
        src = gradient_frame(128, 96)
        sws = SwsContext.get(128, 96, "yuv420p", 64, 48, "yuv420p")
        out = sws.scale_frame(src)
        assert out.planes[0].shape == (48, 64)
        # a horizontal gradient stays monotonic after scaling
        row = out.planes[0][24].astype(int)
        assert (np.diff(row) >= -1).all()
        assert row[-1] - row[0] > 200

    def test_upscale(self):
        src = gradient_frame(32, 24)
        sws = SwsContext.get(32, 24, "yuv420p", 96, 72, "yuv420p")
        out = sws.scale_frame(src)
        assert out.planes[0].shape == (72, 96)
        assert out.planes[1].shape == (36, 48)

    def test_point_flag_exact_2x(self):
        src = gradient_frame(16, 16, "gray")
        sws = SwsContext.get(16, 16, "gray", 32, 32, "gray", flags=POINT)
        out = sws.scale_frame(src)
        np.testing.assert_array_equal(out.planes[0][::2, ::2], src.planes[0])

    def test_fmt_420_to_444(self):
        src = gradient_frame(64, 48, "yuv420p")
        sws = SwsContext.get(64, 48, "yuv420p", 64, 48, "yuv444p")
        out = sws.scale_frame(src)
        assert out.format == "yuv444p"
        assert out.planes[1].shape == (48, 64)


class TestColor:
    def test_yuv_rgb_roundtrip(self):
        src = gradient_frame(64, 48, "yuv444p")
        sws = SwsContext.get(64, 48, "yuv444p", 64, 48, "rgb24")
        rgb = sws.scale_frame(src)
        assert rgb.format == "rgb24"
        assert rgb.planes[0].shape == (48, 64 * 3)
        back = SwsContext.get(64, 48, "rgb24", 64, 48, "yuv444p").scale_frame(rgb)
        for i in range(3):
            err = np.abs(back.planes[i].astype(int) - src.planes[i].astype(int))
            # tv-range quantization round trip stays within a few codes
            assert err.mean() < 3.0, f"plane {i}: {err.mean()}"

    def test_gray_rgb_values(self):
        # mid-gray yuv -> rgb should be near-equal r=g=b
        f = Frame.alloc_video(16, 16, "yuv444p")
        f.planes[0][:] = 128
        f.planes[1][:] = 128
        f.planes[2][:] = 128
        sws = SwsContext.get(16, 16, "yuv444p", 16, 16, "rgb24")
        rgb = sws.scale_frame(f).planes[0].reshape(16, 16, 3)
        assert np.all(np.abs(rgb.astype(int) - rgb[:, :, :1].astype(int)) <= 1)

    def test_fullrange_jpeg_matrix(self):
        f = Frame.alloc_video(8, 8, "yuvj444p")
        f.planes[0][:] = 255
        f.planes[1][:] = 128
        f.planes[2][:] = 128
        f.color_range = "pc"
        rgb = SwsContext.get(8, 8, "yuvj444p", 8, 8, "rgb24").scale_frame(f)
        assert rgb.planes[0].max() == 255
        f.planes[0][:] = 0
        rgb = SwsContext.get(8, 8, "yuvj444p", 8, 8, "rgb24").scale_frame(f)
        assert rgb.planes[0].min() == 0


class TestPackingRoundtrips:
    """Pack/unpack layer (swscale/packing.py): pure rearrangements and
    depth expansions are lossless round trips."""

    def test_roundtrips(self):
        import numpy as np
        from libav_tpu.avutil.frame import Frame
        from libav_tpu.swscale import SwsContext
        w, h = 64, 48
        rng = np.random.default_rng(0)

        def mk(fmt, planes):
            f = Frame(width=w, height=h, format=fmt)
            f.planes = planes
            return f

        f420 = mk("yuv420p", [
            rng.integers(0, 256, (h, w)).astype(np.uint8),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
            rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)])
        f422 = mk("yuv422p", [
            rng.integers(0, 256, (h, w)).astype(np.uint8),
            rng.integers(0, 256, (h, w // 2)).astype(np.uint8),
            rng.integers(0, 256, (h, w // 2)).astype(np.uint8)])
        frgb = mk("rgb24",
                  [rng.integers(0, 256, (h, w * 3)).astype(np.uint8)])

        cases = [(f420, ["nv12", "nv21", "yuv420p10le", "yuv420p12be",
                         "yuv420p16le", "yuva420p"]),
                 (f422, ["yuyv422", "uyvy422", "nv16"]),
                 (frgb, ["gbrp", "gbrp10le", "bgr0", "0rgb", "rgba",
                         "abgr", "rgb48le", "rgba64le"])]
        for src, fmts in cases:
            cf = src.format
            for fmt in fmts:
                g = SwsContext.get(w, h, cf, w, h, fmt).scale_frame(src)
                assert g.format == fmt
                b = SwsContext.get(w, h, fmt, w, h, cf).scale_frame(g)
                for x, y in zip(src.planes, b.planes):
                    np.testing.assert_array_equal(
                        np.asarray(x), np.asarray(y), err_msg=fmt)

    def test_pixfmt_count(self):
        from libav_tpu.avutil.pixfmt import _DESCRIPTORS
        assert len(set(d.name for d in _DESCRIPTORS.values())) >= 100
