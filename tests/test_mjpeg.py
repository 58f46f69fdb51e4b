"""MJPEG codec tests: round-trip through our encoder+decoder, PIL
cross-validation (stands in for FATE conformance, which requires sample
files not present in this environment), native-vs-Python entropy coder
equivalence."""

import io
import os

import numpy as np
import pytest

from libav_tpu.avutil.frame import Frame, Packet
from libav_tpu.codecs.mjpeg import MJPEGDecoder, MJPEGEncoder


def synth_frame(w, h, fmt="yuvj420p", seed=0):
    """Smooth synthetic frame (vsynth-style gradients, reference:
    tests/videogen.c) — smooth content so quantization error stays small."""
    f = Frame.alloc_video(w, h, fmt)
    yy, xx = np.mgrid[0:h, 0:w]
    f.planes[0] = ((xx * 255 / max(w - 1, 1) + yy * 64 / max(h - 1, 1)) / 1.25
                   ).astype(np.uint8)
    if fmt != "gray":
        ch, cw = f.planes[1].shape
        yy, xx = np.mgrid[0:ch, 0:cw]
        f.planes[1] = (128 + 64 * np.sin(xx / 17.0) * np.cos(yy / 11.0)).astype(np.uint8)
        f.planes[2] = (128 + 64 * np.cos(xx / 13.0)).astype(np.uint8)
    return f


def encode(frame, quality=90):
    enc = MJPEGEncoder()
    enc.set_opt("quality", quality)
    pkts = enc.encode_all([frame])
    assert len(pkts) == 1
    return pkts[0].data


def decode(data):
    dec = MJPEGDecoder()
    frames = dec.decode_all([Packet(data=data)])
    assert len(frames) == 1
    return frames[0].to_host()


class TestRoundTrip:
    @pytest.mark.parametrize("w,h", [(64, 48), (176, 144), (65, 49)])
    def test_420(self, w, h):
        src = synth_frame(w, h, "yuvj420p")
        out = decode(encode(src, quality=95))
        assert out.format == "yuvj420p"
        assert out.width == w and out.height == h
        for sp, op in zip(src.planes, out.planes):
            assert op.shape == sp.shape
            err = np.abs(sp.astype(int) - op.astype(int))
            assert err.mean() < 3.0, f"mean err {err.mean()}"

    def test_gray(self):
        src = synth_frame(80, 64, "gray")
        out = decode(encode(src, quality=95))
        assert out.format == "gray"
        err = np.abs(src.planes[0].astype(int) - out.planes[0].astype(int))
        assert err.mean() < 2.5

    def test_444(self):
        src = synth_frame(48, 32, "yuvj444p")
        out = decode(encode(src, quality=95))
        assert out.format == "yuvj444p"
        for sp, op in zip(src.planes, out.planes):
            err = np.abs(sp.astype(int) - op.astype(int))
            assert err.mean() < 3.0

    def test_deterministic(self):
        src = synth_frame(64, 48)
        assert encode(src) == encode(src)


class TestPILCross:
    """Cross-validation against an independent JPEG implementation."""

    def test_pil_decodes_our_jpeg(self):
        PIL = pytest.importorskip("PIL.Image")
        src = synth_frame(64, 48, "yuvj444p")
        data = encode(src, quality=95)
        img = PIL.open(io.BytesIO(data))
        img.draft("YCbCr", img.size)
        arr = np.asarray(img.convert("YCbCr"))
        for i in range(3):
            err = np.abs(arr[:, :, i].astype(int) - src.planes[i].astype(int))
            assert err.mean() < 4.0, f"plane {i} mean err {err.mean()}"

    def test_we_decode_pil_jpeg(self):
        PIL = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(7)
        h, w = 48, 64
        # smooth random field
        base = rng.integers(0, 255, (h // 8, w // 8, 3)).astype(np.float32)
        up = np.kron(base, np.ones((8, 8, 1), dtype=np.float32)).astype(np.uint8)
        img = PIL.fromarray(up, "RGB")
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=95)
        data = buf.getvalue()

        out = decode(data)
        ours = out.planes
        ref = np.asarray(PIL.open(io.BytesIO(data)).convert("YCbCr"))
        # compare luma full-res; chroma is subsampled in ours
        err = np.abs(ours[0].astype(int) - ref[:, :, 0].astype(int))
        assert err.mean() < 2.0, f"luma mean err vs PIL {err.mean()}"

    def test_restart_markers(self):
        PIL = pytest.importorskip("PIL.Image")
        src = synth_frame(128, 96, "yuvj420p")
        # make an RGB of it roughly and let PIL emit restart markers
        rgb = np.stack([src.planes[0]] * 3, axis=-1)
        img = PIL.fromarray(rgb, "RGB")
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=90, restart_marker_blocks=4)
        out = decode(buf.getvalue())
        ref = np.asarray(PIL.open(buf).convert("YCbCr"))
        err = np.abs(out.planes[0].astype(int) - ref[:, :, 0].astype(int))
        assert err.mean() < 2.0


class TestNativeEquivalence:
    def test_scan_decode_native_matches_python(self):
        from libav_tpu.native.build import get_lib
        if get_lib() is None:
            pytest.skip("native library unavailable")
        src = synth_frame(96, 80, "yuvj420p")
        data = encode(src, quality=85)

        dec_native = MJPEGDecoder()
        f_native = dec_native.decode_all([Packet(data=data)])[0].to_host()

        os.environ["LIBAV_TPU_NO_NATIVE"] = "1"
        try:
            import libav_tpu.native.build as b
            saved = (b._lib, b._tried)
            b._lib, b._tried = None, False
            dec_py = MJPEGDecoder()
            f_py = dec_py.decode_all([Packet(data=data)])[0].to_host()
            b._lib, b._tried = saved
        finally:
            del os.environ["LIBAV_TPU_NO_NATIVE"]

        for a, c in zip(f_native.planes, f_py.planes):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def test_scan_encode_native_matches_python(self):
        from libav_tpu.native.build import get_lib
        if get_lib() is None:
            pytest.skip("native library unavailable")
        src = synth_frame(96, 80, "yuvj420p")
        enc = MJPEGEncoder()
        enc.open()
        data_native = enc.encode_all([src])[0].data

        import libav_tpu.native.build as b
        saved = (b._lib, b._tried)
        os.environ["LIBAV_TPU_NO_NATIVE"] = "1"
        b._lib, b._tried = None, False
        try:
            enc2 = MJPEGEncoder()
            data_py = enc2.encode_all([src])[0].data
        finally:
            b._lib, b._tried = saved
            del os.environ["LIBAV_TPU_NO_NATIVE"]
        assert data_native == data_py


class TestBatchDecode:
    def test_batch_matches_single(self):
        datas = [encode(synth_frame(64, 48, "yuvj420p"), 90) for _ in range(3)]
        dec = MJPEGDecoder()
        dec.open()
        singles = [dec.decode_jpeg(d).to_host() for d in datas]
        batch = dec.decode_jpeg_batch(datas)
        assert len(batch) == 3
        for s, b in zip(singles, batch):
            for sp, bp in zip(s.planes, b.planes):
                np.testing.assert_array_equal(np.asarray(sp), np.asarray(bp))


class TestProgressive:
    """Progressive (SOF2) decode cross-validated against PIL (reference:
    mjpegdec.c decode_block_progressive/refinement)."""

    def _pil_prog_bytes(self, arr):
        import io
        PIL = pytest.importorskip("PIL.Image")
        buf = io.BytesIO()
        PIL.fromarray(arr, "RGB").save(buf, "JPEG", quality=88,
                                       progressive=True)
        return buf.getvalue()

    def test_progressive_vs_pil(self):
        import io
        PIL = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(1)
        yy, xx = np.mgrid[0:80, 0:96]
        arr = np.stack([
            (xx * 2 + yy).astype(np.uint8),
            (128 + 50 * np.sin(xx / 7.0)).astype(np.uint8),
            (rng.integers(0, 255, (80, 96))).astype(np.uint8)], axis=2)
        data = self._pil_prog_bytes(arr)
        assert b"\xff\xc2" in data          # really progressive

        from libav_tpu.codecs.mjpeg import MJPEGDecoder
        from libav_tpu.codecs.api import CodecParameters, MediaType
        dec = MJPEGDecoder(CodecParameters(codec_type=MediaType.VIDEO,
                                           codec_id="mjpeg"))
        dec.open()
        f = dec.decode_jpeg(data).to_host()

        ref = np.asarray(PIL.open(io.BytesIO(data)).convert("YCbCr"))
        got_y = np.asarray(f.planes[0]).astype(int)
        err = np.abs(got_y - ref[:, :, 0].astype(int))
        assert err.mean() < 2.0, f"luma mean err vs PIL {err.mean()}"
        assert err.max() <= 12, f"luma max err vs PIL {err.max()}"

    def test_progressive_gray(self):
        import io
        PIL = pytest.importorskip("PIL.Image")
        yy, xx = np.mgrid[0:64, 0:72]
        g = ((xx + yy) % 256).astype(np.uint8)
        buf = io.BytesIO()
        PIL.fromarray(g, "L").save(buf, "JPEG", quality=90,
                                   progressive=True)
        data = buf.getvalue()
        from libav_tpu.codecs.mjpeg import MJPEGDecoder
        from libav_tpu.codecs.api import CodecParameters, MediaType
        dec = MJPEGDecoder(CodecParameters(codec_type=MediaType.VIDEO,
                                           codec_id="mjpeg"))
        dec.open()
        f = dec.decode_jpeg(data).to_host()
        ref = np.asarray(PIL.open(io.BytesIO(data)).convert("L"))
        err = np.abs(np.asarray(f.planes[0]).astype(int) - ref.astype(int))
        assert err.mean() < 2.0 and err.max() <= 10, \
            f"gray err mean {err.mean():.2f} max {err.max()}"
