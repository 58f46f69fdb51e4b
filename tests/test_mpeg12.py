"""MPEG-1 codec tests: enc->dec round trip with PSNR floor — the FATE
vcodec enc_dec pattern (SURVEY.md §4 tier 2; reference fate-run.sh:131-155),
plus MC kernel golden tests."""

import numpy as np
import pytest

from libav_tpu.avutil.frame import Frame, Packet
from libav_tpu.codecs.mpeg12 import MPEG1Decoder, MPEG1Encoder
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.avutil.rational import Rational


def vsynth_frame(w, h, t=0, seed=0):
    """Moving-gradient synthetic source (videogen.c spirit)."""
    f = Frame.alloc_video(w, h, "yuv420p")
    yy, xx = np.mgrid[0:h, 0:w]
    f.planes[0] = ((xx * 2 + yy + t * 3) % 256 // 2 + 64).astype(np.uint8)
    ch, cw = f.planes[1].shape
    yy, xx = np.mgrid[0:ch, 0:cw]
    f.planes[1] = (128 + 32 * np.sin((xx + t * 2) / 9.0)).astype(np.uint8)
    f.planes[2] = (128 + 32 * np.cos((yy - t) / 7.0)).astype(np.uint8)
    return f


def psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)


def make_encoder(w, h, qscale=4, gop=12):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="mpeg1video",
                          width=w, height=h, pix_fmt="yuv420p",
                          framerate=Rational(25, 1))
    enc = MPEG1Encoder(par)
    enc.set_opt("qscale", qscale)
    enc.set_opt("gop_size", gop)
    return enc


def roundtrip(frames, qscale=4, gop=12):
    w, h = frames[0].width, frames[0].height
    enc = make_encoder(w, h, qscale, gop)
    pkts = enc.encode_all(frames)
    assert len(pkts) == len(frames)
    dec = MPEG1Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                       codec_id="mpeg1video"))
    out = dec.decode_all([Packet(data=p.data, pts=i)
                          for i, p in enumerate(pkts)])
    assert len(out) == len(frames)
    return [f.to_host() for f in out]


class TestMC:
    def test_mc_hpel_matches_golden(self):
        import jax.numpy as jnp
        from libav_tpu.ops import mc
        rng = np.random.default_rng(0)
        plane = rng.integers(0, 256, (64, 64)).astype(np.uint8)
        padded_np = mc.pad_plane_ref(plane)
        B = 8
        xs = rng.integers(0, 48, B).astype(np.int32)
        ys = rng.integers(0, 48, B).astype(np.int32)
        mvx = rng.integers(-20, 21, B).astype(np.int32)
        mvy = rng.integers(-20, 21, B).astype(np.int32)
        ref = mc.mc_hpel_ref(padded_np, xs, ys, mvx, mvy, 16)
        got = np.asarray(mc.mc_hpel(jnp.asarray(padded_np), jnp.asarray(xs),
                                    jnp.asarray(ys), jnp.asarray(mvx),
                                    jnp.asarray(mvy), 16))
        np.testing.assert_array_equal(ref, got)

    def test_chroma_mv_trunc(self):
        from libav_tpu.ops.mc import chroma_mv_div2, chroma_mv_div2_ref
        mv = np.arange(-9, 10, dtype=np.int32)
        np.testing.assert_array_equal(chroma_mv_div2(mv),
                                      chroma_mv_div2_ref(mv))

    def test_motion_search_finds_shift(self):
        import jax.numpy as jnp
        from libav_tpu.ops import mc, me
        # smooth textured image — gradient-descent search needs a smooth
        # SAD landscape (same assumption as the reference's EPZS/diamond)
        yy, xx = np.mgrid[0:96, 0:96].astype(np.float64)
        ref_img = (128 + 60 * np.sin(xx / 5.0) * np.cos(yy / 7.0) +
                   40 * np.sin((xx + yy) / 11.0)).astype(np.uint8)
        # current frame = reference shifted by (+3, -2)
        cur = ref_img[16 - 2:16 - 2 + 64, 16 + 3:16 + 3 + 64]
        refp = jnp.asarray(mc.pad_plane_ref(ref_img[16:80, 16:80]))
        cur_mbs = (cur.reshape(4, 16, 4, 16).transpose(0, 2, 1, 3)
                   .reshape(16, 16, 16).astype(np.int32))
        mv, sad = me.motion_search(jnp.asarray(cur_mbs), refp, 4, 4)
        mv = np.asarray(mv)
        # interior MBs must find the exact displacement (x=+3, y=-2 full
        # pel = (6, -4) half-pel)
        interior = [5, 6, 9, 10]
        for i in interior:
            assert tuple(mv[i]) == (6, -4), f"mb {i}: {mv[i]}"


class TestRoundTripIntra:
    def test_single_i_frame(self):
        src = vsynth_frame(64, 48)
        out = roundtrip([src], qscale=2)
        p = psnr(src.planes[0], out[0].planes[0])
        assert p > 30, f"luma psnr {p}"

    def test_flat_frame_exact_dc(self):
        f = Frame.alloc_video(32, 32, "yuv420p")
        f.planes[0][:] = 100
        f.planes[1][:] = 128
        f.planes[2][:] = 128
        out = roundtrip([f], qscale=2)
        assert np.abs(out[0].planes[0].astype(int) - 100).max() <= 1

    def test_odd_dimensions(self):
        src = vsynth_frame(60, 36)   # not multiple of 16
        out = roundtrip([src], qscale=2)
        assert out[0].planes[0].shape == (36, 60)
        assert psnr(src.planes[0], out[0].planes[0]) > 30


class TestRoundTripInter:
    def test_ip_sequence(self):
        frames = [vsynth_frame(64, 48, t) for t in range(5)]
        out = roundtrip(frames, qscale=3, gop=12)
        for i, (s, o) in enumerate(zip(frames, out)):
            p = psnr(s.planes[0], o.planes[0])
            assert p > 28, f"frame {i} luma psnr {p}"

    def test_static_scene_p_frames_cheap(self):
        """P frames of a static scene should be mostly skipped (tiny)."""
        frames = [vsynth_frame(64, 48, 0) for _ in range(4)]
        enc = make_encoder(64, 48, qscale=4)
        pkts = enc.encode_all(frames)
        assert len(pkts[1].data) < len(pkts[0].data) // 3

    def test_motion_tracked(self):
        """A translating textured block must decode well through P frames."""
        rng = np.random.default_rng(2)
        blob = (rng.integers(0, 2, (8, 12)) * 200 + 30).astype(np.uint8)
        blob = np.kron(blob, np.ones((4, 4), dtype=np.uint8))  # 32x48
        frames = []
        for t in range(4):
            f = Frame.alloc_video(96, 64, "yuv420p")
            f.planes[0][:] = 80
            f.planes[0][10:42, 10 + 3 * t:58 + 3 * t] = blob
            f.planes[1][:] = 128
            f.planes[2][:] = 128
            frames.append(f)
        out = roundtrip(frames, qscale=3)
        for i, (s, o) in enumerate(zip(frames, out)):
            p = psnr(s.planes[0], o.planes[0])
            assert p > 30, f"frame {i} psnr {p}"

    def test_gop_restart(self):
        frames = [vsynth_frame(48, 32, t) for t in range(6)]
        out = roundtrip(frames, qscale=3, gop=3)  # I P P I P P
        for s, o in zip(frames, out):
            assert psnr(s.planes[0], o.planes[0]) > 28


class TestCLI:
    def test_avconv_m1v(self, tmp_path):
        from libav_tpu.tools import avconv
        from libav_tpu.avutil.imgutils import frame_to_bytes
        from libav_tpu.formats import FormatContext
        # y4m -> m1v -> framecrc
        frames = [vsynth_frame(48, 32, t) for t in range(3)]
        y4m = tmp_path / "in.y4m"
        oc = FormatContext.open_output(str(y4m), "y4m")
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="rawvideo",
                              width=48, height=32, pix_fmt="yuv420p")
        st = oc.new_stream(par, time_base=Rational(1, 25))
        st.avg_frame_rate = Rational(25, 1)
        oc.write_header()
        for i, f in enumerate(frames):
            oc.write_packet(Packet(data=frame_to_bytes(f), pts=i, dts=i,
                                   duration=1, stream_index=0))
        oc.write_trailer()

        m1v = tmp_path / "out.m1v"
        rc = avconv.main(["-i", str(y4m), "-c:v", "mpeg1video",
                          "-q", "3", str(m1v)])
        assert rc == 0
        data = m1v.read_bytes()
        assert data[:4] == b"\x00\x00\x01\xB3"

        crc = tmp_path / "out.crc"
        rc = avconv.main(["-i", str(m1v), "-f", "framecrc", str(crc)])
        assert rc == 0
        assert len([l for l in crc.read_text().strip().splitlines()
                    if not l.startswith("#")]) == 3


class TestMPEG2RoundTrip:
    def _roundtrip(self, frames, qscale=4, gop=12):
        from libav_tpu.codecs.mpeg12.enc import MPEG2Encoder
        from libav_tpu.codecs.mpeg12 import MPEG2Decoder
        w, h = frames[0].width, frames[0].height
        par = CodecParameters(codec_type=MediaType.VIDEO,
                              codec_id="mpeg2video", width=w, height=h,
                              pix_fmt="yuv420p", framerate=Rational(25, 1))
        enc = MPEG2Encoder(par)
        enc.set_opt("qscale", qscale)
        enc.set_opt("gop_size", gop)
        pkts = enc.encode_all(frames)
        dec = MPEG2Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                           codec_id="mpeg2video"))
        out = dec.decode_all([Packet(data=p.data, pts=i)
                              for i, p in enumerate(pkts)])
        assert len(out) == len(frames)
        return pkts, [f.to_host() for f in out]

    def test_mpeg2_marker_present(self):
        src = vsynth_frame(48, 32)
        pkts, _ = self._roundtrip([src], qscale=4)
        # sequence extension must follow the sequence header => MPEG-2
        assert b"\x00\x00\x01\xB5" in pkts[0].data

    def test_mpeg2_i_frame(self):
        src = vsynth_frame(64, 48)
        _, out = self._roundtrip([src], qscale=2)
        p = psnr(src.planes[0], out[0].planes[0])
        assert p > 30, f"luma psnr {p}"

    def test_mpeg2_ip_sequence(self):
        frames = [vsynth_frame(64, 48, t) for t in range(4)]
        _, out = self._roundtrip(frames, qscale=4)
        for i, (s, o) in enumerate(zip(frames, out)):
            p = psnr(s.planes[0], o.planes[0])
            assert p > 27, f"frame {i} psnr {p}"

    def test_decoder_detects_mpeg2(self):
        from libav_tpu.codecs.mpeg12 import MPEG2Decoder
        src = vsynth_frame(48, 32)
        pkts, _ = self._roundtrip([src], qscale=4)
        dec = MPEG2Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                           codec_id="mpeg2video"))
        dec.decode_all([Packet(data=pkts[0].data, pts=0)])
        assert dec.seq.mpeg2 is True


class TestBFrames:
    """IPB GOP round trip (display-order I B B P ..., coded anchor-first;
    reference: mpegvideo_enc.c select_input_picture reordering)."""

    def _roundtrip_b(self, codec_id, nframes=7, b_frames=2, qscale=4):
        from libav_tpu.codecs.api import find_encoder, find_decoder
        frames = [vsynth_frame(64, 48, t) for t in range(nframes)]
        for i, f in enumerate(frames):
            f.pts = i
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id=codec_id,
                              width=64, height=48, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = find_encoder(codec_id)(par)
        enc.set_opt("qscale", qscale)
        enc.set_opt("gop_size", 12)
        enc.set_opt("b_frames", b_frames)
        pkts = enc.encode_all(frames)
        assert len(pkts) == nframes
        # coded order differs from display order
        coded_pts = [p.pts for p in pkts]
        assert coded_pts != sorted(coded_pts)
        # dts monotone and <= pts
        dts = [p.dts for p in pkts]
        assert dts == sorted(dts)
        assert all(d <= p for d, p in zip(dts, coded_pts))
        dec = find_decoder(codec_id)(
            CodecParameters(codec_type=MediaType.VIDEO, codec_id=codec_id))
        out = dec.decode_all([Packet(data=p.data, pts=p.pts, dts=p.dts)
                              for p in pkts])
        assert len(out) == nframes
        # decoder restores display order
        assert [f.pts for f in out] == list(range(nframes))
        for i, (s, o) in enumerate(zip(frames, out)):
            p = psnr(s.planes[0], np.asarray(o.to_host().planes[0]))
            assert p > 28, f"frame {i} ({o.pict_type}) luma psnr {p:.1f}"
        return pkts, out

    def test_mpeg1_ipb(self):
        from libav_tpu.avutil.frame import PictureType
        pkts, out = self._roundtrip_b("mpeg1video")
        assert any(f.pict_type == PictureType.B for f in out)

    def test_mpeg2_ipb(self):
        self._roundtrip_b("mpeg2video")

    def test_b_frames_smaller(self):
        # B frames should generally cost fewer bits than anchors
        pkts, out = self._roundtrip_b("mpeg1video", nframes=7, b_frames=2)
        from libav_tpu.avutil.frame import PictureType
        bpts = [f.pts for f in out if f.pict_type == PictureType.B]
        psizes = {p.pts: len(p.data) for p in pkts}
        assert bpts, "no B frames coded"
        avg_b = sum(psizes[t] for t in bpts) / len(bpts)
        anchors = [t for t in psizes if t not in bpts and t != 0]
        avg_p = sum(psizes[t] for t in anchors) / max(1, len(anchors))
        assert avg_b <= avg_p * 1.5


class TestInterlacedTools:
    """MPEG-2 frame-picture interlace: field MC + field DCT (hand-packed
    streams — our encoder is progressive-only; reference parity:
    mpeg12dec.c MT_FIELD + dct_type)."""

    W, H = 64, 32   # 4x2 MBs

    def _ref_stream(self, qscale=4):
        from libav_tpu.codecs.api import find_encoder
        par = CodecParameters(codec_type=MediaType.VIDEO,
                              codec_id="mpeg2video", width=self.W,
                              height=self.H, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = find_encoder("mpeg2video")(par)
        enc.set_opt("qscale", qscale)
        src = vsynth_frame(self.W, self.H, 0)
        pkt = enc.encode_all([src])[0]
        return pkt.data

    def _pic_ext(self, pb_bits):
        """picture coding extension with frame_pred_frame_dct=0."""
        from libav_tpu.bitstream import PutBits
        pb = PutBits()
        pb.put_bits(4, 8)
        for _ in range(4):
            pb.put_bits(4, 2)        # f_codes (+-7.5 hpel)
        pb.put_bits(2, 0)            # intra_dc_precision
        pb.put_bits(2, 3)            # frame picture
        pb.put_bits(1, 0)            # top_field_first
        pb.put_bits(1, 0)            # frame_pred_frame_dct = 0 !
        pb.put_bits(1, 0)            # concealment
        pb.put_bits(1, 0)            # q_scale_type
        pb.put_bits(1, 0)            # intra_vlc_format
        pb.put_bits(1, 0)            # alternate_scan
        pb.put_bits(1, 0)
        pb.put_bits(1, 1)
        pb.put_bits(1, 0)            # interlaced frame
        pb.put_bits(1, 0)
        return b"\x00\x00\x01\x00" + pb_bits + b"\x00\x00\x01\xB5" + \
            pb.flush()

    def _p_header(self, temporal_ref):
        from libav_tpu.bitstream import PutBits
        pb = PutBits()
        pb.put_bits(10, temporal_ref)
        pb.put_bits(3, 2)            # P
        pb.put_bits(16, 0xFFFF)
        pb.put_bits(1, 0)            # full_pel_forward (mpeg2: must be 0)
        pb.put_bits(3, 7)            # forward_f_code (ignored, ext rules)
        return pb.flush()

    def _mv_zero(self, pb):
        from libav_tpu.codecs.mpeg12 import tables as T
        pb.put_bits(T.MOTION_CODE[1][0], T.MOTION_CODE[0][0])  # code 0

    def test_field_mc_field_swap(self):
        """Every MB field-predicts top from the reference's bottom field
        and vice versa with zero MVs -> decoded frame == field-swapped
        reference."""
        from libav_tpu.bitstream import PutBits
        from libav_tpu.codecs.api import find_decoder
        from libav_tpu.codecs.mpeg12 import tables as T
        data = self._ref_stream()

        pic = self._pic_ext(self._p_header(1))
        body = bytearray(pic)
        mb_w, mb_h = self.W // 16, self.H // 16
        for row in range(mb_h):
            pb = PutBits()
            pb.put_bits(5, 4)                    # qscale code
            pb.put_bits(1, 0)
            for mbx in range(mb_w):
                pb.put_bits(T.MB_ADDR_INC[1][0], T.MB_ADDR_INC[0][0])
                pb.put_bits(3, 0b001)            # P mb_type: MB_FOR
                pb.put_bits(2, 1)                # frame_motion_type: field
                for v, sel in ((0, 1), (1, 0)):  # top<-bottom, bottom<-top
                    pb.put_bits(1, sel)
                    self._mv_zero(pb)            # x
                    self._mv_zero(pb)            # y
            pb.align(pad_bit=0)
            body += b"\x00\x00\x01" + bytes([1 + row]) + pb.flush()

        dec = find_decoder("mpeg2video")(
            CodecParameters(codec_type=MediaType.VIDEO,
                            codec_id="mpeg2video"))
        out = dec.decode_all([Packet(data=data, pts=0),
                              Packet(data=bytes(body), pts=1)])
        assert len(out) == 2
        ref = out[0].to_host()
        got = out[1].to_host()
        ry = np.asarray(ref.planes[0])
        gy = np.asarray(got.planes[0])
        np.testing.assert_array_equal(gy[0::2], ry[1::2])
        np.testing.assert_array_equal(gy[1::2], ry[0::2])
        ru = np.asarray(ref.planes[1])
        gu = np.asarray(got.planes[1])
        np.testing.assert_array_equal(gu[0::2], ru[1::2])
        np.testing.assert_array_equal(gu[1::2], ru[0::2])

    def _intra_p_stream(self, dct_type):
        """P picture whose first MB is intra with distinct DC per luma
        block; remaining MBs are zero-MV frame-MC."""
        from libav_tpu.bitstream import PutBits
        from libav_tpu.codecs.mpeg12 import tables as T
        pic = self._pic_ext(self._p_header(1))
        body = bytearray(pic)
        mb_w, mb_h = self.W // 16, self.H // 16

        def put_dc(pb, diff, lum):
            size = abs(diff).bit_length()
            codes, bits = T.DC_LUM if lum else T.DC_CHROMA
            pb.put_bits(bits[size], codes[size])
            if size:
                v = diff if diff > 0 else diff + (1 << size) - 1
                pb.put_bits(size, v)

        for row in range(mb_h):
            pb = PutBits()
            pb.put_bits(5, 4)
            pb.put_bits(1, 0)
            for mbx in range(mb_w):
                pb.put_bits(T.MB_ADDR_INC[1][0], T.MB_ADDR_INC[0][0])
                if row == 0 and mbx == 0:
                    pb.put_bits(5, 0b00011)      # P INTRA
                    pb.put_bits(1, dct_type)     # dct_type
                    # luma DCs: +16, +0, -16, +0 diffs; chroma 0
                    for d, lum in ((16, 1), (0, 1), (-16, 1), (0, 1),
                                   (0, 0), (0, 0)):
                        put_dc(pb, d, lum)
                        pb.put_bits(2, 0x2)      # EOB
                else:
                    pb.put_bits(3, 0b001)        # MB_FOR
                    pb.put_bits(2, 2)            # frame_motion_type: frame
                    self._mv_zero(pb)
                    self._mv_zero(pb)
            pb.align(pad_bit=0)
            body += b"\x00\x00\x01" + bytes([1 + row]) + pb.flush()
        return bytes(body)

    def test_field_dct_interleave(self):
        """dct_type=1 output rows are the de-interleaved dct_type=0 rows
        (same coefficients, field vs frame organization)."""
        from libav_tpu.codecs.api import find_decoder
        data = self._ref_stream()
        outs = []
        for dt in (0, 1):
            dec = find_decoder("mpeg2video")(
                CodecParameters(codec_type=MediaType.VIDEO,
                                codec_id="mpeg2video"))
            o = dec.decode_all([Packet(data=data, pts=0),
                                Packet(data=self._intra_p_stream(dt),
                                       pts=1)])
            outs.append(np.asarray(o[1].to_host().planes[0]))
        frame_org, field_org = outs
        blk = frame_org[:16, :16]
        fld = field_org[:16, :16]
        np.testing.assert_array_equal(fld[0::2], blk[:8])
        np.testing.assert_array_equal(fld[1::2], blk[8:])
        # and the rest of the frame (inter MBs) is identical
        np.testing.assert_array_equal(frame_org[:, 16:], field_org[:, 16:])


class TestAdaptiveQuant:
    """Per-MB qscale via the QUANT macroblock_type variants (tables
    B.2a/B.2b; reference ratecontrol.c:703 masking models)."""

    def _roundtrip(self, codec_id, frames, **opts):
        from libav_tpu.codecs.mpeg12.enc import MPEG1Encoder, MPEG2Encoder
        from libav_tpu.codecs.mpeg12 import MPEG1Decoder, MPEG2Decoder
        w, h = frames[0].width, frames[0].height
        par = CodecParameters(codec_type=MediaType.VIDEO,
                              codec_id=codec_id, width=w, height=h,
                              pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc_cls = MPEG2Encoder if codec_id == "mpeg2video" \
            else MPEG1Encoder
        enc = enc_cls(par)
        enc.set_opt("qscale", 6)
        enc.set_opt("gop_size", 4)
        for k, v in opts.items():
            enc.set_opt(k, v)
        pkts = enc.encode_all(frames)
        dec = MPEG1Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                           codec_id=codec_id))
        out = dec.decode_all([Packet(data=p.data, pts=i)
                              for i, p in enumerate(pkts)])
        return enc, [f.to_host() for f in out]

    def test_mpeg1_lumi_masking(self):
        frames = [vsynth_frame(96, 64, t) for t in range(4)]
        enc, out = self._roundtrip("mpeg1video", frames,
                                   lumi_masking=0.5, dark_masking=0.3)
        qs = enc._frame_qscale(enc._padded_input(frames[0])[0], 6, True)
        assert len(set(qs.tolist())) > 1, "masking produced a flat field"
        for i, (s, o) in enumerate(zip(frames, out)):
            assert psnr(s.planes[0], o.planes[0]) > 25, f"frame {i}"

    def test_mpeg2_scplx_masking_even_q(self):
        frames = [vsynth_frame(96, 64, t) for t in range(3)]
        enc, out = self._roundtrip("mpeg2video", frames,
                                   scplx_masking=0.4, p_masking=0.2)
        qs = enc._frame_qscale(enc._padded_input(frames[0])[0], 6, True)
        assert (qs % 2 == 0).all(), "mpeg2 linear q must stay even"
        for i, (s, o) in enumerate(zip(frames, out)):
            assert psnr(s.planes[0], o.planes[0]) > 25, f"frame {i}"
