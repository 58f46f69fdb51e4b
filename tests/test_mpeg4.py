"""MPEG-4 enc_dec round trip (FATE vcodec.mak:140-147 mpeg4 suite pattern)."""

import numpy as np
import pytest

from libav_tpu.avutil.frame import Frame, Packet
from libav_tpu.avutil.rational import Rational
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.codecs.mpeg4 import MPEG4Decoder, MPEG4Encoder

from tests.test_mpeg12 import psnr, vsynth_frame


def roundtrip(frames, qscale=4, gop=12):
    w, h = frames[0].width, frames[0].height
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="mpeg4",
                          width=w, height=h, pix_fmt="yuv420p",
                          framerate=Rational(25, 1))
    enc = MPEG4Encoder(par)
    enc.set_opt("qscale", qscale)
    enc.set_opt("gop_size", gop)
    pkts = enc.encode_all(frames)
    assert len(pkts) == len(frames)
    dec = MPEG4Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                       codec_id="mpeg4"))
    out = dec.decode_all([Packet(data=p.data, pts=i)
                          for i, p in enumerate(pkts)])
    assert len(out) == len(frames)
    return pkts, [f.to_host() for f in out]


class TestMPEG4RoundTrip:
    def test_single_i_vop(self):
        src = vsynth_frame(64, 48)
        _, out = roundtrip([src], qscale=2)
        p = psnr(src.planes[0], out[0].planes[0])
        assert p > 30, f"luma psnr {p}"

    def test_flat(self):
        f = Frame.alloc_video(32, 32, "yuv420p")
        f.planes[0][:] = 100
        f.planes[1][:] = 128
        f.planes[2][:] = 128
        _, out = roundtrip([f], qscale=2)
        assert np.abs(out[0].planes[0].astype(int) - 100).max() <= 2

    def test_ip_sequence(self):
        frames = [vsynth_frame(64, 48, t) for t in range(5)]
        _, out = roundtrip(frames, qscale=4)
        for i, (s, o) in enumerate(zip(frames, out)):
            p = psnr(s.planes[0], o.planes[0])
            assert p > 27, f"frame {i} luma psnr {p}"

    def test_static_scene_skips(self):
        frames = [vsynth_frame(64, 48, 0) for _ in range(4)]
        pkts, out = roundtrip(frames, qscale=4)
        assert len(pkts[1].data) < len(pkts[0].data) // 4
        for s, o in zip(frames, out):
            assert psnr(s.planes[0], o.planes[0]) > 27

    def test_dc_prediction_chain(self):
        """Strong horizontal gradient exercises the gradient DC predictor."""
        f = Frame.alloc_video(128, 32, "yuv420p")
        yy, xx = np.mgrid[0:32, 0:128]
        f.planes[0] = (xx * 2).astype(np.uint8)
        f.planes[1][:] = 128
        f.planes[2][:] = 128
        _, out = roundtrip([f], qscale=2)
        assert psnr(f.planes[0], out[0].planes[0]) > 32

    def test_qscale_quality_ladder(self):
        src = vsynth_frame(64, 48)
        _, hi = roundtrip([src], qscale=2)
        _, lo = roundtrip([src], qscale=20)
        assert psnr(src.planes[0], hi[0].planes[0]) > \
            psnr(src.planes[0], lo[0].planes[0])

    def test_startcodes_present(self):
        src = vsynth_frame(32, 32)
        pkts, _ = roundtrip([src])
        data = pkts[0].data
        assert data.startswith(b"\x00\x00\x01\xB0")       # VOS
        assert b"\x00\x00\x01\x20" in data                # VOL
        assert b"\x00\x00\x01\xB6" in data                # VOP


class TestAdaptiveQuant:
    """Per-MB qscale (ratecontrol.c:703 masking) coded as
    INTRA_Q/INTER_Q dquant chains that our decoder reconstructs
    drift-free against the encoder's closed loop."""

    def _roundtrip(self, frames, **opts):
        w, h = frames[0].width, frames[0].height
        par = CodecParameters(codec_type=MediaType.VIDEO,
                              codec_id="mpeg4", width=w, height=h,
                              pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = MPEG4Encoder(par)
        enc.set_opt("qscale", 6)
        enc.set_opt("gop_size", 4)
        for k, v in opts.items():
            enc.set_opt(k, v)
        pkts = enc.encode_all(frames)
        dec = MPEG4Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                           codec_id="mpeg4"))
        out = dec.decode_all([Packet(data=p.data, pts=i)
                              for i, p in enumerate(pkts)])
        return enc, pkts, [f.to_host() for f in out]

    def test_lumi_masking_roundtrip(self):
        frames = [vsynth_frame(96, 64, t) for t in range(4)]
        enc, _, out = self._roundtrip(frames, lumi_masking=0.5,
                                      dark_masking=0.3)
        qs = enc._frame_qscale(enc._padded_input(frames[0])[0], True)
        assert len(set(qs.tolist())) > 1, "masking produced a flat field"
        assert np.abs(np.diff(qs.astype(int))).max() <= 2
        for i, (s, o) in enumerate(zip(frames, out)):
            assert psnr(s.planes[0], o.planes[0]) > 25, f"frame {i}"

    def test_spatial_masking_dp_roundtrip(self):
        frames = [vsynth_frame(96, 64, t) for t in range(3)]
        _, _, out = self._roundtrip(frames, scplx_masking=0.4,
                                    p_masking=0.2, border_masking=0.5,
                                    data_partitioning=1)
        for i, (s, o) in enumerate(zip(frames, out)):
            assert psnr(s.planes[0], o.planes[0]) > 24, f"frame {i}"

    def test_q_transition_never_skipped(self):
        """A static scene still codes every MB where qscale steps."""
        frames = [vsynth_frame(96, 64, 0) for _ in range(3)]
        enc, pkts, out = self._roundtrip(frames, lumi_masking=0.5)
        for s, o in zip(frames, out):
            assert psnr(s.planes[0], o.planes[0]) > 25


class TestInter4VQ:
    """INTER4V+Q (inter MCBPC group 6): dquant on a 4MV macroblock.
    The reference decoder accepts it (mpeg4videodec.c:1327 layout:
    bit4=4MV, bit3=dquant) but its encoder never emits it
    (mpegvideo_enc.c:2040 zeroes dquant when mv_type is 8x8), so the
    stream is assembled by hand from our encoder's own headers."""

    def test_group6_decodes_with_dquant(self):
        import libav_tpu.codecs.mpeg4.tables as T
        from libav_tpu.bitstream.putbits import PutBits
        from libav_tpu.codecs.mpeg4.enc import (MPEG4Encoder,
                                                encode_mv_component)
        from libav_tpu.codecs.mpeg4.dec import PICT_P

        f = Frame.alloc_video(32, 32, "yuv420p")
        f.planes[0][:] = 128
        f.planes[1][:] = 128
        f.planes[2][:] = 128
        par = CodecParameters(codec_type=MediaType.VIDEO,
                              codec_id="mpeg4", width=32, height=32,
                              pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = MPEG4Encoder(par)
        enc.set_opt("qscale", 6)
        pkts = enc.encode_all([f, f])
        assert len(pkts) == 2

        # rebuild the P-VOP: 4 MBs, first is INTER4V+Q with dquant=+2
        # and zero 8x8 vectors, rest are skips
        pb = PutBits()
        enc._frame_idx = 2
        enc._vop_header(pb, PICT_P, 1)
        i = 24                          # group 6, cbpc 0
        pb.put_bits(1, 0)               # not_coded
        pb.put_bits(T.INTER_MCBPC_BITS[i], T.INTER_MCBPC_CODE[i])
        code, bits = T.CBPY[15 - 0]     # cbpy 0 (inter: inverted)
        pb.put_bits(bits, code)
        pb.put_bits(2, 3)               # dquant +2 (quant_tab idx 3)
        for _ in range(4):              # four zero-delta 8x8 vectors
            encode_mv_component(pb, 0)
            encode_mv_component(pb, 0)
        for _ in range(3):
            pb.put_bits(1, 1)           # not_coded skips
        enc._stuff(pb)
        data = b"\x00\x00\x01\xB6" + pb.flush()

        dec = MPEG4Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                           codec_id="mpeg4"))
        out = dec.decode_all([Packet(data=pkts[0].data, pts=0),
                              Packet(data=data, pts=1)])
        assert len(out) == 2
        o = out[1].to_host()
        # zero MVs + no residual on a flat frame: identical pixels
        assert np.abs(o.planes[0].astype(int) - 128).max() <= 2
