"""MP4/MOV container round trips (reference: mov.c/movenc.c coverage)."""

import numpy as np
import pytest

from libav_tpu.avutil.frame import Frame, Packet
from libav_tpu.avutil.rational import Rational
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.codecs import find_decoder, find_encoder
from libav_tpu.formats import FormatContext

from tests.test_mpeg12 import psnr, vsynth_frame


def mux_video(tmp_path, codec, nframes=3, w=64, h=48):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id=codec,
                          width=w, height=h, pix_fmt="yuv420p",
                          framerate=Rational(25, 1))
    enc = find_encoder(codec)(par)
    if codec == "h264":
        enc.set_opt("qp", 22)
    frames = [vsynth_frame(w, h, t) for t in range(nframes)]
    pkts = enc.encode_all(frames)
    path = tmp_path / f"t_{codec}.mp4"
    oc = FormatContext.open_output(str(path), "mp4")
    st = oc.new_stream(par, time_base=Rational(1, 25))
    oc.write_header()
    for i, p in enumerate(pkts):
        p.stream_index = 0
        p.dts = p.pts = i
        p.duration = 1
        oc.write_packet(p)
    oc.write_trailer()
    return str(path), frames


class TestMP4Video:
    @pytest.mark.parametrize("codec", ["mpeg4", "h264", "mjpeg"])
    def test_mux_demux_decode(self, codec, tmp_path):
        path, frames = mux_video(tmp_path, codec)
        ic = FormatContext.open_input(str(path))
        st = ic.streams[0]
        assert st.codecpar.codec_id == codec
        assert st.codecpar.width == 64
        pkts = list(ic.packets())
        assert len(pkts) == 3
        dec = find_decoder(codec)(st.codecpar).open()
        out = dec.decode_all(pkts)
        assert len(out) == 3
        p = psnr(frames[0].planes[0], out[0].to_host().planes[0])
        assert p > 26, f"{codec}: psnr {p}"

    def test_keyframe_flags(self, tmp_path):
        path, _ = mux_video(tmp_path, "mpeg4", nframes=5)
        ic = FormatContext.open_input(str(path))
        pkts = list(ic.packets())
        assert pkts[0].is_key
        assert not pkts[1].is_key


class TestMP4Audio:
    def test_aac_in_mp4(self, tmp_path):
        from tests.test_ac3 import make_frame
        f = make_frame(1024 * 3, rate=48000)
        par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="aac",
                              sample_rate=48000, channels=2,
                              sample_fmt="fltp")
        enc = find_encoder("aac")(par)
        pkts = enc.encode_all([f])
        path = tmp_path / "t.m4a"
        oc = FormatContext.open_output(str(path), "mp4")
        oc.new_stream(par, time_base=Rational(1, 48000))
        oc.write_header()
        for p in pkts:
            p.stream_index = 0
            oc.write_packet(p)
        oc.write_trailer()

        ic = FormatContext.open_input(str(path))
        st = ic.streams[0]
        assert st.codecpar.codec_id == "aac"
        assert st.codecpar.sample_rate == 48000
        assert st.codecpar.channels == 2
        got = list(ic.packets())
        assert len(got) == 3
        # raw (ASC) samples: decodable with sample_rate from codecpar
        dec = find_decoder("aac")(st.codecpar).open()
        out = dec.decode_all(got)
        assert len(out) == 3
        assert out[0].sample_rate == 48000

    def test_av_interleaved(self, tmp_path):
        """video + audio in one mp4, packets interleaved by dts."""
        from tests.test_ac3 import make_frame
        vpar = CodecParameters(codec_type=MediaType.VIDEO, codec_id="mpeg4",
                               width=32, height=32, pix_fmt="yuv420p",
                               framerate=Rational(25, 1))
        venc = find_encoder("mpeg4")(vpar)
        vpkts = venc.encode_all([vsynth_frame(32, 32, t) for t in range(4)])
        apar = CodecParameters(codec_type=MediaType.AUDIO, codec_id="aac",
                               sample_rate=48000, channels=2,
                               sample_fmt="fltp")
        aenc = find_encoder("aac")(apar)
        apkts = aenc.encode_all([make_frame(1024 * 2, rate=48000)])

        path = tmp_path / "av.mp4"
        oc = FormatContext.open_output(str(path), "mp4")
        oc.new_stream(vpar, time_base=Rational(1, 25))
        oc.new_stream(apar, time_base=Rational(1, 48000))
        oc.write_header()
        for i, p in enumerate(vpkts):
            p.stream_index = 0
            p.dts = p.pts = i
            p.duration = 1
            oc.write_packet(p)
        for p in apkts:
            p.stream_index = 1
            oc.write_packet(p)
        oc.write_trailer()

        ic = FormatContext.open_input(str(path))
        assert len(ic.streams) == 2
        kinds = {s.codecpar.codec_type for s in ic.streams}
        assert kinds == {MediaType.VIDEO, MediaType.AUDIO}
        pkts = list(ic.packets())
        assert len(pkts) == 6


class TestMP4Mpeg2BFrames:
    def test_mpeg2_bframes_ctts(self, tmp_path):
        """MPEG-2 in MP4 (mp4v OTI 0x61) with B-frame reordering: ctts
        must restore presentation order through demux+decode."""
        from libav_tpu.avutil.rational import Rational as R
        par = CodecParameters(codec_type=MediaType.VIDEO,
                              codec_id="mpeg2video", width=64, height=48,
                              pix_fmt="yuv420p", framerate=R(25, 1))
        enc = find_encoder("mpeg2video")(par)
        enc.set_opt("qscale", 4)
        enc.set_opt("b_frames", 2)
        frames = [vsynth_frame(64, 48, t) for t in range(7)]
        for i, f in enumerate(frames):
            f.pts = i
        pkts = enc.encode_all(frames)
        path = tmp_path / "b.mp4"
        oc = FormatContext.open_output(str(path), "mp4")
        oc.new_stream(par, time_base=Rational(1, 25))
        oc.write_header()
        for p in pkts:
            p.stream_index = 0
            oc.write_packet(p)
        oc.write_trailer()

        ic = FormatContext.open_input(str(path))
        assert ic.streams[0].codecpar.codec_id == "mpeg2video"
        back = list(ic.packets())
        assert len(back) == 7
        # demuxed pts restores composition offsets (pts != dts somewhere)
        assert any(p.pts != p.dts for p in back)
        dec = find_decoder("mpeg2video")(
            CodecParameters(codec_type=MediaType.VIDEO,
                            codec_id="mpeg2video"))
        out = dec.decode_all(back)
        assert len(out) == 7
        # display order: every frame matches its own source
        for i, (s, o) in enumerate(zip(frames, out)):
            p = psnr(s.planes[0], np.asarray(o.to_host().planes[0]))
            assert p > 30, f"frame {i} psnr {p:.1f}"


class TestSeek:
    def test_read_seek_to_keyframe(self, tmp_path):
        """read_seek positions every track at the last keyframe at or
        before the timestamp (reference: mov_read_seek)."""
        path, frames = mux_video(tmp_path, "mpeg4", nframes=9)
        # re-mux with a short GOP so keyframes exist mid-stream
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="mpeg4",
                              width=64, height=48, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = find_encoder("mpeg4")(par)
        enc.set_opt("gop_size", 3)
        frames = [vsynth_frame(64, 48, t) for t in range(9)]
        pkts = enc.encode_all(frames)
        p2 = tmp_path / "gop3.mp4"
        oc = FormatContext.open_output(str(p2), "mp4")
        oc.new_stream(par, time_base=Rational(1, 25))
        oc.write_header()
        for i, p in enumerate(pkts):
            p.stream_index = 0
            p.dts = p.pts = i
            p.duration = 1
            oc.write_packet(p)
        oc.write_trailer()

        ic = FormatContext.open_input(str(p2))
        ic.seek(0, 5)            # ts 5 -> keyframe at sample 3 (dts 3)
        first = ic.read_frame()
        assert first.dts == 3
        assert first.is_key
        rest = [first] + list(ic.packets())
        assert len(rest) == 6    # samples 3..8
