"""AVI + MPEG-TS container round trips."""

import numpy as np
import pytest

from libav_tpu.avutil.frame import Packet
from libav_tpu.avutil.rational import Rational
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.codecs import find_decoder, find_encoder
from libav_tpu.formats import FormatContext

from tests.test_mpeg12 import psnr, vsynth_frame


def encode_video(codec, nframes=3, w=64, h=48, **opts):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id=codec,
                          width=w, height=h, pix_fmt="yuv420p",
                          framerate=Rational(25, 1))
    enc = find_encoder(codec)(par)
    for k, v in opts.items():
        enc.set_opt(k, v)
    frames = [vsynth_frame(w, h, t) for t in range(nframes)]
    pkts = enc.encode_all(frames)
    for i, p in enumerate(pkts):
        p.stream_index = 0
        p.dts = p.pts = i
        p.duration = 1
    return par, pkts, frames


class TestAvi:
    @pytest.mark.parametrize("codec", ["mjpeg", "mpeg4"])
    def test_roundtrip(self, codec, tmp_path):
        par, pkts, frames = encode_video(codec)
        path = tmp_path / "t.avi"
        oc = FormatContext.open_output(str(path), "avi")
        st = oc.new_stream(par, time_base=Rational(1, 25))
        st.avg_frame_rate = Rational(25, 1)
        oc.write_header()
        for p in pkts:
            oc.write_packet(p)
        oc.write_trailer()

        ic = FormatContext.open_input(str(path))
        st = ic.streams[0]
        assert st.codecpar.codec_id == codec
        assert st.codecpar.width == 64
        got = list(ic.packets())
        assert len(got) == 3
        dec = find_decoder(codec)(st.codecpar).open()
        out = dec.decode_all(got)
        assert psnr(frames[0].planes[0], out[0].to_host().planes[0]) > 26


class TestMpegTS:
    @pytest.mark.parametrize("codec", ["mpeg2video", "h264"])
    def test_roundtrip(self, codec, tmp_path):
        par, pkts, frames = encode_video(codec)
        path = tmp_path / "t.ts"
        oc = FormatContext.open_output(str(path), "mpegts")
        oc.new_stream(par, time_base=Rational(1, 25))
        oc.write_header()
        for p in pkts:
            oc.write_packet(p)
        oc.write_trailer()

        data = path.read_bytes()
        assert len(data) % 188 == 0
        assert all(data[i] == 0x47 for i in range(0, len(data), 188))

        ic = FormatContext.open_input(str(path))
        st = ic.streams[0]
        assert st.codecpar.codec_id == codec
        got = list(ic.packets())
        assert len(got) == 3
        dec = find_decoder(codec)(st.codecpar).open()
        out = dec.decode_all(got)
        assert len(out) == 3
        assert psnr(frames[0].planes[0], out[0].to_host().planes[0]) > 26

    def test_ts_audio(self, tmp_path):
        from tests.test_ac3 import make_frame
        par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="ac3",
                              sample_rate=48000, channels=2,
                              sample_fmt="fltp")
        enc = find_encoder("ac3")(par)
        pkts = enc.encode_all([make_frame(1536 * 2, rate=48000)])
        path = tmp_path / "a.ts"
        oc = FormatContext.open_output(str(path), "mpegts")
        oc.new_stream(par, time_base=Rational(1, 48000))
        oc.write_header()
        for p in pkts:
            p.stream_index = 0
            oc.write_packet(p)
        oc.write_trailer()

        ic = FormatContext.open_input(str(path))
        assert ic.streams[0].codecpar.codec_id == "ac3"
        got = list(ic.packets())
        dec = find_decoder("ac3")(ic.streams[0].codecpar).open()
        out = dec.decode_all(got)
        assert len(out) == 2
