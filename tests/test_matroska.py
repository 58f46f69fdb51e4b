"""Matroska container round trips (reference: matroskadec.c /
matroskaenc.c coverage — EBML parse, CodecPrivate mapping, SimpleBlock
timecodes)."""

import numpy as np
import pytest

from libav_tpu.avutil.frame import Packet
from libav_tpu.avutil.rational import Rational
from libav_tpu.codecs import find_decoder, find_encoder
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.formats import FormatContext

from tests.test_mpeg12 import psnr, vsynth_frame


def mux_mkv(tmp_path, codec, nframes=3, w=64, h=48):
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id=codec,
                          width=w, height=h, pix_fmt="yuv420p",
                          framerate=Rational(25, 1))
    enc = find_encoder(codec)(par)
    if codec == "h264":
        enc.set_opt("qp", 22)
    frames = [vsynth_frame(w, h, t) for t in range(nframes)]
    pkts = enc.encode_all(frames)
    path = tmp_path / f"t_{codec}.mkv"
    oc = FormatContext.open_output(str(path), "matroska")
    oc.new_stream(par, time_base=Rational(1, 25))
    oc.write_header()
    for i, p in enumerate(pkts):
        p.stream_index = 0
        p.dts = p.pts = i
        p.duration = 1
        p.time_base = Rational(1, 25)
        oc.write_packet(p)
    oc.write_trailer()
    return str(path), frames


class TestMatroskaVideo:
    @pytest.mark.parametrize("codec", ["mpeg4", "h264", "mpeg1video"])
    def test_mux_demux_decode(self, codec, tmp_path):
        path, frames = mux_mkv(tmp_path, codec)
        ic = FormatContext.open_input(str(path))
        assert ic.iformat.NAME == "matroska"
        st = ic.streams[0]
        assert st.codecpar.codec_id == codec
        assert st.codecpar.width == 64
        pkts = list(ic.packets())
        assert len(pkts) == 3
        # timecodes are ms (40ms per frame at 25fps)
        assert [p.pts for p in pkts] == [0, 40, 80]
        dec = find_decoder(codec)(st.codecpar).open()
        out = dec.decode_all(pkts)
        assert len(out) == 3
        p = psnr(frames[0].planes[0], out[0].to_host().planes[0])
        assert p > 26, f"{codec}: psnr {p}"

    def test_h264_codec_private_is_avcc(self, tmp_path):
        path, _ = mux_mkv(tmp_path, "h264")
        ic = FormatContext.open_input(str(path))
        xd = ic.streams[0].codecpar.extradata
        assert xd and xd[:1] == b"\x01"    # avcC configuration version
        # demuxed packets are converted back to Annex B for the decoder
        pkt = next(iter(ic.packets()))
        assert pkt.data[:4] == b"\x00\x00\x00\x01" or \
            pkt.data[:3] == b"\x00\x00\x01"

    def test_keyframe_flags(self, tmp_path):
        path, _ = mux_mkv(tmp_path, "mpeg4", nframes=5)
        ic = FormatContext.open_input(str(path))
        pkts = list(ic.packets())
        assert pkts[0].is_key
        assert not pkts[1].is_key


class TestMatroskaAudio:
    def test_ac3_in_mka(self, tmp_path):
        from tests.test_ac3 import make_frame
        f = make_frame(1536 * 3, rate=48000)
        par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="ac3",
                              sample_rate=48000, channels=2,
                              sample_fmt="fltp")
        enc = find_encoder("ac3")(par)
        pkts = enc.encode_all([f])
        path = tmp_path / "t.mka"
        oc = FormatContext.open_output(str(path), "matroska")
        oc.new_stream(par, time_base=Rational(1, 48000))
        oc.write_header()
        for i, p in enumerate(pkts):
            p.stream_index = 0
            p.dts = p.pts = i * 1536
            p.time_base = Rational(1, 48000)
            oc.write_packet(p)
        oc.write_trailer()
        ic = FormatContext.open_input(str(path))
        st = ic.streams[0]
        assert st.codecpar.codec_id == "ac3"
        assert st.codecpar.sample_rate == 48000
        back = list(ic.packets())
        assert len(back) == len(pkts)
        assert b"".join(p.data for p in back) == \
            b"".join(p.data for p in pkts)

    def test_lacing_xiph(self, tmp_path):
        """Hand-build a cluster with Xiph lacing and check the demuxer
        splits it (our muxer never laces, so synthesize)."""
        from libav_tpu.formats import matroska as M
        frames = [b"a" * 300, b"b" * 7, b"c" * 12]
        lace = bytes([len(frames) - 1])
        for fr in frames[:-1]:
            n = len(fr)
            while n >= 255:
                lace += bytes([255])
                n -= 255
            lace += bytes([n])
        body = M._w_size(1) + b"\x00\x00" + bytes([0x80 | 0x02]) + \
            lace + b"".join(frames)
        cluster = M._elem(M.CLUSTER,
                          M._e_uint(M.CLUSTER_TIMECODE, 0) +
                          M._elem(M.SIMPLE_BLOCK, body))
        track = M._elem(M.TRACK_ENTRY,
                        M._e_uint(M.TRACK_NUMBER, 1) +
                        M._e_uint(M.TRACK_TYPE, M.TRACK_TYPE_AUDIO) +
                        M._e_str(M.CODEC_ID, "A_PCM/INT/LIT") +
                        M._elem(M.T_AUDIO,
                                M._e_float(M.SAMPLING_FREQ, 48000.0) +
                                M._e_uint(M.CHANNELS, 1)))
        seg = M._elem(M.SEGMENT,
                      M._elem(M.INFO, M._e_uint(M.TIMECODE_SCALE, 1000000)) +
                      M._elem(M.TRACKS, track) + cluster)
        hdr = M._elem(M.EBML_HEADER, M._e_str(M.DOCTYPE, "matroska"))
        path = tmp_path / "lace.mka"
        path.write_bytes(hdr + seg)
        ic = FormatContext.open_input(str(path))
        pkts = list(ic.packets())
        assert [p.data for p in pkts] == frames
