"""Demux-core machinery: find_stream_info, parser auto-insertion,
pts/dts inference, and container seeking (reference: utils.c:2200
avformat_find_stream_info, utils.c:816 parse_packet, utils.c:641
compute_pkt_fields, utils.c:1885 seek_frame_generic)."""

import numpy as np
import pytest

from libav_tpu.avutil.frame import Packet
from libav_tpu.avutil.rational import NOPTS_VALUE, Rational
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.codecs import find_decoder, find_encoder
from libav_tpu.formats import FormatContext

from tests.test_containers import encode_video
from tests.test_mpeg12 import vsynth_frame


class TestFindStreamInfo:
    def test_raw_h264_es(self, tmp_path):
        """A raw Annex-B elementary stream carries no container-level
        width/height; find_stream_info must fill them by trial decode
        (reference: utils.c:2200)."""
        par, pkts, frames = encode_video("h264", nframes=2)
        path = tmp_path / "t.h264"
        path.write_bytes(b"".join(bytes(p.data) for p in pkts))

        ic = FormatContext.open_input(str(path))
        st = ic.streams[0]
        assert st.codecpar.codec_id == "h264"
        # raw ES demuxer alone does not know the geometry
        ic.find_stream_info()
        assert st.codecpar.width == 64
        assert st.codecpar.height == 48
        # probed packets are replayed: full decode still works
        got = list(ic.packets())
        dec = find_decoder("h264")(st.codecpar).open()
        out = dec.decode_all(got)
        assert len(out) == 2

    def test_raw_mpeg2_es(self, tmp_path):
        par, pkts, frames = encode_video("mpeg2video", nframes=2)
        path = tmp_path / "t.m2v"
        path.write_bytes(b"".join(bytes(p.data) for p in pkts))
        ic = FormatContext.open_input(str(path))
        ic.find_stream_info()
        assert ic.streams[0].codecpar.width == 64
        assert ic.streams[0].codecpar.height == 48

    def test_avprobe_raw_es_reports_dims(self, tmp_path, capsys):
        from libav_tpu.tools import avprobe
        par, pkts, _ = encode_video("mpeg4", nframes=1)
        path = tmp_path / "t.m4v"
        path.write_bytes(b"".join(bytes(p.data) for p in pkts))
        rc = avprobe.main([str(path)])
        assert rc == 0
        txt = capsys.readouterr().out
        assert "width=64" in txt
        assert "height=48" in txt


class TestParserInsertion:
    def test_ts_aac_parser_reframes_adts(self, tmp_path):
        """MPEG-TS PES audio payloads are not frame-aligned; the demux
        core must run the ADTS parser so each returned packet is one
        codec frame (reference: utils.c:816)."""
        from tests.test_aac import make_frame
        par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="aac",
                              sample_rate=48000, channels=2,
                              sample_fmt="fltp")
        enc = find_encoder("aac")(par)
        frames = [make_frame(1024 * 4, rate=48000)]
        pkts = enc.encode_all(frames)
        path = tmp_path / "a.ts"
        oc = FormatContext.open_output(str(path), "mpegts")
        oc.new_stream(par, time_base=Rational(1, 48000))
        oc.write_header()
        for p in pkts:
            p.stream_index = 0
            oc.write_packet(p)
        oc.write_trailer()

        ic = FormatContext.open_input(str(path))
        got = list(ic.packets())
        # each packet is exactly one ADTS frame (starts with syncword)
        assert len(got) >= 4
        for p in got:
            d = bytes(p.data)
            assert d[0] == 0xFF and (d[1] & 0xF0) == 0xF0
            # ADTS frame_length covers the whole packet
            flen = ((d[3] & 3) << 11) | (d[4] << 3) | (d[5] >> 5)
            assert flen == len(d)

    def test_pts_dts_inference(self, tmp_path):
        """Packets leaving read_frame always carry dts and duration
        (reference: compute_pkt_fields, utils.c:641)."""
        par, pkts, _ = encode_video("mjpeg", nframes=3)
        path = tmp_path / "t.avi"
        oc = FormatContext.open_output(str(path), "avi")
        st = oc.new_stream(par, time_base=Rational(1, 25))
        st.avg_frame_rate = Rational(25, 1)
        oc.write_header()
        for p in pkts:
            oc.write_packet(p)
        oc.write_trailer()
        ic = FormatContext.open_input(str(path))
        for p in ic.packets():
            assert p.dts != NOPTS_VALUE
            assert p.duration > 0


def _mux(path, fmt, par, pkts, tb, fr=None):
    oc = FormatContext.open_output(str(path), fmt)
    st = oc.new_stream(par, time_base=tb)
    if fr:
        st.avg_frame_rate = fr
    oc.write_header()
    for p in pkts:
        oc.write_packet(p)
    oc.write_trailer()


class TestContainerSeek:
    """-ss style seeking: position at the last keyframe at/before the
    timestamp on every indexed container (MOV already covered in
    test_mov.py)."""

    def _gop_stream(self, nframes=9, gop=4):
        par, pkts, frames = encode_video("mpeg2video", nframes=nframes,
                                         gop_size=gop)
        return par, pkts, frames

    @pytest.mark.parametrize("fmt,ext", [("avi", "avi"),
                                         ("matroska", "mkv")])
    def test_seek_keyframe(self, fmt, ext, tmp_path):
        par, pkts, frames = self._gop_stream()
        path = tmp_path / f"t.{ext}"
        tb = Rational(1, 25) if fmt == "avi" else Rational(1, 1000)
        _mux(path, fmt, par, pkts, tb, fr=Rational(25, 1))

        ic = FormatContext.open_input(str(path))
        st = ic.streams[0]
        # seek to the 6th frame -> should land on keyframe at frame 4
        ic.iformat.read_seek(0, 6)
        first = ic.read_frame()
        assert first.is_key
        assert first.pts == 4

    def test_seek_mpegts(self, tmp_path):
        par, pkts, frames = self._gop_stream()
        path = tmp_path / "t.ts"
        _mux(path, "mpegts", par, pkts, Rational(1, 25))
        ic = FormatContext.open_input(str(path))
        ic.iformat.read_seek(0, pkts[6].pts * 3600)
        first = ic.read_frame()
        assert first.is_key

    def test_avi_keyflags_from_idx1(self, tmp_path):
        """Non-key P frames must not be flagged keyframes (consumed by
        the seek logic and by stream copy)."""
        par, pkts, frames = self._gop_stream()
        path = tmp_path / "t.avi"
        _mux(path, "avi", par, pkts, Rational(1, 25), fr=Rational(25, 1))
        ic = FormatContext.open_input(str(path))
        keys = [p.is_key for p in ic.packets()]
        assert keys == [i % 4 == 0 for i in range(9)]


class TestAvconvFilters:
    def test_vf_simple_graph(self, tmp_path):
        """-vf chains through the filter graph (hflip,scale)."""
        from libav_tpu.tools import avconv
        par, pkts, _ = encode_video("mjpeg", nframes=2, w=96, h=80)
        path = tmp_path / "m.avi"
        _mux(path, "avi", par, pkts, Rational(1, 25), fr=Rational(25, 1))
        out = tmp_path / "o.crc"
        rc = avconv.main(["-y", "-i", str(path), "-vf",
                          "hflip,scale=48:40", "-f", "framecrc", str(out)])
        assert rc == 0
        assert " 2880," in out.read_text()    # 48x40 yuv420p frame size

    def test_filter_complex_overlay(self, tmp_path):
        """Two-input overlay: secondary input pixels replace the main
        frame region at the requested offset (reference vf_overlay.c)."""
        from libav_tpu.tools import avconv
        par, pkts, mains = encode_video("mjpeg", nframes=2, w=96, h=80)
        main = tmp_path / "m.avi"
        _mux(main, "avi", par, pkts, Rational(1, 25), fr=Rational(25, 1))
        par2, pkts2, ovs = encode_video("mjpeg", nframes=2, w=32, h=16)
        ovp = tmp_path / "ov.avi"
        _mux(ovp, "avi", par2, pkts2, Rational(1, 25), fr=Rational(25, 1))
        out = tmp_path / "o.y4m"
        rc = avconv.main(["-y", "-i", str(main), "-i", str(ovp),
                          "-filter_complex",
                          "[0:v][1:v]overlay=x=16:y=8[out]",
                          str(out)])
        assert rc == 0
        ic = FormatContext.open_input(str(out))
        from libav_tpu.codecs import find_decoder
        dec = find_decoder("rawvideo")(ic.streams[0].codecpar).open()
        f0 = dec.decode_all(list(ic.packets()))[0].to_host()
        got = np.asarray(f0.planes[0])
        # overlay region equals the decoded overlay frame's luma
        dec_ov = find_decoder("mjpeg")(par2).open()
        ov0 = dec_ov.decode_all([pkts2[0]])[0].to_host()
        np.testing.assert_array_equal(got[8:24, 16:48],
                                      np.asarray(ov0.planes[0]))


class TestHTTPStreaming:
    def test_http_streams_without_buffering(self, tmp_path):
        """HTTP inputs are read as a forward stream (reference http.c),
        not buffered whole into RAM."""
        import http.server
        import threading

        par, pkts, _ = encode_video("mjpeg", nframes=2, w=64, h=48)
        path = tmp_path / "t.avi"
        _mux(path, "avi", par, pkts, Rational(1, 25), fr=Rational(25, 1))

        class H(http.server.SimpleHTTPRequestHandler):
            def translate_path(self, p):
                return str(path)

            def log_message(self, *a):
                pass

        srv = http.server.HTTPServer(("127.0.0.1", 0), H)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_port}/t.avi"
            from libav_tpu.formats.io import url_open
            io_ = url_open(url)
            assert not io_.seekable
            ic = FormatContext.open_input(url)
            got = list(ic.packets())
            assert len(got) == 2
        finally:
            srv.shutdown()


class TestConcatProtocol:
    def test_concat_two_m2v_segments(self, tmp_path):
        """concat:a|b reads resources back to back (reference
        concat.c) — two elementary-stream segments decode as one."""
        par, pkts, _ = encode_video("mpeg2video", nframes=2, gop_size=1)
        a = tmp_path / "a.m2v"
        b = tmp_path / "b.m2v"
        a.write_bytes(b"".join(bytes(p.data) for p in pkts[:1]))
        b.write_bytes(b"".join(bytes(p.data) for p in pkts[1:]))
        ic = FormatContext.open_input(f"concat:{a}|{b}", "m2v")
        got = list(ic.packets())
        dec = find_decoder("mpeg2video")(ic.streams[0].codecpar).open()
        out = dec.decode_all(got)
        assert len(out) == 2
