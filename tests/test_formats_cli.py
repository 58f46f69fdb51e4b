"""Container + CLI integration tests (mirrors FATE's end-to-end avconv
runs, SURVEY.md §4 tier 1: decode -> framecrc lines; enc_dec round trips)."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from libav_tpu.avutil.frame import Frame, Packet
from libav_tpu.avutil.imgutils import frame_to_bytes
from libav_tpu.formats import FormatContext
from libav_tpu.tools import avconv, avprobe

from tests.test_mjpeg import synth_frame, encode as encode_jpeg


@pytest.fixture()
def jpeg_file(tmp_path):
    p = tmp_path / "in.jpg"
    p.write_bytes(encode_jpeg(synth_frame(96, 80, "yuvj420p"), quality=90))
    return str(p)


@pytest.fixture()
def y4m_file(tmp_path):
    p = tmp_path / "in.y4m"
    frames = [synth_frame(64, 48, "yuv420p", seed=i) for i in range(3)]
    oc = FormatContext.open_output(str(p), "y4m")
    from libav_tpu.codecs.api import CodecParameters, MediaType
    from libav_tpu.avutil.rational import Rational
    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="rawvideo",
                          width=64, height=48, pix_fmt="yuv420p")
    st = oc.new_stream(par, time_base=Rational(1, 25))
    st.avg_frame_rate = Rational(25, 1)
    oc.write_header()
    for i, f in enumerate(frames):
        oc.write_packet(Packet(data=frame_to_bytes(f), pts=i, dts=i,
                               duration=1, stream_index=0))
    oc.write_trailer()
    return str(p)


def run_avconv(args, capsys):
    rc = avconv.main(args)
    out = capsys.readouterr().out
    return rc, out


class TestAvconv:
    def test_jpeg_to_framecrc(self, jpeg_file, capsys, monkeypatch):
        # capture stdout bytes via mem: not available -> use a temp file
        rc = avconv.main(["-i", jpeg_file, "-f", "framecrc",
                          "/dev/stdout"])
        assert rc == 0

    def test_jpeg_to_framecrc_file(self, jpeg_file, tmp_path):
        out = tmp_path / "out.crc"
        rc = avconv.main(["-i", jpeg_file, "-f", "framecrc", str(out)])
        assert rc == 0
        lines = [l for l in out.read_text().strip().splitlines()
                 if not l.startswith("#")]
        parts = [p.strip() for p in lines[0].split(",")]
        assert parts[0] == "0"
        assert int(parts[4]) == 96 * 80 * 3 // 2
        assert parts[5].startswith("0x")

    def test_framecrc_deterministic(self, jpeg_file, tmp_path):
        a, b = tmp_path / "a.crc", tmp_path / "b.crc"
        avconv.main(["-i", jpeg_file, "-f", "framecrc", str(a)])
        avconv.main(["-i", jpeg_file, "-f", "framecrc", str(b)])
        assert a.read_text() == b.read_text()

    def test_y4m_to_framecrc(self, y4m_file, tmp_path):
        out = tmp_path / "out.crc"
        rc = avconv.main(["-i", y4m_file, "-f", "framecrc", str(out)])
        assert rc == 0
        lines = [l for l in out.read_text().strip().splitlines()
                 if not l.startswith("#")]
        assert len(lines) == 3

    def test_y4m_to_jpeg_roundtrip(self, y4m_file, tmp_path):
        out = tmp_path / "out_%03d.jpg"
        rc = avconv.main(["-i", y4m_file, "-c:v", "mjpeg", "-q:v", "2",
                          "-f", "image2", str(out)])
        assert rc == 0
        files = sorted(tmp_path.glob("out_*.jpg"))
        assert len(files) == 3
        # decode one back
        from libav_tpu.codecs.mjpeg import MJPEGDecoder
        dec = MJPEGDecoder()
        f = dec.decode_all([Packet(data=files[0].read_bytes())])[0].to_host()
        assert f.width == 64 and f.height == 48

    def test_scale(self, jpeg_file, tmp_path):
        out = tmp_path / "out.crc"
        rc = avconv.main(["-i", jpeg_file, "-s", "48x40", "-f",
                          "framecrc", str(out)])
        assert rc == 0
        parts = out.read_text().split(",")
        assert int(parts[4]) == 48 * 40 * 3 // 2

    def test_vframes_limit(self, y4m_file, tmp_path):
        out = tmp_path / "out.crc"
        rc = avconv.main(["-i", y4m_file, "-frames", "2", "-f",
                          "framecrc", str(out)])
        assert rc == 0
        assert len([l for l in out.read_text().strip().splitlines()
                    if not l.startswith("#")]) == 2

    def test_rawvideo_input(self, tmp_path):
        f = synth_frame(32, 24, "yuv420p")
        raw = tmp_path / "in.yuv"
        raw.write_bytes(frame_to_bytes(f) * 2)
        out = tmp_path / "out.crc"
        rc = avconv.main(["-f", "rawvideo", "-video_size", "32x24",
                          "-pixel_format", "yuv420p", "-i", str(raw),
                          "-f", "framecrc", str(out)])
        assert rc == 0
        assert len([l for l in out.read_text().strip().splitlines()
                    if not l.startswith("#")]) == 2

    def test_null_output(self, y4m_file):
        assert avconv.main(["-i", y4m_file, "-f", "null", "-"]) == 0

    def test_benchmark_flag(self, y4m_file, capsys):
        assert avconv.main(["-benchmark", "-i", y4m_file, "-f", "null", "-"]) == 0
        assert "bench:" in capsys.readouterr().err


class TestAvprobe:
    def test_probe_jpeg(self, jpeg_file, capsys):
        rc = avprobe.main([jpeg_file])
        out = capsys.readouterr().out
        assert rc == 0
        assert "codec_name=mjpeg" in out
        assert "format_name=image2" in out

    def test_probe_y4m(self, y4m_file, capsys):
        rc = avprobe.main(["-show_packets", y4m_file])
        out = capsys.readouterr().out
        assert "width=64" in out
        assert out.count("stream=0 ") == 3


class TestWav:
    def test_wav_roundtrip(self, tmp_path):
        from libav_tpu.avutil.rational import Rational
        from libav_tpu.codecs.api import CodecParameters, MediaType
        rng = np.random.default_rng(0)
        samples = (rng.standard_normal(4800) * 8000).astype("<i2")
        p = tmp_path / "t.wav"
        oc = FormatContext.open_output(str(p), "wav")
        par = CodecParameters(codec_type=MediaType.AUDIO,
                              codec_id="pcm_s16le", sample_rate=48000,
                              channels=2)
        oc.new_stream(par, time_base=Rational(1, 48000))
        oc.write_header()
        oc.write_packet(Packet(data=samples.tobytes(), pts=0, dts=0,
                               duration=2400, stream_index=0))
        oc.write_trailer()

        ic = FormatContext.open_input(str(p))
        st = ic.streams[0]
        assert st.codecpar.codec_id == "pcm_s16le"
        assert st.codecpar.sample_rate == 48000
        assert st.codecpar.channels == 2
        data = b"".join(pkt.data for pkt in ic.packets())
        assert data == samples.tobytes()


class TestConfig5:
    """North-star config 5: ac3/aac decode -> resample 48k->44.1k ->
    (and the video half: yuv -> rgb via swscale through -pix_fmt)."""

    def _audio_file(self, tmp_path, codec):
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs import find_encoder
        from tests.test_ac3 import make_frame
        f = make_frame(1536 * 4 if codec == "ac3" else 1024 * 6, rate=48000)
        par = CodecParameters(codec_type=MediaType.AUDIO, codec_id=codec,
                              sample_rate=48000, channels=2,
                              sample_fmt="fltp")
        enc = find_encoder(codec)(par)
        pkts = enc.encode_all([f])
        ext = "ac3" if codec == "ac3" else "aac"
        p = tmp_path / f"in.{ext}"
        p.write_bytes(b"".join(pk.data for pk in pkts))
        return str(p)

    @pytest.mark.parametrize("codec", ["ac3", "aac"])
    def test_decode_resample_to_wav(self, codec, tmp_path):
        from libav_tpu.tools import avconv
        src = self._audio_file(tmp_path, codec)
        out = tmp_path / "out.wav"
        rc = avconv.main(["-i", src, "-ar", "44100", "-sample_fmt", "s16",
                          str(out)])
        assert rc == 0
        ic = FormatContext.open_input(str(out))
        par = ic.streams[0].codecpar
        assert par.sample_rate == 44100
        assert par.codec_id == "pcm_s16le"
        total = sum(len(p.data) for p in ic.packets())
        assert total > 20000   # ~0.12s of stereo s16 at 44.1k


class TestDevices:
    """libavdevice analogue: virtual capture sources (devices.py)."""

    def test_testsrc_device(self):
        from libav_tpu.formats import FormatContext
        ic = FormatContext.open_input("testsrc=64x48:rate=25:frames=5")
        st = ic.streams[0]
        assert st.codecpar.codec_id == "rawvideo"
        assert (st.codecpar.width, st.codecpar.height) == (64, 48)
        pkts = list(ic.packets())
        assert len(pkts) == 5
        assert len(pkts[0].data) == 64 * 48 * 3 // 2

    def test_sine_device(self):
        import numpy as np
        from libav_tpu.formats import FormatContext
        ic = FormatContext.open_input("sine=freq=1000:rate=8000:samples=4000")
        pkts = list(ic.packets())
        x = np.frombuffer(b"".join(p.data for p in pkts), np.int16)
        assert len(x) == 4000
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
        assert abs(np.argmax(spec) * 8000 / len(x) - 1000) < 10


class TestTrim:
    """-ss/-t output trim (reference: avconv_opt start_time/recording_time)."""

    def test_video_trim_exact_frames(self, tmp_path):
        import numpy as np
        from libav_tpu.tools.avconv import main as avconv_main
        W, H, fs = 64, 48, 64 * 48 * 3 // 2
        src = tmp_path / "s.yuv"
        rng = np.random.default_rng(0)
        raw = rng.integers(0, 256, 9 * fs).astype(np.uint8).tobytes()
        src.write_bytes(raw)
        out = tmp_path / "o.yuv"
        rc = avconv_main(["-f", "rawvideo", "-pix_fmt", "yuv420p",
                          "-s", "64x48", "-r", "25", "-i", str(src),
                          "-ss", "0.12", "-t", "0.12",
                          "-f", "rawvideo", str(out), "-y"])
        assert rc == 0
        data = out.read_bytes()
        assert len(data) == 3 * fs
        assert data == raw[3 * fs:6 * fs]

    def test_parse_time(self):
        from libav_tpu.tools.avconv import parse_time
        assert parse_time("1.5") == 1.5
        assert parse_time("01:02") == 62.0
        assert parse_time("1:02:03.5") == 3723.5
        assert parse_time("-2") == -2.0


class TestMapMultiOutput:
    """-map stream selection + multiple output files (reference:
    avconv_opt.c mapping semantics)."""

    def test_two_outputs(self, tmp_path):
        import os
        from libav_tpu.tools import avconv
        from fate_util import write_y4m
        src = str(tmp_path / "s.y4m")
        write_y4m(src, w=96, h=80, n=3)
        o1 = str(tmp_path / "a.m1v")
        o2 = str(tmp_path / "b.avi")
        rc = avconv.main(["-y", "-i", src,
                          "-c:v", "mpeg1video", "-f", "mpeg1video", o1,
                          "-c:v", "mjpeg", "-q:v", "5", "-f", "avi", o2])
        assert rc == 0
        assert os.path.getsize(o1) > 0 and os.path.getsize(o2) > 0
        from libav_tpu.formats.api import FormatContext
        assert FormatContext.open_input(o1).streams[0].codecpar.codec_id \
            == "mpeg1video"
        assert FormatContext.open_input(o2).streams[0].codecpar.codec_id \
            == "mjpeg"

    def test_map_two_inputs(self, tmp_path):
        from libav_tpu.tools import avconv
        from fate_util import write_y4m, write_wav48
        v = str(tmp_path / "v.y4m")
        a = str(tmp_path / "a.wav")
        write_y4m(v, w=96, h=80, n=3)
        write_wav48(a, seconds=0.1)
        out = str(tmp_path / "o.avi")
        rc = avconv.main(["-y", "-i", v, "-i", a, "-map", "0:v",
                          "-map", "1:a", "-c:v", "mjpeg", "-q:v", "5",
                          "-c:a", "pcm_s16le", "-f", "avi", out])
        assert rc == 0
        from libav_tpu.formats.api import FormatContext
        kinds = [s.codecpar.codec_type
                 for s in FormatContext.open_input(out).streams]
        assert kinds == ["video", "audio"]

    def test_map_audio_only(self, tmp_path):
        from libav_tpu.tools import avconv
        from fate_util import write_wav48
        a = str(tmp_path / "a.wav")
        write_wav48(a, seconds=0.1)
        out = str(tmp_path / "o.wav")
        assert avconv.main(["-y", "-i", a, "-map", "0:a", "-f", "wav",
                            out]) == 0

    def test_unknown_encoder_option_errors(self, tmp_path):
        """-trellis on an encoder without trellis must error, not
        silently no-op (honest option surface)."""
        from libav_tpu.tools import avconv
        from fate_util import write_y4m
        src = str(tmp_path / "s.y4m")
        write_y4m(src, w=96, h=80, n=2)
        out = str(tmp_path / "o.m1v")
        rc = avconv.main(["-y", "-i", src, "-c:v", "mpeg1video",
                          "-trellis", "2", "-f", "mpeg1video", out])
        assert rc != 0
