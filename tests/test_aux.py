"""Auxiliary subsystem tests: fault injection robustness (trasher +
corrupt-stream decode, SURVEY.md §5), parsers, fifo/timer, tools."""

import numpy as np
import pytest

from libav_tpu.avutil.frame import Packet
from libav_tpu.avutil.error import AVError
from libav_tpu.tools.trasher import trash

from tests.test_mpeg12 import make_encoder, vsynth_frame


class TestFaultInjection:
    """Corrupt streams must never crash the decoders — errors surface as
    AVError or degraded output (the reference's er/AV_EF_EXPLODE model)."""

    def _decode_noexc(self, decoder_cls, par, datas):
        from libav_tpu.codecs.api import CodecParameters
        dec = decoder_cls(par)
        dec.open()
        ok = 0
        for d in datas:
            try:
                dec.send_packet(Packet(data=d))
                dec._pump()
                ok += 1
            except AVError:
                pass   # the only sanctioned failure mode for corrupt input
        return ok

    @pytest.mark.parametrize("seed", [1, 2, 3, 4])
    def test_trashed_mpeg1(self, seed):
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.mpeg12 import MPEG1Decoder
        enc = make_encoder(48, 32, qscale=4)
        pkts = enc.encode_all([vsynth_frame(48, 32, t) for t in range(3)])
        par = CodecParameters(codec_type=MediaType.VIDEO,
                              codec_id="mpeg1video")
        datas = [trash(p.data, count=8, seed=seed, keep_prefix=12)
                 for p in pkts]
        self._decode_noexc(MPEG1Decoder, par, datas)

    @pytest.mark.parametrize("seed", [1, 2])
    def test_trashed_jpeg(self, seed):
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.mjpeg import MJPEGDecoder
        from tests.test_mjpeg import synth_frame, encode
        data = encode(synth_frame(48, 32), 90)
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="mjpeg")
        self._decode_noexc(MJPEGDecoder, par,
                           [trash(data, 12, seed, keep_prefix=2)])

    def test_truncated_everything(self):
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.h264 import H264Decoder
        from libav_tpu.codecs.h264 import H264Encoder
        from libav_tpu.avutil.rational import Rational
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                              width=32, height=32, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = H264Encoder(par)
        pkt = enc.encode_all([vsynth_frame(32, 32)])[0]
        dpar = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
        for cut in (7, 31, len(pkt.data) // 2):
            self._decode_noexc(H264Decoder, dpar, [pkt.data[:cut]])


class TestParsers:
    def test_ac3_parser(self):
        from libav_tpu.codecs.parsers import find_parser
        from libav_tpu.codecs import find_encoder
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from tests.test_ac3 import make_frame
        par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="ac3",
                              sample_rate=48000, channels=2,
                              sample_fmt="fltp")
        enc = find_encoder("ac3")(par)
        pkts = enc.encode_all([make_frame(1536 * 3)])
        blob = b"".join(p.data for p in pkts)
        parser = find_parser("ac3")()
        frames = []
        # feed in awkward chunk sizes
        for i in range(0, len(blob), 501):
            frames += parser.parse(blob[i:i + 501])
        frames += parser.parse(b"", eof=True)
        assert len(frames) == 3
        assert all(f[:2] == b"\x0b\x77" for f in frames)

    def test_h264_parser(self):
        from libav_tpu.codecs.parsers import find_parser
        from libav_tpu.codecs.h264 import H264Encoder
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.avutil.rational import Rational
        par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                              width=32, height=32, pix_fmt="yuv420p",
                              framerate=Rational(25, 1))
        enc = H264Encoder(par)
        pkts = enc.encode_all([vsynth_frame(32, 32, t) for t in range(3)])
        blob = b"".join(p.data for p in pkts)
        parser = find_parser("h264")()
        frames = parser.parse(blob, eof=True)
        assert len(frames) == 3


class TestFifoTimer:
    def test_fifo(self):
        from libav_tpu.avutil.fifo import Fifo
        f = Fifo()
        for i in range(5):
            f.write(i)
        assert f.size() == 5
        assert f.read() == 0
        assert f.peek() == 1
        assert len(f.drain()) == 4
        assert f.size() == 0

    def test_timer(self):
        from libav_tpu.avutil import timer
        timer.reset()
        with timer.timer("unit"):
            sum(range(1000))
        rep = timer.report()
        assert "unit" in rep


class TestTools:
    def test_pktdumper(self, tmp_path, capsys):
        from libav_tpu.tools import pktdumper
        from tests.test_mjpeg import synth_frame, encode
        p = tmp_path / "x.jpg"
        p.write_bytes(encode(synth_frame(32, 32), 90))
        assert pktdumper.main([str(p)]) == 0
        out = capsys.readouterr().out
        assert "pkt 00000" in out and "crc=0x" in out

    def test_avprobe_show_frames(self, tmp_path):
        import io

        from libav_tpu.tools import avprobe
        from tests.test_mjpeg import synth_frame, encode
        p = tmp_path / "x.jpg"
        p.write_bytes(encode(synth_frame(32, 32), 90))
        buf = io.StringIO()
        assert avprobe.probe(str(p), show_format=False, show_streams=False,
                             out=buf, show_frames=True) == 0
        out = buf.getvalue()
        assert "[frames.frame]" in out
        assert "media_type=video" in out and "pict_type=I" in out
        assert "width=32" in out and "pix_fmt=yuvj420p" in out

    def test_avprobe_show_frames_audio(self, tmp_path):
        import io

        import numpy as np

        from libav_tpu.avutil.frame import Frame
        from libav_tpu.codecs import CodecParameters, find_encoder
        from libav_tpu.formats import FormatContext
        from libav_tpu.tools import avprobe

        par = CodecParameters(codec_type=1, codec_id="pcm_s16le",
                              sample_rate=8000, channels=1,
                              sample_fmt="s16")
        enc = find_encoder("pcm_s16le")(par).open()
        fr = Frame(format="s16", nb_samples=256, sample_rate=8000,
                   channels=1, pts=0)
        fr.planes = [np.zeros((1, 256), np.int16)]
        p = tmp_path / "a.wav"
        oc = FormatContext.open_output(str(p), "wav")
        oc.new_stream(par)
        oc.write_header()
        enc.send_frame(fr)
        enc.send_frame(None)
        for pk in enc._pump():
            oc.write_packet(pk)
        oc.write_trailer()
        buf = io.StringIO()
        assert avprobe.probe(str(p), show_format=False, show_streams=False,
                             out=buf, show_frames=True) == 0
        out = buf.getvalue()
        assert "media_type=audio" in out and "nb_samples=256" in out

    def test_avplay_null(self, tmp_path):
        from libav_tpu.tools import avplay
        from tests.test_mjpeg import synth_frame, encode
        p = tmp_path / "x.jpg"
        p.write_bytes(encode(synth_frame(32, 32), 90))
        assert avplay.play(str(p), vo="null", max_frames=1) == 0


class TestFaultInjectionRound1b:
    """Trasher sweep over the newer paths: Matroska demux, B-frame
    MPEG-2, progressive JPEG, 5.1 AC-3, multi-ref H.264."""

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_trashed_matroska(self, seed, tmp_path):
        from tests.test_matroska import mux_mkv
        from libav_tpu.formats import FormatContext
        path, _ = mux_mkv(tmp_path, "mpeg4")
        data = trash(open(path, "rb").read(), count=10, seed=seed,
                     keep_prefix=4)
        p2 = tmp_path / "trash.mkv"
        p2.write_bytes(data)
        try:
            ic = FormatContext.open_input(str(p2))
            for _ in ic.packets():
                pass
        except AVError:
            pass

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_trashed_b_frames(self, seed):
        from libav_tpu.codecs.api import (CodecParameters, MediaType,
                                          find_decoder, find_encoder)
        par = CodecParameters(codec_type=MediaType.VIDEO,
                              codec_id="mpeg2video", width=48, height=32,
                              pix_fmt="yuv420p")
        enc = find_encoder("mpeg2video")(par)
        enc.set_opt("qscale", 4)
        enc.set_opt("b_frames", 2)
        pkts = enc.encode_all([vsynth_frame(48, 32, t) for t in range(5)])
        dec = find_decoder("mpeg2video")(
            CodecParameters(codec_type=MediaType.VIDEO,
                            codec_id="mpeg2video"))
        dec.open()
        for p in pkts:
            try:
                dec.send_packet(Packet(data=trash(p.data, 8, seed,
                                                  keep_prefix=8)))
                dec._pump()
            except AVError:
                pass

    @pytest.mark.parametrize("seed", [1, 2])
    def test_trashed_progressive_jpeg(self, seed):
        import io
        PIL = pytest.importorskip("PIL.Image")
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.mjpeg import MJPEGDecoder
        g = (np.arange(48 * 48) % 256).astype(np.uint8).reshape(48, 48)
        buf = io.BytesIO()
        PIL.fromarray(g, "L").save(buf, "JPEG", quality=85,
                                   progressive=True)
        dec = MJPEGDecoder(CodecParameters(codec_type=MediaType.VIDEO,
                                           codec_id="mjpeg"))
        dec.open()
        try:
            dec.decode_jpeg(trash(buf.getvalue(), 10, seed, keep_prefix=2))
        except AVError:
            pass

    @pytest.mark.parametrize("seed", [1, 2])
    def test_trashed_ac3_51(self, seed):
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs.ac3 import AC3Encoder, AC3Decoder
        from libav_tpu.avutil.frame import Frame
        rate = 48000
        f = Frame(nb_samples=1536, sample_rate=rate, format="fltp",
                  channels=6)
        rng = np.random.default_rng(0)
        f.planes = [rng.standard_normal(1536).astype(np.float32) * 0.1
                    for _ in range(6)]
        par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="ac3",
                              sample_rate=rate, channels=6,
                              sample_fmt="fltp")
        pkts = AC3Encoder(par).encode_all([f])
        dec = AC3Decoder(CodecParameters(codec_type=MediaType.AUDIO,
                                         codec_id="ac3"))
        dec.open()
        for p in pkts:
            try:
                dec.send_packet(Packet(data=trash(p.data, 10, seed,
                                                  keep_prefix=8)))
                dec._pump()
            except AVError:
                pass


class TestAvplayAV:
    """avplay A/V sync path: audio-master clock (pacing sink), video
    delayed/dropped against it (tools/avplay.py, reference avplay.c
    compute_target_delay)."""

    def test_av_sync(self, tmp_path):
        import numpy as np
        from libav_tpu.tools import avplay
        from libav_tpu.tools import avconv
        from tests.fate_util import write_y4m, write_wav48
        y4m = str(tmp_path / "in.y4m")
        wav = str(tmp_path / "in.wav")
        write_y4m(y4m, 64, 48, 13)
        write_wav48(wav, seconds=0.6)
        avi = str(tmp_path / "av.avi")
        rc = avconv.main(["-y", "-i", y4m, "-i", wav,
                          "-c:v", "mpeg1video", "-c:a", "mp2",
                          "-map", "0:v", "-map", "1:a", avi])
        assert rc == 0
        pcm = str(tmp_path / "out.pcm")
        p = avplay.Player(avi, vo="null", ao="file", ao_path=pcm,
                          duration=0.45)
        assert p.run() == 0
        data = np.fromfile(pcm, "<i2")
        assert data.size > 4000          # audio actually played
        assert np.abs(data.astype(np.float64)).mean() > 100


class TestSharedConcealment:
    """Shared MB-command concealment for the mpegvideo family
    (codecs/er.py; reference error_resilience.c): truncating a P
    frame's tail must conceal the missing MBs from the previous
    reference at guessed MVs, keeping a PSNR floor vs the clean
    decode — and stay deterministic."""

    @staticmethod
    def _psnr(a, b):
        import numpy as np
        d = np.asarray(a).astype(float) - np.asarray(b).astype(float)
        mse = (d * d).mean()
        return 99.0 if mse < 1e-9 else 10 * np.log10(255 * 255 / mse)

    def _stream(self, codec):
        import numpy as np
        from libav_tpu.avutil.frame import Frame
        from libav_tpu.codecs import find_encoder
        from libav_tpu.codecs.api import CodecParameters, MediaType
        w, h, n = 96, 64, 5
        yy, xx = np.mgrid[0:h, 0:w]
        frames = []
        for t in range(n):
            # smooth gradient + small moving block: frame-repeat
            # concealment stays high-PSNR, motion stays codable
            y = ((xx + yy) % 200 + 20).astype(np.uint8)
            y[10 + 2 * t:26 + 2 * t, 20 + 2 * t:36 + 2 * t] = 220
            f = Frame(width=w, height=h, format="yuv420p")
            f.planes = [y,
                        np.full((h // 2, w // 2), 120, np.uint8),
                        np.full((h // 2, w // 2), 130, np.uint8)]
            f.pts = t
            frames.append(f)
        enc = find_encoder(codec)(CodecParameters(
            codec_type=MediaType.VIDEO, codec_id=codec, width=w,
            height=h))
        enc.set_opt("gop_size", n)
        return enc.encode_all(frames)

    @pytest.mark.parametrize("codec", ["mpeg1video", "mpeg2video",
                                       "mpeg4"])
    def test_psnr_floor(self, codec):
        from libav_tpu.avutil.frame import Packet
        from libav_tpu.codecs import find_decoder
        from libav_tpu.codecs.api import CodecParameters, MediaType
        pkts = self._stream(codec)

        def dec_all(datas):
            d = find_decoder(codec)(CodecParameters(
                codec_type=MediaType.VIDEO, codec_id=codec))
            return d.decode_all([Packet(data=x, pts=i)
                                 for i, x in enumerate(datas)])

        clean = dec_all([bytes(p.data) for p in pkts])
        bad = [bytes(p.data) for p in pkts]
        b = bytearray(bad[2])
        b[-16:] = b"\x00" * 16
        bad[2] = bytes(b)
        out = dec_all(bad)
        assert len(out) == len(clean)
        for c, o in zip(clean, out):
            p = self._psnr(c.to_host().planes[0], o.to_host().planes[0])
            assert p > 20.0, f"{codec}: concealment floor {p:.1f} dB"
        out2 = dec_all(bad)
        import numpy as np
        for a, b2 in zip(out, out2):
            np.testing.assert_array_equal(
                np.asarray(a.to_host().planes[0]),
                np.asarray(b2.to_host().planes[0]))


class TestFilterBatch:
    """Round-3 filter batch (filters/vf.py): boxblur vs a literal
    transcription of the reference blur(); behavior smoke tests for the
    rest (drawbox/fade/negate/lutyuv are cross-validated bit-exact in
    test_fate_cross.py)."""

    @staticmethod
    def _frame(w=48, h=32, seed=0):
        import numpy as np
        from libav_tpu.avutil.frame import Frame
        rng = np.random.default_rng(seed)
        f = Frame(width=w, height=h, format="yuv420p")
        f.planes = [rng.integers(0, 256, (h, w)).astype(np.uint8),
                    rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
                    rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)]
        f.pts = 0
        return f

    def test_boxblur_matches_literal(self):
        import numpy as np
        from libav_tpu.filters.vf import _boxblur_1d

        def literal(src, radius):
            # vf_boxblur.c blur() transcription
            length = radius * 2 + 1
            inv = ((1 << 16) + length // 2) // length
            ln = len(src)
            dst = np.zeros(ln, np.int64)
            s = 0
            for x in range(radius):
                s += int(src[x]) << 1
            s += int(src[radius])
            x = 0
            while x <= radius:
                s += int(src[radius + x]) - int(src[radius - x])
                dst[x] = (s * inv + (1 << 15)) >> 16
                x += 1
            while x < ln - radius:
                s += int(src[radius + x]) - int(src[x - radius - 1])
                dst[x] = (s * inv + (1 << 15)) >> 16
                x += 1
            while x < ln:
                s += int(src[2 * ln - radius - x - 1]) - \
                    int(src[x - radius - 1])
                dst[x] = (s * inv + (1 << 15)) >> 16
                x += 1
            return dst.astype(np.uint8)

        rng = np.random.default_rng(3)
        for radius in (1, 2, 5):
            a = rng.integers(0, 256, 64).astype(np.uint8)
            np.testing.assert_array_equal(
                _boxblur_1d(a[None, :], radius)[0], literal(a, radius))

    def test_smoke(self):
        import numpy as np
        from libav_tpu.filters.graph import get_filter
        f = self._frame()
        for name, args in [("copy", ""), ("shuffleplanes", "0:2:1"),
                           ("settb", "1/90000"), ("showinfo", ""),
                           ("blackframe", ""), ("boxblur", "2:1"),
                           ("noformat", "yuv420p")]:
            flt = get_filter(name)(args)
            out = flt.push(f)
            assert len(out) == 1, name
        # trim drops outside the window
        t = get_filter("trim")("1:3")
        kept = []
        for i in range(5):
            fr = self._frame(seed=i)
            kept += t.push(fr)
        assert len(kept) == 2
        # select every other frame
        s = get_filter("select")("mod(n,2)")
        kept = []
        for i in range(6):
            kept += s.push(self._frame(seed=i))
        assert len(kept) == 3
        # fieldorder swaps when flagged interlaced
        fo = get_filter("fieldorder")("0")
        fr = self._frame()
        fr.interlaced_frame = True
        fr.top_field_first = True
        out = fo.push(fr)[0]
        assert not out.top_field_first or out is fr


class TestFilterDag:
    """Filter-graph DAG support (filters/graph.py _parse_dag/_run_dag,
    reference graphparser.c labeled-pad semantics) plus the round-3b
    filter batch (hqdn3d/unsharp/gradfun/interlace/split; unsharp and
    gradfun are cross-validated bit-exact in test_fate_cross.py)."""

    @staticmethod
    def _frame(t=0, w=64, h=48):
        import numpy as np
        from libav_tpu.avutil.frame import Frame
        f = Frame(width=w, height=h, format="yuv420p", pts=t)
        y = (np.arange(h * w).reshape(h, w) % 200 + t * 3).astype(np.uint8)
        f.planes = [y, np.full((h // 2, w // 2), 100, np.uint8),
                    np.full((h // 2, w // 2), 140, np.uint8)]
        f.time_base = None
        return f

    def test_split_overlay_dag(self):
        import numpy as np
        from libav_tpu.filters.graph import FilterGraph
        g = FilterGraph(
            "split[a][b];[a]crop=16:16:0:0[c];[b][c]overlay=x=40:y=30")
        outs = []
        for t in range(3):
            outs += g.push(self._frame(t))
        outs += g.push_eof()
        assert len(outs) == 3
        src = self._frame(0)
        exp = np.asarray(src.planes[0]).copy()
        exp[30:46, 40:56] = np.asarray(src.planes[0])[0:16, 0:16]
        np.testing.assert_array_equal(outs[0].planes[0], exp)

    def test_dag_linear_equivalence(self):
        import numpy as np
        from libav_tpu.filters.graph import FilterGraph
        a = FilterGraph("hflip,vflip")
        b = FilterGraph("[in]hflip[m];[m]vflip[out]")
        fa = a.push(self._frame(0))[0]
        fb = b.push(self._frame(0))[0]
        np.testing.assert_array_equal(fa.planes[0], fb.planes[0])

    def test_dag_errors(self):
        import pytest
        from libav_tpu.avutil.error import AVError
        from libav_tpu.filters.graph import FilterGraph
        with pytest.raises(AVError):
            FilterGraph("[a]hflip[b];[c]vflip[d]")  # two open inputs

    def test_interlace_pairs(self):
        from libav_tpu.filters.graph import FilterGraph
        g = FilterGraph("interlace")
        outs = []
        for t in range(6):
            outs += g.push(self._frame(t))
        assert len(outs) == 3
        assert all(f.interlaced_frame and f.top_field_first for f in outs)
        assert [f.pts for f in outs] == [0, 1, 2]

    def test_interlace_weave(self):
        import numpy as np
        from libav_tpu.filters.graph import FilterGraph
        g = FilterGraph("interlace=lowpass=0")
        f0, f1 = self._frame(0), self._frame(1)
        out = (g.push(f0) + g.push(f1))[0]
        y = np.asarray(out.planes[0])
        np.testing.assert_array_equal(y[0::2], np.asarray(f0.planes[0])[0::2])
        np.testing.assert_array_equal(y[1::2], np.asarray(f1.planes[0])[1::2])

    def test_hqdn3d_static_converges(self):
        # a static scene must stay (nearly) unchanged and temporally
        # stable: repeated frames converge to a fixed point
        import numpy as np
        from libav_tpu.filters.graph import FilterGraph
        g = FilterGraph("hqdn3d")
        last = None
        for _ in range(4):
            last2 = g.push(self._frame(0))[0]
            if last is not None:
                diff = np.abs(last2.planes[0].astype(int) -
                              last.planes[0].astype(int))
                assert diff.max() <= 1
            last = last2
        base = np.asarray(self._frame(0).planes[0]).astype(int)
        assert np.abs(last.planes[0].astype(int) - base).max() <= 2

    def test_hqdn3d_denoises(self):
        import numpy as np
        from libav_tpu.filters.graph import FilterGraph
        rng = np.random.default_rng(7)
        g = FilterGraph("hqdn3d=8:6:12:9")
        outs = []
        for t in range(6):
            f = self._frame(0)
            noise = rng.integers(-6, 7, f.planes[0].shape)
            f.planes[0] = np.clip(f.planes[0].astype(int) + noise,
                                  0, 255).astype(np.uint8)
            outs.append((f, g.push(f)[0]))
        base = np.asarray(self._frame(0).planes[0]).astype(float)
        err_in = np.abs(outs[-1][0].planes[0] - base).mean()
        err_out = np.abs(outs[-1][1].planes[0] - base).mean()
        assert err_out < err_in * 0.7

    def test_unsharp_sharpens_blur_blurs(self):
        import numpy as np
        from libav_tpu.avutil.frame import Frame
        from libav_tpu.filters.graph import FilterGraph

        def noisy():
            rng = np.random.default_rng(11)
            f = Frame(width=64, height=48, format="yuv420p", pts=0)
            f.planes = [rng.integers(0, 256, (48, 64)).astype(np.uint8),
                        np.full((24, 32), 128, np.uint8),
                        np.full((24, 32), 128, np.uint8)]
            return f

        tv = lambda a: np.abs(np.diff(np.asarray(a).astype(int),
                                      axis=1)).sum()
        base = tv(noisy().planes[0])
        sharp = FilterGraph("unsharp=5:5:1.5").push(noisy())[0]
        blur = FilterGraph("unsharp=5:5:-1.5").push(noisy())[0]
        assert tv(sharp.planes[0]) > base
        assert tv(blur.planes[0]) < base

    def test_gradfun_debands(self):
        import numpy as np
        from libav_tpu.avutil.frame import Frame
        from libav_tpu.filters.graph import FilterGraph
        h, w = 96, 128
        y = np.repeat(np.arange(w) // 16, 1).astype(np.uint8) * 8 + 60
        f = Frame(width=w, height=h, format="yuv420p", pts=0)
        f.planes = [np.tile(y, (h, 1)),
                    np.full((h // 2, w // 2), 128, np.uint8),
                    np.full((h // 2, w // 2), 128, np.uint8)]
        out = FilterGraph("gradfun=3.0:16").push(f)[0]
        # the hard 8-step banding must be softened in the interior
        # (borders keep the unsmoothed dc; dither adds +-1)
        mid = out.planes[0][40:56, 24:104].astype(int)
        steps = np.abs(np.diff(mid, axis=1)).max()
        assert steps < 8


class TestMeCmp:
    """me_cmp metrics (ops/mecmp.py, reference me_cmp.c): the einsum
    Hadamard SATD matches a literal transcription of the reference
    butterfly network; sad/sse match numpy; -mbcmp satd streams stay
    reference-decodable (cross-checked in encoder tests)."""

    def test_satd_vs_butterflies(self):
        import numpy as np
        from libav_tpu.ops import mecmp
        rng = np.random.default_rng(1)
        a = rng.integers(0, 256, (16, 8, 8)).astype(np.uint8)
        b = rng.integers(0, 256, (16, 8, 8)).astype(np.uint8)
        got = list(np.asarray(mecmp.satd8(a, b)))
        exp = [mecmp.hadamard8_diff_ref(a[i], b[i]) for i in range(16)]
        assert got == exp

    def test_satd16_quadrants(self):
        import numpy as np
        from libav_tpu.ops import mecmp
        rng = np.random.default_rng(2)
        a = rng.integers(0, 256, (4, 16, 16)).astype(np.uint8)
        b = rng.integers(0, 256, (4, 16, 16)).astype(np.uint8)
        got = list(np.asarray(mecmp.satd16(a, b)))
        exp = [sum(mecmp.hadamard8_diff_ref(a[i][y:y + 8, x:x + 8],
                                            b[i][y:y + 8, x:x + 8])
                   for y in (0, 8) for x in (0, 8)) for i in range(4)]
        assert got == exp

    def test_sad_sse(self):
        import numpy as np
        from libav_tpu.ops import mecmp
        rng = np.random.default_rng(3)
        a = rng.integers(0, 256, (2, 16, 16)).astype(np.uint8)
        b = rng.integers(0, 256, (2, 16, 16)).astype(np.uint8)
        assert int(mecmp.sad(a, b)[0]) == \
            int(np.abs(a[0].astype(int) - b[0]).sum())
        assert int(mecmp.sse(a, b)[1]) == \
            int(((a[1].astype(int) - b[1]) ** 2).sum())


class TestAudioFilters:
    """Audio filter batch (filters/af.py): asetpts/asettb/ashowinfo/
    asplit/afifo/asyncts/aformat + DAG amix (multi-input mixing)."""

    @staticmethod
    def _afr(t, n=256, rate=8000):
        import numpy as np
        from libav_tpu.avutil.frame import Frame
        f = Frame(format="s16", nb_samples=n, sample_rate=rate,
                  channels=1, pts=t)
        f.planes = [np.arange(n, dtype=np.int16) + t]
        return f

    def test_asetpts(self):
        from libav_tpu.filters.graph import FilterGraph
        assert FilterGraph("asetpts=PTS*2").push(self._afr(5))[0].pts \
            == 10

    def test_asplit_amix_dag(self):
        import numpy as np
        from libav_tpu.filters.graph import FilterGraph
        g = FilterGraph("asplit[a][b];[a]anull[x];[b]anull[y];"
                        "[x][y]amix")
        outs = g.push(self._afr(0))
        assert len(outs) == 1
        np.testing.assert_array_equal(outs[0].planes[0],
                                      self._afr(0).planes[0])

    def test_asyncts_gap(self):
        from libav_tpu.filters.graph import FilterGraph
        g = FilterGraph("asyncts")
        g.push(self._afr(0))
        out = g.push(self._afr(400))      # 144-sample gap -> silence
        assert out[0].nb_samples == 400 and out[0].pts == 256

    def test_asyncts_overlap(self):
        from libav_tpu.filters.graph import FilterGraph
        g = FilterGraph("asyncts=min_delta=4")
        g.push(self._afr(0))
        out = g.push(self._afr(200))      # 56-sample overlap -> drop
        assert out[0].nb_samples == 200 and out[0].pts == 256

    def test_aformat_convert(self):
        from libav_tpu.filters.graph import FilterGraph
        out = FilterGraph("aformat=sample_fmts=fltp").push(self._afr(0))
        assert out[0].format == "fltp"

    def test_ashowinfo(self, capsys):
        from libav_tpu.filters.graph import FilterGraph
        FilterGraph("ashowinfo").push(self._afr(0))
        assert "checksums" in capsys.readouterr().err


class TestPropFilters:
    """Metadata/plumbing filter batch (filters/vf.py + af.py):
    setdar/setsar (vf_aspect.c), fifo, nullsink/anullsink, pixdesctest,
    hwupload/hwdownload, join (af_join.c), resample alias."""

    @staticmethod
    def _vfr(i=0):
        import numpy as np
        from libav_tpu.avutil.frame import Frame
        from libav_tpu.avutil.rational import Rational
        f = Frame(width=32, height=24, format="yuv420p", pts=i)
        f.time_base = Rational(1, 25)
        f.planes = [np.full((24, 32), 100 + i, np.uint8),
                    np.full((12, 16), 128, np.uint8),
                    np.full((12, 16), 128, np.uint8)]
        return f

    @staticmethod
    def _afr(i=0):
        import numpy as np
        from libav_tpu.avutil.frame import Frame
        f = Frame(format="s16", nb_samples=100, sample_rate=8000,
                  channels=1, pts=i * 100)
        f.planes = [np.arange(100, dtype=np.int16) + i * 1000]
        return f

    def test_setdar(self):
        from libav_tpu.filters.graph import FilterGraph
        # DAR 16/9 on 32x24 -> SAR = 16*24 / (9*32) = 4/3
        o = FilterGraph("setdar=dar=16/9").push(self._vfr())[0]
        assert (o.sample_aspect_ratio.num, o.sample_aspect_ratio.den) \
            == (4, 3)

    def test_setsar(self):
        from libav_tpu.filters.graph import FilterGraph
        o = FilterGraph("setsar=sar=3/2").push(self._vfr())[0]
        assert (o.sample_aspect_ratio.num, o.sample_aspect_ratio.den) \
            == (3, 2)

    def test_fifo_pixdesctest_identity(self):
        import numpy as np
        from libav_tpu.filters.graph import FilterGraph
        o = FilterGraph("fifo,pixdesctest").push(self._vfr())[0]
        np.testing.assert_array_equal(np.asarray(o.planes[0]),
                                      np.asarray(self._vfr().planes[0]))

    def test_hwupload_download_roundtrip(self):
        import numpy as np
        from libav_tpu.filters.graph import FilterGraph
        o = FilterGraph("hwupload,hwdownload").push(self._vfr())[0]
        np.testing.assert_array_equal(np.asarray(o.planes[0]),
                                      np.asarray(self._vfr().planes[0]))

    def test_nullsink(self):
        from libav_tpu.filters.graph import FilterGraph
        g = FilterGraph("nullsink")
        assert g.push(self._vfr()) == [] and g.push_eof() == []

    def test_join(self):
        import numpy as np
        from libav_tpu.filters.graph import FilterGraph
        g = FilterGraph("join=inputs=2")
        g.filters[0].push_secondary(self._afr(1))
        o = g.push(self._afr(0))[0]
        p = np.asarray(o.planes[0]).reshape(-1, 2)
        assert o.channels == 2 and p[0, 0] == 0 and p[0, 1] == 1000

    def test_resample_alias(self):
        from libav_tpu.filters.graph import FilterGraph
        o = FilterGraph("resample").push(self._afr())[0]
        assert o.sample_rate == 8000 and o.nb_samples == 100


class TestSourceAndSplitFilters:
    """channelsplit (per-pad routing), movie source, nullsrc/anullsrc,
    buffer/abuffer/hwmap pass-throughs."""

    def test_channelsplit_roundtrip(self):
        import numpy as np
        from libav_tpu.avutil.frame import Frame
        from libav_tpu.filters.graph import FilterGraph
        f = Frame(format="s16", nb_samples=64, sample_rate=8000,
                  channels=2, pts=0)
        inter = np.arange(128, dtype=np.int16)
        f.planes = [inter.copy()]
        g = FilterGraph("channelsplit[l][r];[l]anull[x];[r]anull[y];"
                        "[x][y]join")
        o = g.push(f)[0]
        assert o.channels == 2
        np.testing.assert_array_equal(
            np.asarray(o.planes[0]).ravel(), inter)

    def test_channelsplit_pads(self):
        import numpy as np
        from libav_tpu.avutil.frame import Frame
        from libav_tpu.filters.graph import get_filter
        f = Frame(format="s16", nb_samples=4, sample_rate=8000,
                  channels=2, pts=0)
        f.planes = [np.arange(8, dtype=np.int16)]
        outs = get_filter("channelsplit")("").filter_frame(f)
        assert len(outs) == 2
        np.testing.assert_array_equal(np.asarray(outs[0].planes[0]),
                                      [0, 2, 4, 6])
        np.testing.assert_array_equal(np.asarray(outs[1].planes[0]),
                                      [1, 3, 5, 7])

    def test_movie_source(self, tmp_path):
        import numpy as np
        from libav_tpu.filters.graph import get_filter
        y4mf = str(tmp_path / "m.y4m")
        with open(y4mf, "wb") as fh:
            fh.write(b"YUV4MPEG2 W32 H16 F25:1 Ip A1:1 C420jpeg\n")
            for i in range(3):
                fh.write(b"FRAME\n")
                fh.write(bytes([i * 40] * (32 * 16)))
                fh.write(bytes([128] * (16 * 8) * 2))
        frames = list(get_filter("movie")(
            f"filename={y4mf}").generate())
        assert len(frames) == 3 and frames[0].width == 32
        assert int(np.asarray(frames[1].planes[0])[0, 0]) == 40
        assert len(list(get_filter("movie")(
            f"filename={y4mf}:loop=2").generate())) == 6

    def test_nullsrc_anullsrc(self):
        import numpy as np
        from libav_tpu.filters.graph import get_filter
        f = next(get_filter("nullsrc")("size=32x32").generate())
        assert f.width == 32 and int(np.asarray(f.planes[0]).sum()) == 0
        a = next(get_filter("anullsrc")("").generate())
        assert a.channels == 2 and a.nb_samples == 1024
        assert int(np.abs(np.asarray(a.planes[0])).sum()) == 0

    def test_buffer_hwmap_passthrough(self):
        import numpy as np
        from libav_tpu.avutil.frame import Frame
        from libav_tpu.filters.graph import FilterGraph
        f = Frame(width=8, height=8, format="yuv420p", pts=0)
        f.planes = [np.full((8, 8), 7, np.uint8),
                    np.full((4, 4), 128, np.uint8),
                    np.full((4, 4), 128, np.uint8)]
        o = FilterGraph("buffer,hwmap,buffersink").push(f)[0]
        np.testing.assert_array_equal(np.asarray(o.planes[0]),
                                      np.asarray(f.planes[0]))
