"""AAC-LC enc->dec round trip (config 5 audio path)."""

import numpy as np
import pytest

from libav_tpu.avutil.frame import Frame, Packet
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.codecs.aac import AACDecoder, AACEncoder

from tests.test_ac3 import make_frame, snr_db


def roundtrip(frame, quality=3):
    par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="aac",
                          sample_rate=frame.sample_rate,
                          channels=frame.channels, sample_fmt="fltp")
    enc = AACEncoder(par)
    enc.set_opt("quality", quality)
    pkts = enc.encode_all([frame])
    assert pkts
    dec = AACDecoder(CodecParameters(codec_type=MediaType.AUDIO,
                                     codec_id="aac",
                                     sample_rate=frame.sample_rate))
    out = dec.decode_all([Packet(data=p.data, pts=p.pts) for p in pkts])
    pcm = np.concatenate([np.stack([np.asarray(pl) for pl in f.planes])
                          for f in out], axis=1)
    return pkts, pcm


class TestAAC:
    def test_adts_structure(self):
        f = make_frame(1024 * 3, rate=48000)
        pkts, _ = roundtrip(f)
        assert len(pkts) == 3
        for p in pkts:
            assert p.data[0] == 0xFF and (p.data[1] & 0xF0) == 0xF0

    def test_sine_roundtrip(self):
        n = 1024 * 6
        f = make_frame(n, rate=48000)
        _, pcm = roundtrip(f, quality=1)
        ref = np.stack([np.asarray(p) for p in f.planes])
        # MDCT latency: one frame (1024 samples)
        got = pcm[:, 1024:n]
        refc = ref[:, :n - 1024]
        s = snr_db(refc[:, 1024:-1024], got[:, 1024:-1024])
        assert s > 20, f"SNR {s:.1f} dB"

    def test_mono_44k(self):
        f = make_frame(1024 * 4, rate=44100, channels=1)
        _, pcm = roundtrip(f, quality=1)
        assert pcm.shape[0] == 1
        ref = np.asarray(f.planes[0])
        got = pcm[0, 1024:1024 * 4]
        s = snr_db(ref[1024:1024 * 3 - 1024], got[1024:1024 * 2])
        assert s > 18, f"SNR {s:.1f}"

    def test_quality_ladder(self):
        n = 1024 * 4
        f = make_frame(n, rate=48000)
        _, hi = roundtrip(f, quality=1)
        pk_hi, _ = roundtrip(f, quality=1)
        pk_lo, _ = roundtrip(f, quality=9)
        assert sum(len(p.data) for p in pk_hi) > \
            sum(len(p.data) for p in pk_lo)


class TestShortWindows:
    def _roundtrip(self, x, rate=48000):
        from libav_tpu.avutil.frame import Frame, Packet
        from libav_tpu.codecs.aac import AACEncoder, AACDecoder
        from libav_tpu.codecs.api import CodecParameters, MediaType
        par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="aac",
                              sample_rate=rate, channels=1,
                              sample_fmt="fltp")
        f = Frame(nb_samples=x.shape[-1], sample_rate=rate, format="fltp",
                  channels=1)
        f.planes = [x.astype(np.float32)]
        enc = AACEncoder(par)
        pkts = enc.encode_all([f])
        dec = AACDecoder(CodecParameters(codec_type=MediaType.AUDIO,
                                         codec_id="aac"))
        out = dec.decode_all([Packet(data=p.data, pts=p.pts) for p in pkts])
        y = np.concatenate([np.asarray(o.planes[0]) for o in out])
        return pkts, y

    def test_transient_uses_eight_short(self):
        """A click mid-frame must trigger EIGHT_SHORT with LONG_START
        before and LONG_STOP after, and still reconstruct."""
        from libav_tpu.codecs.aac.dec import (parse_adts_header, decode_ics,
                                              EIGHT_SHORT, LONG_START,
                                              LONG_STOP, ONLY_LONG)
        from libav_tpu.bitstream import GetBits
        rate = 48000
        n = 1024 * 6
        t = np.arange(n) / rate
        x = 0.05 * np.sin(2 * np.pi * 220 * t)
        x[1024 * 3 + 500:1024 * 3 + 520] += 0.8      # click in frame 3
        pkts, y = self._roundtrip(x, rate)

        seqs = []
        for p in pkts:
            hdr = parse_adts_header(p.data)
            body = p.data[hdr[3]:hdr[2]]
            gb = GetBits(body)
            assert gb.get_bits(3) == 0       # SCE
            gb.get_bits(4)
            seq, shape, spec = decode_ics(gb, rate)[:3]
            seqs.append(seq)
        assert EIGHT_SHORT in seqs, seqs
        i = seqs.index(EIGHT_SHORT)
        assert seqs[i - 1] == LONG_START
        assert seqs[i + 1] == LONG_STOP
        # reconstruction (1024-sample MDCT latency)
        m = min(len(y) - 1024, n - 1024)
        err = y[1024:1024 + m] - x[:m]
        snr = 10 * np.log10((x[:m] ** 2).sum() / max((err ** 2).sum(), 1e-12))
        assert snr > 10, f"snr {snr:.1f}"

    def test_steady_tone_stays_long(self):
        from libav_tpu.codecs.aac.dec import parse_adts_header, decode_ics
        from libav_tpu.bitstream import GetBits
        rate = 48000
        t = np.arange(1024 * 4) / rate
        x = 0.3 * np.sin(2 * np.pi * 440 * t)
        pkts, y = self._roundtrip(x, rate)
        for p in pkts:
            hdr = parse_adts_header(p.data)
            gb = GetBits(p.data[hdr[3]:hdr[2]])
            gb.get_bits(3)
            gb.get_bits(4)
            seq = decode_ics(gb, rate)[0]
            assert seq == 0                  # ONLY_LONG
        m = len(x) - 1024
        err = y[1024:1024 + m] - x[:m]
        snr = 10 * np.log10((x[:m] ** 2).sum() / max((err ** 2).sum(), 1e-12))
        assert snr > 20, f"snr {snr:.1f}"


class TestMidSideStereo:
    def _roundtrip_stereo(self, l, r, rate=48000):
        from libav_tpu.avutil.frame import Frame, Packet
        from libav_tpu.codecs.aac import AACEncoder, AACDecoder
        from libav_tpu.codecs.api import CodecParameters, MediaType
        par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="aac",
                              sample_rate=rate, channels=2,
                              sample_fmt="fltp")
        f = Frame(nb_samples=l.shape[-1], sample_rate=rate, format="fltp",
                  channels=2)
        f.planes = [l.astype(np.float32), r.astype(np.float32)]
        enc = AACEncoder(par)
        enc.set_opt("quality", 1)
        pkts = enc.encode_all([f])
        dec = AACDecoder(CodecParameters(codec_type=MediaType.AUDIO,
                                         codec_id="aac"))
        out = dec.decode_all([Packet(data=p.data, pts=p.pts) for p in pkts])
        y = [np.concatenate([np.asarray(o.planes[c]) for o in out])
             for c in range(2)]
        return pkts, y

    @staticmethod
    def _cpe_common_bit(pkt_data, rate=48000):
        from libav_tpu.codecs.aac.dec import parse_adts_header
        from libav_tpu.bitstream import GetBits
        hdr = parse_adts_header(pkt_data)
        gb = GetBits(pkt_data[hdr[3]:hdr[2]])
        assert gb.get_bits(3) == 1       # CPE
        gb.get_bits(4)
        return gb.get_bits(1)

    def test_correlated_uses_ms(self):
        rate = 48000
        n = 1024 * 4
        t = np.arange(n) / rate
        base = 0.3 * np.sin(2 * np.pi * 440 * t)
        l = base * 1.0
        r = base * 0.92                  # nearly identical channels
        pkts, y = self._roundtrip_stereo(l, r)
        assert all(self._cpe_common_bit(p.data) == 1 for p in pkts)
        for c, src in ((0, l), (1, r)):
            m = n - 1024
            err = y[c][1024:1024 + m] - src[:m]
            snr = 10 * np.log10((src[:m] ** 2).sum() /
                                max((err ** 2).sum(), 1e-12))
            assert snr > 20, f"ch{c} snr {snr:.1f}"

    def test_independent_stays_lr(self):
        rate = 48000
        n = 1024 * 3
        rng = np.random.default_rng(0)
        t = np.arange(n) / rate
        l = 0.3 * np.sin(2 * np.pi * 440 * t)
        r = 0.3 * np.sin(2 * np.pi * 1313 * t + 1.0)
        pkts, y = self._roundtrip_stereo(l, r)
        assert all(self._cpe_common_bit(p.data) == 0 for p in pkts)


class TestPNS:
    """Perceptual noise substitution: noise bands parse (sections,
    9-bit-PCM + dpcm noise offsets) and synthesize at the signalled
    energy. Noise content is decoder-specific per spec 4.6.13, so the
    checks are structural/energetic, not sample-exact; the loudness
    calibration against the reference decoder chain is round-3 work."""

    def test_roundtrip_and_determinism(self):
        from libav_tpu.avutil.frame import Frame, Packet
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.codecs import find_decoder, find_encoder
        rng = np.random.RandomState(5)
        par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="aac",
                              sample_rate=48000, channels=1,
                              sample_fmt="fltp")
        f = Frame.alloc_audio(1024 * 4, 48000, "fltp", 1)
        f.planes[0][:] = (0.2 * rng.randn(1024 * 4)).astype(np.float32)
        f.pts = 0
        enc = find_encoder("aac")(par)
        enc.set_opt("pns", 1)
        pkts = enc.encode_all([f])
        # PNS saves bits vs the same content without it
        enc2 = find_encoder("aac")(par)
        base = enc2.encode_all([f])
        assert sum(len(p.data) for p in pkts) < \
            sum(len(p.data) for p in base)

        def run():
            dec = find_decoder("aac")(par).open()
            out = dec.decode_all([Packet(data=p.data, pts=i)
                                  for i, p in enumerate(pkts)])
            return np.concatenate([np.asarray(fr.to_host().planes[0])
                                   for fr in out])

        a, b = run(), run()
        # LCG noise state resets per decoder instance -> deterministic
        np.testing.assert_array_equal(a, b)
        assert 0.01 < a.std() < 1.0      # finite, plausible energy
