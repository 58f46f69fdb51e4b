"""AC-3 enc->dec round trip (config 5 audio path)."""

import numpy as np
import pytest

from libav_tpu.avutil.frame import Frame, Packet
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.codecs.ac3 import AC3Decoder, AC3Encoder
from libav_tpu.filters.src import audiogen


def make_frame(n, rate=48000, channels=2, freq=440.0):
    t = np.arange(n) / rate
    f = Frame(nb_samples=n, sample_rate=rate, format="fltp",
              channels=channels, channel_layout=3 if channels == 2 else 4)
    f.planes = [(0.5 * np.sin(2 * np.pi * freq * (1 + 0.1 * c) * t)
                 ).astype(np.float32) for c in range(channels)]
    return f


def roundtrip(frame, bitrate=192):
    par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="ac3",
                          sample_rate=frame.sample_rate,
                          channels=frame.channels, sample_fmt="fltp")
    enc = AC3Encoder(par)
    enc.set_opt("bitrate_kbps", bitrate)
    pkts = enc.encode_all([frame])
    assert pkts, "no packets produced"
    dec = AC3Decoder(CodecParameters(codec_type=MediaType.AUDIO,
                                     codec_id="ac3"))
    out = dec.decode_all([Packet(data=p.data, pts=p.pts) for p in pkts])
    assert out
    pcm = np.concatenate([np.stack([np.asarray(pl) for pl in f.planes])
                          for f in out], axis=1)
    return pkts, pcm


def snr_db(ref, got):
    e = ref - got
    return 10 * np.log10((ref ** 2).mean() / max((e ** 2).mean(), 1e-12))


class TestAC3:
    def test_frame_structure(self):
        f = make_frame(1536 * 2)
        pkts, _ = roundtrip(f)
        assert len(pkts) == 2
        for p in pkts:
            assert p.data[:2] == b"\x0b\x77"
            assert len(p.data) == 768   # 192 kbps @ 48 kHz

    def test_sine_roundtrip_snr(self):
        n = 1536 * 4
        f = make_frame(n)
        _, pcm = roundtrip(f)
        # TDAC delay: decoder output lags by 256 samples and the first
        # block has no overlap partner
        ref = np.stack([np.asarray(p) for p in f.planes])
        got = pcm[:, 256:n]
        refc = ref[:, :n - 256]
        s = snr_db(refc[:, 512:-512], got[:, 512:-512])
        assert s > 20, f"SNR {s:.1f} dB"

    def test_multitone(self):
        src = audiogen(1536 * 3, 48000, 2)
        par_f = Frame(nb_samples=src.nb_samples, sample_rate=48000,
                      format="fltp", channels=2, channel_layout=3)
        par_f.planes = src.planes
        _, pcm = roundtrip(par_f)
        ref = np.stack([np.asarray(p) for p in src.planes])
        got = pcm[:, 256:src.nb_samples]
        refc = ref[:, :src.nb_samples - 256]
        s = snr_db(refc[:, 512:-512], got[:, 512:-512])
        assert s > 18, f"SNR {s:.1f} dB"

    def test_mono(self):
        f = make_frame(1536, channels=1)
        pkts, pcm = roundtrip(f)
        assert pcm.shape[0] == 1

    def test_bitrate_sizes(self):
        f = make_frame(1536)
        for br, size in ((96, 384), (192, 768), (384, 1536)):
            par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="ac3",
                                  sample_rate=48000, channels=2,
                                  sample_fmt="fltp")
            enc = AC3Encoder(par)
            enc.set_opt("bitrate_kbps", br)
            pkts = enc.encode_all([f])
            assert len(pkts[0].data) == size


class Test51:
    def test_5_1_round_trip(self):
        """5.1 (acmod 3/2 + LFE) enc->dec: per-channel SNR and channel
        identity (each channel carries its own tone)."""
        from libav_tpu.codecs.ac3 import AC3Encoder, AC3Decoder
        from libav_tpu.codecs.api import CodecParameters, MediaType
        from libav_tpu.avutil.frame import Frame, Packet
        rate = 48000
        n = 1536 * 3
        t = np.arange(n) / rate
        freqs = [300, 440, 600, 60, 800, 1000]   # FL FR FC LFE BL BR
        chans = [0.3 * np.sin(2 * np.pi * f * t) for f in freqs]
        f = Frame(nb_samples=n, sample_rate=rate, format="fltp", channels=6)
        f.planes = [c.astype(np.float32) for c in chans]
        par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="ac3",
                              sample_rate=rate, channels=6,
                              sample_fmt="fltp")
        enc = AC3Encoder(par)
        pkts = enc.encode_all([f])
        assert pkts
        dec = AC3Decoder(CodecParameters(codec_type=MediaType.AUDIO,
                                         codec_id="ac3"))
        out = dec.decode_all([Packet(data=p.data, pts=p.pts) for p in pkts])
        assert out[0].channels == 6
        y = [np.concatenate([np.asarray(o.planes[c]) for o in out])
             for c in range(6)]
        # AC-3 MDCT latency: 256 samples
        for c, src in enumerate(chans):
            m = min(len(y[c]), n) - 256
            err = y[c][256:256 + m] - src[:m]
            snr = 10 * np.log10((src[:m] ** 2).sum() /
                                max((err ** 2).sum(), 1e-12))
            # LFE is band-limited to ~120 Hz (7 coefficients) but its
            # 60 Hz tone fits; all channels must reconstruct
            assert snr > 14, f"ch{c} ({freqs[c]}Hz) snr {snr:.1f}"
            # channel identity: the neighbour's tone must not dominate
            spec = np.abs(np.fft.rfft(y[c][256:256 + m]))
            own = spec[int(freqs[c] * m / rate)]
            other = spec[int(freqs[(c + 1) % 6] * m / rate)]
            assert own > 5 * other, f"ch{c} crosstalk"
