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
