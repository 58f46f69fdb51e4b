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
