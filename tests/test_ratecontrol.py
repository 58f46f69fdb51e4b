"""Rate control tests (reference model: ratecontrol.c rc_eq + 2-pass)."""

import numpy as np
import pytest

from libav_tpu.avutil.rational import Rational
from libav_tpu.avutil.frame import Packet
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.codecs.mpeg12 import MPEG1Decoder, MPEG1Encoder
from libav_tpu.codecs.ratecontrol import RateControl, RateControlEntry

from tests.test_mpeg12 import vsynth_frame


class TestModel:
    def test_qscale_tracks_bitrate(self):
        rc = RateControl(400_000, Rational(25, 1))
        # simulate frames consistently overshooting -> qscale must rise
        q0 = rc.qscale_for_frame("P")
        for _ in range(20):
            q = rc.qscale_for_frame("P")
            rc.frame_done("P", bits_used=int(rc.bits_per_frame * 2.5),
                          qscale=q)
        q1 = rc.qscale_for_frame("P")
        assert q1 > q0

    def test_undershoot_lowers_qscale(self):
        rc = RateControl(400_000, Rational(25, 1))
        for _ in range(5):
            q = rc.qscale_for_frame("P")
            rc.frame_done("P", bits_used=int(rc.bits_per_frame * 3), qscale=q)
        q_hi = rc.qscale_for_frame("P")
        for _ in range(25):
            q = rc.qscale_for_frame("P")
            rc.frame_done("P", bits_used=int(rc.bits_per_frame * 0.2),
                          qscale=q)
        assert rc.qscale_for_frame("P") < q_hi

    def test_stats_log_roundtrip(self):
        rc = RateControl(300_000, Rational(25, 1))
        for t in ("I", "P", "P"):
            q = rc.qscale_for_frame(t)
            rc.frame_done(t, 10_000, q)
        log = rc.stats_log()
        entries = [RateControlEntry.parse(l) for l in log.strip().splitlines()]
        assert [e.pict_type for e in entries] == ["I", "P", "P"]
        rc2 = RateControl(300_000, Rational(25, 1))
        rc2.load_pass1(log)
        assert rc2.pass2_entries is not None


class TestEncoderIntegration:
    def test_bitrate_mode_adapts(self):
        par = CodecParameters(codec_type=MediaType.VIDEO,
                              codec_id="mpeg1video", width=64, height=48,
                              pix_fmt="yuv420p", framerate=Rational(25, 1))
        enc = par and MPEG1Encoder(par)
        enc.set_opt("bit_rate", 30_000)      # low target: rc must resist
        frames = [vsynth_frame(64, 48, t) for t in range(8)]
        pkts = enc.encode_all(frames)
        assert enc.rc is not None
        total_bits = sum(len(p.data) * 8 for p in pkts)
        rate = total_bits * 25 / len(pkts)
        # overshoot control: stay within ~3x of a tight target
        assert rate < 30_000 * 3, f"rate {rate}"
        assert enc.rc.qscale_last >= 2
        # still decodable
        dec = MPEG1Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                           codec_id="mpeg1video"))
        out = dec.decode_all([Packet(data=p.data, pts=i)
                              for i, p in enumerate(pkts)])
        assert len(out) == len(frames)
