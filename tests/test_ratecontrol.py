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


class TestAdaptiveQuantization:
    """Vectorized mirror of ratecontrol.c:703 adaptive_quantization
    (default non-NAQ path: newq = q / factor)."""

    def test_flat_stats_flat_field(self):
        import numpy as np
        from libav_tpu.codecs.ratecontrol import adaptive_quantization
        qs = adaptive_quantization(6, np.full(24, 128.0),
                                   np.full(24, 100.0),
                                   np.full(24, 100.0),
                                   np.zeros(24, bool), 6, 4,
                                   lumi_masking=0.5)
        assert (qs == 6).all()

    def test_lumi_masking_raises_q_in_bright(self):
        import numpy as np
        from libav_tpu.codecs.ratecontrol import adaptive_quantization
        mean = np.array([128.0, 250.0, 10.0])
        qs = adaptive_quantization(6, mean, np.full(3, 100.0),
                                   np.full(3, 100.0),
                                   np.zeros(3, bool), 3, 1,
                                   lumi_masking=2.0, dark_masking=2.0)
        # factor < 1 in bright/dark extremes -> newq = q/factor rises
        assert qs[1] > qs[0] and qs[2] > qs[0]

    def test_spatial_masking_raises_q_in_texture(self):
        import numpy as np
        from libav_tpu.codecs.ratecontrol import adaptive_quantization
        var = np.array([16.0, 2500.0])
        qs = adaptive_quantization(6, np.full(2, 128.0), var, var,
                                   np.zeros(2, bool), 2, 1,
                                   spatial_cplx_masking=0.3)
        assert qs[1] > qs[0]

    def test_border_masking_raises_q_at_edges(self):
        import numpy as np
        from libav_tpu.codecs.ratecontrol import adaptive_quantization
        mb_w, mb_h = 10, 10
        n = mb_w * mb_h
        qs = adaptive_quantization(6, np.full(n, 128.0),
                                   np.full(n, 100.0),
                                   np.full(n, 100.0),
                                   np.zeros(n, bool), mb_w, mb_h,
                                   border_masking=0.8)
        qs = qs.reshape(mb_h, mb_w)
        assert qs[0, 0] > qs[5, 5]
        assert qs[5, 5] == 6

    def test_qmin_qmax_clip(self):
        import numpy as np
        from libav_tpu.codecs.ratecontrol import adaptive_quantization
        qs = adaptive_quantization(30, np.full(2, 255.0),
                                   np.full(2, 100.0),
                                   np.full(2, 100.0),
                                   np.zeros(2, bool), 2, 1,
                                   lumi_masking=5.0, qmin=2, qmax=31)
        assert qs.max() <= 31 and qs.min() >= 2
