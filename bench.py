#!/usr/bin/env python
"""Headline benchmark: full 1080p H.264 decode (bitstream -> frames) —
native C CAVLC entropy decode feeding the batched device program (dequant
+ 4x4 IDCT + quarter-pel MC + wavefront intra assembly).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): the north-star target is 4x realtime 1080p H.264
= 120 fps, so vs_baseline = fps / 120.

Setup (not timed): encode a 1-I + 7-P 1080p GOP with the built-in
encoder. The timed loop decodes the whole GOP repeatedly.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np

    from libav_tpu.avutil.frame import Frame, Packet
    from libav_tpu.avutil.rational import Rational
    from libav_tpu.codecs.api import CodecParameters, MediaType
    from libav_tpu.codecs.h264 import H264Decoder, H264Encoder

    w, h = 1920, 1080

    def mk(t):
        f = Frame.alloc_video(w, h, "yuv420p")
        yy, xx = np.mgrid[0:h, 0:w]
        f.planes[0] = ((xx // 2 + yy // 3 + t * 4) % 256).astype(np.uint8)
        ch, cw = f.planes[1].shape
        yy, xx = np.mgrid[0:ch, 0:cw]
        f.planes[1] = (128 + 54 * np.sin((xx + 3 * t) / 9.0)).astype(np.uint8)
        f.planes[2] = (128 + 54 * np.cos((yy - 2 * t) / 7.0)).astype(np.uint8)
        return f

    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                          width=w, height=h, pix_fmt="yuv420p",
                          framerate=Rational(25, 1))
    enc = H264Encoder(par)
    enc.set_opt("qp", 30)
    nframes = 8
    pkts = enc.encode_all([mk(t) for t in range(nframes)])

    import jax
    dpar = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264")
    dec = H264Decoder(dpar)
    dec.open()

    def run_gop():
        dec._init()          # fresh DPB; SPS/PPS arrive in packet 0
        out = None
        for i, p in enumerate(pkts):
            dec.send_packet(Packet(data=p.data, pts=i))
            out = dec._pump()
        return out

    out = run_gop()          # warm up compiles
    jax.block_until_ready(out[-1].planes[0])

    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_gop()
    jax.block_until_ready(out[-1].planes[0])
    dt = time.perf_counter() - t0

    fps = reps * nframes / dt
    print(json.dumps({
        "metric": "1080p_h264_full_decode_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 120.0, 3),
    }))


if __name__ == "__main__":
    main()
