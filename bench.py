#!/usr/bin/env python
"""Headline benchmark: full 1080p MJPEG decode (bitstream -> frames) on
the real chip — native C entropy decode feeding the batched device
dequant/IDCT/reshape pipeline. This is a complete decode measurement, not
a device-half proxy.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target is 4x realtime 1080p = 120 fps, so vs_baseline = fps / 120.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np

    from libav_tpu.avutil.frame import Frame, Packet
    from libav_tpu.codecs.mjpeg import MJPEGDecoder, MJPEGEncoder
    from libav_tpu.codecs.api import CodecParameters, MediaType

    # synthesize one 1080p frame and encode it once (setup, not timed)
    w, h = 1920, 1080
    yy, xx = np.mgrid[0:h, 0:w]
    f = Frame.alloc_video(w, h, "yuvj420p")
    f.planes[0] = ((xx + yy) % 256).astype(np.uint8)
    ch, cw = f.planes[1].shape
    yy, xx = np.mgrid[0:ch, 0:cw]
    f.planes[1] = (128 + 64 * np.sin(xx / 9.0)).astype(np.uint8)
    f.planes[2] = (128 + 64 * np.cos(yy / 7.0)).astype(np.uint8)

    enc = MJPEGEncoder()
    enc.set_opt("quality", 90)
    data = enc.encode_all([f])[0].data

    dec = MJPEGDecoder(CodecParameters(codec_type=MediaType.VIDEO,
                                       codec_id="mjpeg"))
    dec.open()
    # NOTE: single-frame dispatch. The batched path (decode_jpeg_batch)
    # is the architecture's real shape, but this environment reaches the
    # chip through a bandwidth-limited tunnel where the one-shot batched
    # coefficient upload (~50 MB) costs more than 8 small ones; on a
    # directly-attached host the batch path wins.
    out = dec.decode_jpeg(data)
    import jax
    jax.block_until_ready(out.planes[0])

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = dec.decode_jpeg(data)
    jax.block_until_ready(out.planes[0])
    dt = time.perf_counter() - t0

    fps = iters / dt
    print(json.dumps({
        "metric": "1080p_mjpeg_full_decode_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 120.0, 3),
    }))


if __name__ == "__main__":
    main()
