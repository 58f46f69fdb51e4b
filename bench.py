#!/usr/bin/env python
"""Headline benchmark: full 1080p H.264 decode (bitstream -> frames) on
NON-TRIVIAL content: CABAC entropy, I_4x4 intra, IPBB GOPs with spatial
direct B frames, and in-loop deblocking (High-profile feature set) —
decoded through the native C CABAC host layer, pipelined on a worker
thread against the batched device reconstruction (dequant + 4x4 IDCT +
quarter-pel MC + wavefront intra assembly + two-list deblock bS).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): the north-star target is 4x realtime 1080p H.264
= 120 fps, so vs_baseline = fps / 120.

Setup (not timed): a child process encodes a 1080p IPBB GOP with the
built-in encoder in partition-stress mode and writes it to a temp file.
The encode runs in a separate process because XLA executables that embed
large constants degrade every subsequent dispatch in the same process
(measured ~100x on the axon tunnel); a decoder process reading a file is
also the realistic deployment shape.  The timed loop decodes the whole
GOP repeatedly; decoded frames stay in HBM (only the last is synced).
The host-entropy vs total split is reported on stderr.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

W, H, NFRAMES = 1920, 1080, 8


def encode_child(path):
    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from libav_tpu.avutil.frame import Frame
    from libav_tpu.avutil.rational import Rational
    from libav_tpu.codecs.api import CodecParameters, MediaType
    from libav_tpu.codecs.h264 import H264Encoder

    def mk(t):
        f = Frame.alloc_video(W, H, "yuv420p")
        yy, xx = np.mgrid[0:H, 0:W]
        f.planes[0] = ((xx // 2 + yy // 3 + t * 4) % 256).astype(np.uint8)
        ch, cw = f.planes[1].shape
        yy, xx = np.mgrid[0:ch, 0:cw]
        f.planes[1] = (128 + 54 * np.sin((xx + 3 * t) / 9.0)).astype(np.uint8)
        f.planes[2] = (128 + 54 * np.cos((yy - 2 * t) / 7.0)).astype(np.uint8)
        return f

    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id="h264",
                          width=W, height=H, pix_fmt="yuv420p",
                          framerate=Rational(25, 1))
    enc = H264Encoder(par)
    for k, v in dict(qp=28, gop_size=NFRAMES, entropy="cabac",
                     i4x4=1, b_frames=2, deblock=1, slices=4).items():
        enc.set_opt(k, v)
    pkts = enc.encode_all([mk(t) for t in range(NFRAMES)])
    with open(path, "wb") as f:
        for p in pkts:
            f.write(len(p.data).to_bytes(4, "big"))
            f.write(p.data)


def main():
    if len(sys.argv) == 3 and sys.argv[1] == "--encode":
        encode_child(sys.argv[2])
        return

    with tempfile.NamedTemporaryFile(suffix=".h264pkts", delete=False) as tf:
        path = tf.name
    try:
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--encode", path], check=True,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        datas = []
        with open(path, "rb") as f:
            while True:
                hdr = f.read(4)
                if len(hdr) < 4:
                    break
                datas.append(f.read(int.from_bytes(hdr, "big")))
    finally:
        os.unlink(path)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from libav_tpu.avutil.frame import Packet
    from libav_tpu.codecs.api import CodecParameters, MediaType
    from libav_tpu.codecs.h264 import H264Decoder

    dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                      codec_id="h264"))
    dec.open()

    def run_gop():
        dec._init()          # fresh DPB; SPS/PPS arrive in packet 0
        out = None
        for i, d in enumerate(datas):
            dec.send_packet(Packet(data=d, pts=i))
            out = dec._pump()
        return out

    out = run_gop()          # warm up compiles
    jax.block_until_ready(out[-1].planes[0])

    # host-entropy share (reported on stderr, not part of the metric)
    from libav_tpu.native import h264_cabac_host as CN
    ent = [0.0]
    orig = CN.decode_slice

    def timed(*a, **kw):
        t1 = time.perf_counter()
        r = orig(*a, **kw)
        ent[0] += time.perf_counter() - t1
        return r

    reps = 8
    CN.decode_slice = timed
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_gop()
    jax.block_until_ready(out[-1].planes[0])
    dt = time.perf_counter() - t0
    CN.decode_slice = orig
    print(f"host entropy: {ent[0] * 1000 / (reps * NFRAMES):.2f} ms/frame"
          f" | total: {dt * 1000 / (reps * NFRAMES):.2f} ms/frame",
          file=sys.stderr)

    fps = reps * NFRAMES / dt
    print(json.dumps({
        "metric": "1080p_h264_full_decode_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 120.0, 3),
    }))


if __name__ == "__main__":
    main()
