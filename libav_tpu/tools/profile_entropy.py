"""Host-entropy profiler: times ONLY the native CABAC slice decode on
the standard bench content (no TPU needed — runs the whole decoder on
the CPU backend and wraps native decode_slice with a timer).

Usage: JAX_PLATFORMS=cpu python -m libav_tpu.tools.profile_entropy [reps]

The bench GOP (same encoder settings as bench.py) is cached in
.bench_cache/gop_stress.h264pkts — delete it to regenerate.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
CACHE = os.path.join(REPO, ".bench_cache")
W, H, NFRAMES = 1920, 1080, 8


def bench_stream_path() -> str:
    """Encode (once, in a CPU child process) and cache the bench GOP
    (same content/cache as bench.py)."""
    sys.path.insert(0, REPO)
    import bench
    bench.ensure_stream()
    return bench.STREAM


def load_packets(path: str):
    datas = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(4)
            if len(hdr) < 4:
                break
            datas.append(f.read(int.from_bytes(hdr, "big")))
    return datas


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    datas = load_packets(bench_stream_path())

    from libav_tpu.avutil.frame import Packet
    from libav_tpu.codecs.api import CodecParameters, MediaType
    from libav_tpu.codecs.h264 import H264Decoder
    from libav_tpu.native import h264_cabac_host as CN

    ent = [0.0, 0]
    orig = CN.decode_slice

    def timed(*a, **kw):
        t1 = time.perf_counter()
        r = orig(*a, **kw)
        ent[0] += time.perf_counter() - t1
        ent[1] += 1
        return r

    dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                      codec_id="h264")).open()

    def run_gop():
        dec._init()
        out = None
        for i, d in enumerate(datas):
            dec.send_packet(Packet(data=d, pts=i))
            out = dec._pump()
        return out

    run_gop()                      # warm up (compiles on CPU)
    CN.decode_slice = timed
    t0 = time.perf_counter()
    for _ in range(reps):
        run_gop()
    dt = time.perf_counter() - t0
    CN.decode_slice = orig
    print(f"entropy: {ent[0] * 1000 / (reps * NFRAMES):.2f} ms/frame "
          f"({ent[1]} slice calls, "
          f"{ent[0] * 1000 / max(ent[1], 1):.2f} ms/call) | "
          f"wall total: {dt * 1000 / (reps * NFRAMES):.2f} ms/frame")


if __name__ == "__main__":
    main()
