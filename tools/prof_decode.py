#!/usr/bin/env python
"""Decode-path profiler: where does the wall time of the headline bench
go?  Runs the bench GOP serially (no pipeline) under cProfile, then
reports the per-stage split (entropy / recon glue / jit dispatch /
block) plus tunnel microbenchmarks (noop dispatch latency, host->device
transfer rate).  Usage: python tools/prof_decode.py [--cpu]
"""
import cProfile
import io
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
if "--pipeline" not in sys.argv:
    os.environ["LIBAV_TPU_NO_PIPELINE"] = "1"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def tunnel_micro():
    dev = jax.devices()[0]
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.int32)
    f(x).block_until_ready()
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        f(x).block_until_ready()
    rt = (time.perf_counter() - t0) / n
    # async dispatch cost (no block)
    t0 = time.perf_counter()
    ys = [f(x) for _ in range(n)]
    disp = (time.perf_counter() - t0) / n
    jax.block_until_ready(ys)
    # transfer 4MB
    big = np.zeros((1 << 20,), np.int32)
    jax.device_put(big, dev).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        jax.device_put(big, dev).block_until_ready()
    up = (time.perf_counter() - t0) / 5
    # chained dispatches without host roundtrip
    g = jax.jit(lambda x: x * 2 + 1)
    y = g(x)
    y.block_until_ready()
    t0 = time.perf_counter()
    y = x
    for _ in range(50):
        y = g(y)
    y.block_until_ready()
    chain = (time.perf_counter() - t0) / 50
    print(f"[tunnel] jit roundtrip {rt*1e3:.2f} ms | async dispatch "
          f"{disp*1e3:.2f} ms | 4MB upload {up*1e3:.2f} ms | chained "
          f"step {chain*1e3:.2f} ms", file=sys.stderr)


def main():
    from bench import ensure_stream, W, H, NFRAMES
    datas = ensure_stream()
    from libav_tpu.avutil.frame import Packet
    from libav_tpu.codecs.api import CodecParameters, MediaType
    from libav_tpu.codecs.h264 import H264Decoder

    tunnel_micro()

    dec = H264Decoder(CodecParameters(codec_type=MediaType.VIDEO,
                                      codec_id="h264"))
    dec.open()

    def run_gop():
        dec._init()
        out = None
        for i, d in enumerate(datas):
            dec.send_packet(Packet(data=d, pts=i))
            out = dec._pump()
        return out

    for _ in range(3):       # cover delayed-AU + cap-bucket variants
        out = run_gop()
    jax.block_until_ready(out[-1].planes[0])

    # stage timers
    from libav_tpu.avutil import timer as T
    reps = 4
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    for _ in range(reps):
        out = run_gop()
    jax.block_until_ready(out[-1].planes[0])
    pr.disable()
    dt = time.perf_counter() - t0
    nf = reps * NFRAMES
    print(f"[total] {nf/dt:.2f} fps | {dt*1e3/nf:.2f} ms/frame",
          file=sys.stderr)
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(30)
    ps.sort_stats("tottime")
    ps.print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
