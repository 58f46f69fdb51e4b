#!/usr/bin/env python
"""Headline benchmark: full 1080p H.264 decode (bitstream -> frames) on
NON-TRIVIAL content: CABAC entropy, I_8x8/8x8-transform intra, IPBB GOPs
with spatial direct B frames, 4 slices and in-loop deblocking (High
profile) — native C CABAC host layer + one batched device program per
frame (dequant + IDCT + quarter-pel MC + wavefront intra + deblock).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is measured against the REFERENCE decoder (.refbuild/avconv,
single-threaded) decoding the same bitstream on the same host — the
task's bar is "match or beat the reference on its own benchmarks".  When
the reference build is absent, the fallback baseline is the project's
4x-realtime north star (120 fps).

Process structure: the stream is encoded once into .bench_cache/ by a
CPU-backend child (only one process may hold the TPU tunnel), and EACH
TIMED RUN is its own child process holding a fresh tunnel.  The axon
transport degrades host->device transfer ~10x after ~250MB of argument
uploads in one process (permanent until exit, measured: 2.3 -> 21.8 ms
per 4MB) — per-run isolation keeps every run inside the fast-path
budget and measures the decoder, not the transport pathology.
"""

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

W, H, NFRAMES = 1920, 1080, 8
ENC_SETTINGS = dict(qp=28, gop_size=NFRAMES, entropy="cabac",
                    i8x8=1, dct8x8=1, b_frames=2, deblock=1, slices=4)
CACHE = os.path.join(REPO, ".bench_cache")
STREAM = os.path.join(
    CACHE, "gop_" + "_".join(f"{k}{v}" for k, v in ENC_SETTINGS.items())
    + ".h264pkts")


def encode_child(path):
    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
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
    for k, v in ENC_SETTINGS.items():
        enc.set_opt(k, v)
    pkts = enc.encode_all([mk(t) for t in range(NFRAMES)])
    with open(path, "wb") as f:
        for p in pkts:
            f.write(len(p.data).to_bytes(4, "big"))
            f.write(p.data)


def ensure_stream() -> list:
    os.makedirs(CACHE, exist_ok=True)
    if not os.path.exists(STREAM):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_PLATFORM_NAME"] = "cpu"
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--encode", STREAM], check=True, env=env,
                       stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
    datas = []
    with open(STREAM, "rb") as f:
        while True:
            hdr = f.read(4)
            if len(hdr) < 4:
                break
            datas.append(f.read(int.from_bytes(hdr, "big")))
    return datas


def reference_fps(datas) -> float:
    """Single-threaded reference decode of the same bitstream on this
    host (median of 3; utime from avconv -benchmark)."""
    avconv = os.path.join(REPO, ".refbuild", "avconv")
    if not os.path.exists(avconv):
        avconv = os.path.join(REPO, ".refbuild-gpl", "avconv")
    if not os.path.exists(avconv):
        return 0.0
    with tempfile.NamedTemporaryFile(suffix=".h264", delete=False) as tf:
        for d in datas:
            tf.write(d)
        raw = tf.name
    try:
        vals = []
        for _ in range(3):
            r = subprocess.run(
                [avconv, "-benchmark", "-threads", "1", "-i", raw,
                 "-f", "null", "-"],
                capture_output=True, text=True, timeout=120)
            for line in (r.stdout + r.stderr).splitlines():
                if line.startswith("bench: utime="):
                    ut = float(line.split("utime=")[1].split("s")[0])
                    if ut > 0:
                        vals.append(NFRAMES / ut)
        return statistics.median(vals) if vals else 0.0
    finally:
        os.unlink(raw)


def probe_device() -> bool:
    """True if the default (TPU) jax backend initializes within 90s.
    A wedged axon tunnel HANGS backend init (xla_bridge.backends ->
    make_c_api_client), so probe in a killable subprocess and fall back
    to the CPU backend rather than hanging the whole benchmark."""
    code = "import jax; jax.devices(); print('DEV_OK')"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=90)
        return "DEV_OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def timed_child():
    """One timed run: fresh tunnel, warm 2 GOPs, time 3 GOP reps.
    Prints a JSON line {fps, entropy_ms, total_ms} on stdout."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from libav_tpu.avutil.frame import Packet
    from libav_tpu.codecs.api import CodecParameters, MediaType
    from libav_tpu.codecs.h264 import H264Decoder

    datas = ensure_stream()
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

    for _ in range(2):       # compile warm-up incl. delayed-AU variants
        out = run_gop()
    jax.block_until_ready(out[-1].planes[0])

    # host-entropy share (diagnostic, reported alongside)
    from libav_tpu.native import h264_cabac_host as CN
    ent = [0.0]
    orig = CN.decode_slice

    def timed(*a, **kw):
        t1 = time.perf_counter()
        r = orig(*a, **kw)
        ent[0] += time.perf_counter() - t1
        return r

    CN.decode_slice = timed
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_gop()
    jax.block_until_ready(out[-1].planes[0])
    dt = time.perf_counter() - t0
    CN.decode_slice = orig
    print(json.dumps({
        "fps": reps * NFRAMES / dt,
        "entropy_ms": ent[0] * 1000 / (reps * NFRAMES),
        "total_ms": dt * 1000 / (reps * NFRAMES),
    }))


def sustained_child(seconds: float):
    """Sustained single-process decode for `seconds`: proves the fps holds
    without per-run process isolation (the round-4 axon argument-upload
    cliff is gone after the mallopt heap-recycling fix — the multi-MB
    per-frame transports now recycle warm heap pages instead of faulting
    fresh mmap pages, which was what degraded the transport).  Prints one
    JSON line {windows: [fps per 10s window], first, last, drift}."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from libav_tpu.avutil.frame import Packet
    from libav_tpu.codecs.api import CodecParameters, MediaType
    from libav_tpu.codecs.h264 import H264Decoder

    datas = ensure_stream()
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

    for _ in range(2):
        out = run_gop()
    jax.block_until_ready(out[-1].planes[0])

    windows = []
    wstart = time.perf_counter()
    wframes = 0
    t_end = wstart + seconds
    while time.perf_counter() < t_end:
        out = run_gop()
        wframes += NFRAMES
        now = time.perf_counter()
        if now - wstart >= 10.0:
            # sync only at window edges — a per-GOP block stalls the
            # host/device overlap the decoder is built around
            jax.block_until_ready(out[-1].planes[0])
            now = time.perf_counter()
            windows.append(wframes / (now - wstart))
            wstart, wframes = now, 0
    if wframes:
        now = time.perf_counter()
        if now - wstart >= 3.0:
            windows.append(wframes / (now - wstart))
    first, last = windows[0], windows[-1]
    print(json.dumps({"windows": [round(w, 2) for w in windows],
                      "first": round(first, 2), "last": round(last, 2),
                      "drift": round(last / first, 3)}))


def main():
    if len(sys.argv) == 3 and sys.argv[1] == "--encode":
        encode_child(sys.argv[2])
        return
    if len(sys.argv) == 2 and sys.argv[1] == "--timed":
        timed_child()
        return
    if sys.argv[1:2] == ["--sustained"]:
        sustained_child(float(sys.argv[2]) if len(sys.argv) > 2 else 60.0)
        return

    datas = ensure_stream()
    ref_fps = reference_fps(datas)

    child_env = dict(os.environ)
    if not probe_device():
        print("bench: device backend unavailable/wedged -> CPU fallback",
              file=sys.stderr)
        child_env["JAX_PLATFORMS"] = "cpu"
        child_env["JAX_PLATFORM_NAME"] = "cpu"

    fps_runs = []
    for k in range(3):
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--timed"], capture_output=True, text=True,
                           env=child_env, timeout=600)
        line = None
        for ln in r.stdout.splitlines():
            if ln.startswith("{"):
                line = ln
        if line is None:
            print(f"run {k}: FAILED\n{r.stderr[-2000:]}", file=sys.stderr)
            continue
        d = json.loads(line)
        fps_runs.append(d["fps"])
        print(f"run: {d['fps']:.2f} fps | host entropy "
              f"{d['entropy_ms']:.2f} ms/frame | total "
              f"{d['total_ms']:.2f} ms/frame", file=sys.stderr)

    fps = statistics.median(fps_runs) if fps_runs else 0.0
    base = ref_fps if ref_fps > 0 else 120.0
    print(f"reference (1 thread, this host): {ref_fps:.2f} fps | "
          f"north star 120 fps -> vs_target {fps / 120.0:.3f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "1080p_h264_full_decode_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / base, 3),
    }))


if __name__ == "__main__":
    main()
