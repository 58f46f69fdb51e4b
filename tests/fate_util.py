"""Helpers for the cross-validation FATE tier (reference:
tests/fate-run.sh enc_dec pattern): drive the BUILT reference avconv as
the oracle against our decoder/encoder.

The reference is built once into .refbuild/ (out-of-tree,
`configure --disable-asm` because the image has no nasm); if the
binaries are missing the dependent tests are skipped with instructions.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_AVCONV = os.path.join(ROOT, ".refbuild", "avconv")

# bit-exact flags pinned by the reference's own FATE runs
# (fate-run.sh:127-129); -dct is encode-only
BITEXACT_DEC = ["-flags", "+bitexact", "-idct", "simple"]
BITEXACT = BITEXACT_DEC + ["-dct", "fastint"]


def have_reference() -> bool:
    return os.path.exists(REF_AVCONV)


def ref_run(args, timeout=300) -> bytes:
    """Run reference avconv, return stdout bytes; raises on failure."""
    r = subprocess.run([REF_AVCONV, "-v", "error", "-y"] + args,
                       capture_output=True, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(f"reference avconv failed: "
                           f"{r.stderr.decode(errors='replace')[-2000:]}")
    return r.stdout


def our_framecrc(url: str, extra=None) -> str:
    """Decode with our avconv (in-process) to framecrc text."""
    import tempfile
    from libav_tpu.tools import avconv
    with tempfile.NamedTemporaryFile(suffix=".crc") as tf:
        rc = avconv.main(["-y"] + (extra or []) +
                         ["-i", url, "-f", "framecrc", tf.name])
        assert rc == 0, f"our avconv failed rc={rc}"
        return open(tf.name).read()


def ref_framecrc(url: str, extra=None) -> str:
    return ref_run((extra or []) + BITEXACT_DEC +
                   ["-i", url, "-f", "framecrc", "-"]).decode()


def crc_column(framecrc_text: str):
    """CRC column only (timestamps compared separately: raw-ES pts
    inference parity is tracked as its own demux-core work item)."""
    out = []
    for line in framecrc_text.strip().splitlines():
        if line.startswith("#"):
            continue
        parts = [p.strip() for p in line.split(",")]
        out.append((parts[0], parts[4], parts[5]))   # stream, size, crc
    return out


def write_y4m(path: str, w=320, h=240, n=8, seed=42):
    """Deterministic moving-gradient + static-noise source (the vsynth
    analogue, tests/videogen.c)."""
    rng = np.random.default_rng(seed)
    noise = rng.integers(0, 32, (h, w)).astype(np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode())
        for t in range(n):
            y = ((xx * 2 + yy + t * 8) % 256).astype(np.int32)
            y = (y + noise - 16).clip(0, 255).astype(np.uint8)
            u = ((xx // 2 + t * 4) % 256)[::2, ::2].astype(np.uint8)
            v = ((yy // 2 + 256 - t * 4) % 256)[::2, ::2].astype(np.uint8)
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


def write_wav48(path: str, seconds=1.0, transient=False):
    """48 kHz stereo s16 test tone; transient=True adds clicks that force
    EIGHT_SHORT windows in AAC."""
    from libav_tpu.avutil.frame import Packet
    from libav_tpu.avutil.rational import Rational
    from libav_tpu.formats import FormatContext
    from libav_tpu.codecs.api import CodecParameters, MediaType
    sr = 48000
    nsamp = int(sr * seconds)
    t = np.arange(nsamp) / sr
    left = np.sin(2 * np.pi * 440 * t) * 18000
    right = np.sin(2 * np.pi * 880 * t) * 12000
    if transient:
        for pos in range(2048, nsamp, 7000):
            left[pos:pos + 64] += 9000
            right[pos:pos + 64] -= 9000
    data = np.stack([left, right], axis=1).clip(-32768, 32767).astype("<i2")
    oc = FormatContext.open_output(path, "wav")
    par = CodecParameters(codec_type=MediaType.AUDIO, codec_id="pcm_s16le",
                          sample_rate=sr, channels=2)
    oc.new_stream(par, time_base=Rational(1, sr))
    oc.write_header()
    oc.write_packet(Packet(data=data.tobytes(), pts=0, dts=0,
                           duration=nsamp, stream_index=0))
    oc.write_trailer()


GPL_AVCONV = "/root/repo/.refbuild-gpl/avconv"


def gpl_run(args, timeout=300) -> bytes:
    """Run the GPL-enabled reference build (hqdn3d/interlace oracles)."""
    import os
    if not os.path.exists(GPL_AVCONV):
        import pytest
        pytest.skip("GPL reference build not present")
    r = subprocess.run([GPL_AVCONV, "-v", "error", "-y"] + args,
                       capture_output=True, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(f"GPL reference avconv failed: "
                           f"{r.stderr.decode(errors='replace')[-2000:]}")
    return r.stdout


def gpl_run_stderr(args, timeout=300) -> str:
    """Like gpl_run but at -v info, returning stderr (log-producing
    filters: cropdetect, showinfo)."""
    import os
    if not os.path.exists(GPL_AVCONV):
        import pytest
        pytest.skip("GPL reference build not present")
    r = subprocess.run([GPL_AVCONV, "-v", "info", "-y"] + args,
                       capture_output=True, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(f"GPL reference avconv failed: "
                           f"{r.stderr.decode(errors='replace')[-2000:]}")
    return r.stderr.decode(errors="replace")
