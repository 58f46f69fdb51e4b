"""FFV1 cross-validation (reference: libavcodec/ffv1dec.c / ffv1enc.c).

The codec is lossless, so the oracle is exact in BOTH directions:
reference-encoded streams must decode to the identical pixels, and our
encoder must produce byte-identical packets to the reference encoder
for the same options (same context model, same coder, same adaptive
state walk).  The matrix covers coder 0 (Golomb-Rice run mode),
1 (range coder, default adaptation), 2 (range coder, ver2 custom
table) x context model 0 (3-gradient) / 1 (5-gradient), plus 444/422/
gray sampling and the keyframe/inter cadence (gop 12 over 16 frames)."""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from tests.fate_util import REF_AVCONV, have_reference, ref_run

pytestmark = pytest.mark.skipif(not have_reference(),
                                reason="no .refbuild/avconv oracle")


def _src(path, w, h, n, fmt="yuv420p", seed=11):
    rng = np.random.RandomState(seed)
    with open(path, "wb") as f:
        for i in range(n):
            y = np.clip(((np.arange(w)[None, :] + np.arange(h)[:, None] * 2
                          + i * 7) % 256) + rng.randint(-2, 3, (h, w)),
                        0, 255).astype(np.uint8)
            y[:h // 4, :w // 3] = 128     # flat patch: exercises run mode
            f.write(y.tobytes())
            if fmt == "gray":
                continue
            cw = w if fmt == "yuv444p" else w // 2
            ch = h if fmt in ("yuv444p", "yuv422p") else h // 2
            f.write(rng.randint(0, 256, (ch, cw), dtype=np.uint8).tobytes())
            f.write(np.full((ch, cw), 64, np.uint8).tobytes())


def _our_enc(src, fmt, size, out, opts=()):
    from libav_tpu.tools import avconv
    rc = avconv.main(["-v", "error", "-f", "rawvideo", "-pix_fmt", fmt,
                      "-s", size, "-r", "25", "-i", src, "-c:v", "ffv1"]
                     + list(opts) + ["-y", out])
    assert rc == 0


def _our_dec(inp, out):
    from libav_tpu.tools import avconv
    rc = avconv.main(["-v", "error", "-i", inp, "-f", "rawvideo",
                      "-y", out])
    assert rc == 0


def _packets(path):
    from libav_tpu.formats.api import FormatContext
    dc = FormatContext.open_input(path)
    return [bytes(p.data) for p in dc.packets() if p.stream_index == 0]


@pytest.mark.parametrize("coder", [0, 1, 2])
@pytest.mark.parametrize("context", [0, 1])
def test_ffv1_cross_matrix(tmp_path, coder, context):
    """Both directions, 16 frames (keyframe at 0 and 12 with the
    default gop 12), one coder x context combination."""
    src = str(tmp_path / "src.yuv")
    _src(src, 80, 64, 16)
    refavi = str(tmp_path / "ref.avi")
    ref_run(["-f", "rawvideo", "-pix_fmt", "yuv420p", "-s", "80x64",
             "-r", "25", "-i", src, "-c:v", "ffv1",
             "-coder", str(coder), "-context", str(context),
             "-strict", "-2", refavi])

    # direction 1: reference-encoded stream decodes pixel-identical
    dec = str(tmp_path / "dec.yuv")
    _our_dec(refavi, dec)
    assert np.array_equal(np.fromfile(dec, np.uint8),
                          np.fromfile(src, np.uint8))

    # direction 2: our encode is byte-identical to the reference's
    ours = str(tmp_path / "ours.avi")
    _our_enc(src, "yuv420p", "80x64", ours,
             ["-coder", str(coder), "-context", str(context)])
    a, b = _packets(refavi), _packets(ours)
    assert len(a) == len(b) == 16
    for i, (x, y) in enumerate(zip(a, b)):
        assert x == y, f"packet {i} differs"

    # and the reference binary decodes our stream losslessly
    refdec = str(tmp_path / "refdec.yuv")
    ref_run(["-i", ours, "-f", "rawvideo", refdec])
    assert np.array_equal(np.fromfile(refdec, np.uint8),
                          np.fromfile(src, np.uint8))


@pytest.mark.parametrize("fmt,size", [("yuv444p", "48x32"),
                                      ("yuv422p", "48x32"),
                                      ("gray", "48x32")])
def test_ffv1_pixfmt_breadth(tmp_path, fmt, size):
    src = str(tmp_path / "src.yuv")
    w, h = (int(v) for v in size.split("x"))
    _src(src, w, h, 3, fmt=fmt)
    refavi = str(tmp_path / "ref.avi")
    ref_run(["-f", "rawvideo", "-pix_fmt", fmt, "-s", size,
             "-i", src, "-c:v", "ffv1", refavi])
    dec = str(tmp_path / "dec.yuv")
    _our_dec(refavi, dec)
    assert np.array_equal(np.fromfile(dec, np.uint8),
                          np.fromfile(src, np.uint8))
    ours = str(tmp_path / "ours.avi")
    _our_enc(src, fmt, size, ours)
    for i, (x, y) in enumerate(zip(_packets(refavi), _packets(ours))):
        assert x == y, f"packet {i} differs"


def test_ffv1_own_roundtrip(tmp_path):
    """Closed loop without the oracle binary: our enc -> our dec."""
    src = str(tmp_path / "src.yuv")
    _src(src, 64, 48, 5, seed=99)
    avi = str(tmp_path / "rt.avi")
    _our_enc(src, "yuv420p", "64x48", avi, ["-coder", "1"])
    dec = str(tmp_path / "dec.yuv")
    _our_dec(avi, dec)
    assert np.array_equal(np.fromfile(dec, np.uint8),
                          np.fromfile(src, np.uint8))
