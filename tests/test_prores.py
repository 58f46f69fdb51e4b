"""ProRes cross-validation (reference: libavcodec/proresdec.c /
proresenc.c / proresdata.c).

Two-direction oracle like FFV1's: reference-encoded .mov streams must
decode full-line framecrc-identical (all profiles + interlaced), and our
encoder must produce BYTE-IDENTICAL packets to the reference encoder for
the same input and options (the whole pipeline is deterministic integer
math: jfdctint-10 FDCT, truncating quant, exact rice/exp-Golomb bit
estimates, per-row trellis).  Plus golden kernel tests pinning the
batched 10-bit transforms to literal scalar ports of the C."""

import subprocess

import numpy as np
import pytest

from tests.fate_util import REF_AVCONV, have_reference

# ---------------------------------------------------------------------- #
# golden kernels (no reference binary needed)
# ---------------------------------------------------------------------- #


def _i16(x):
    return ((int(x) + 0x8000) & 0xFFFF) - 0x8000


def _i32(x):
    return ((int(x) + 0x80000000) & 0xFFFFFFFF) - 0x80000000


_W = (65535, 90901, 85627, 77062, 65535, 51491, 35468, 18081)


def _prores_idct_scalar(block, qmat):
    """Literal port of ff_prores_idct (simple_idct.c:222): qmat multiply
    into int16, idctRowCondDC_10(row, 2), idctSparseCol_10, then
    put_pixels' bias+clip (proresdsp.c:36-50)."""
    W1, W2, W3, W4, W5, W6, W7 = _W[1:]
    blk = [_i16(int(block[i]) * int(qmat[i])) for i in range(64)]
    for r in range(8):
        row = blk[8 * r:8 * r + 8]
        if all(v == 0 for v in row[1:]):
            t = _i16((row[0] >> 1) & 0xffff)
            blk[8 * r:8 * r + 8] = [t] * 8
            continue
        a0 = _i32(W4 * row[0] + (1 << 14))
        a1 = a2 = a3 = a0
        a0 = _i32(a0 + W2 * row[2] + W4 * row[4] + W6 * row[6])
        a1 = _i32(a1 + W6 * row[2] - W4 * row[4] - W2 * row[6])
        a2 = _i32(a2 - W6 * row[2] - W4 * row[4] + W2 * row[6])
        a3 = _i32(a3 - W2 * row[2] + W4 * row[4] - W6 * row[6])
        b0 = _i32(W1 * row[1] + W3 * row[3] + W5 * row[5] + W7 * row[7])
        b1 = _i32(W3 * row[1] - W7 * row[3] - W1 * row[5] - W5 * row[7])
        b2 = _i32(W5 * row[1] - W1 * row[3] + W7 * row[5] + W3 * row[7])
        b3 = _i32(W7 * row[1] - W5 * row[3] + W3 * row[5] - W1 * row[7])
        o = [_i32(a0 + b0), _i32(a1 + b1), _i32(a2 + b2), _i32(a3 + b3),
             _i32(a3 - b3), _i32(a2 - b2), _i32(a1 - b1), _i32(a0 - b0)]
        blk[8 * r:8 * r + 8] = [_i16(v >> 17) for v in o]
    for c in range(8):
        col = blk[c::8]
        a0 = _i32(W4 * (col[0] + ((1 << 19) // W4)))
        a1 = a2 = a3 = a0
        a0 = _i32(a0 + W2 * col[2] + W4 * col[4] + W6 * col[6])
        a1 = _i32(a1 + W6 * col[2] - W4 * col[4] - W2 * col[6])
        a2 = _i32(a2 - W6 * col[2] - W4 * col[4] + W2 * col[6])
        a3 = _i32(a3 - W2 * col[2] + W4 * col[4] - W6 * col[6])
        b0 = _i32(W1 * col[1] + W3 * col[3] + W5 * col[5] + W7 * col[7])
        b1 = _i32(W3 * col[1] - W7 * col[3] - W1 * col[5] - W5 * col[7])
        b2 = _i32(W5 * col[1] - W1 * col[3] + W7 * col[5] + W3 * col[7])
        b3 = _i32(W7 * col[1] - W5 * col[3] + W3 * col[5] - W1 * col[7])
        o = [_i32(a0 + b0), _i32(a1 + b1), _i32(a2 + b2), _i32(a3 + b3),
             _i32(a3 - b3), _i32(a2 - b2), _i32(a1 - b1), _i32(a0 - b0)]
        for k in range(8):
            blk[8 * k + c] = _i16(o[k] >> 20)
    return np.clip(np.array(blk) + 512, 4, 1019).astype(np.uint16
                                                         ).reshape(8, 8)


def test_prores_idct_matches_scalar_port():
    from libav_tpu.ops.prores_dct import prores_idct_ref
    rng = np.random.default_rng(7)
    for trial in range(60):
        blk = rng.integers(-2048, 2048, 64).astype(np.int64)
        if trial % 5 == 0:
            blk[1:] = 0                        # DC-only shortcut rows
        if trial == 1:
            blk = rng.integers(-32768, 32768, 64)   # wraparound stress
        qm = np.array([_i16(q) for q in
                       rng.integers(1, 225, 64) * rng.integers(1, 65)])
        got = prores_idct_ref(blk[None, :], qm[None, :])[0]
        want = _prores_idct_scalar(blk, qm)
        assert (got == want).all(), trial


def test_fdct10_flat_dc_anchor():
    """Flat 512 block -> DC 0x4000 — the bias proresenc.c:365 subtracts."""
    from libav_tpu.ops.prores_dct import fdct10_ref
    flat = np.full((1, 8, 8), 512, np.int64)
    out = fdct10_ref(flat)[0]
    assert out[0, 0] == 0x4000
    assert (out.reshape(-1)[1:] == 0).all()


def test_fdct_idct_near_identity():
    """fdct10 -> quant(q=1, qmat 4) -> dequant -> idct ~= identity (the
    4x/x4 scale pairing of the 10-bit jfdct and prores simple_idct)."""
    from libav_tpu.ops.prores_dct import fdct10_ref, prores_idct_ref
    rng = np.random.default_rng(3)
    px = rng.integers(8, 1016, (16, 8, 8)).astype(np.int64)
    C = fdct10_ref(px).reshape(16, 64).astype(np.int64)
    qmat = np.full(64, 4, np.int64)
    lv = np.sign(C) * (np.abs(C) // 4)
    lv[:, 0] = np.sign(C[:, 0] - 0x4000) * (np.abs(C[:, 0] - 0x4000) // 4)
    out = prores_idct_ref(lv, qmat[None, :])
    assert np.abs(out.astype(int) - px[..., None][..., 0]).max() <= 4


def test_vlc_roundtrip_and_estimate():
    from libav_tpu.bitstream import GetBits, PutBits
    from libav_tpu.codecs.prores.dec import decode_vlc_codeword
    from libav_tpu.codecs.prores.enc import encode_vlc_codeword, estimate_vlc
    from libav_tpu.codecs.prores.tables import (AC_CODEBOOK, DC_CODEBOOK,
                                                FIRST_DC_CB)
    cbs = list(AC_CODEBOOK) + list(DC_CODEBOOK) + [FIRST_DC_CB]
    vals = list(range(0, 200)) + [1000, 5000, 30000]
    for cb in cbs:
        pb = PutBits()
        for v in vals:
            encode_vlc_codeword(pb, cb, v)
            assert estimate_vlc(cb, v) > 0
        gb = GetBits(pb.flush())
        for v in vals:
            assert decode_vlc_codeword(gb, cb) == v, (hex(cb), v)
    for cb in cbs:
        for v in vals:
            pb = PutBits()
            encode_vlc_codeword(pb, cb, v)
            assert pb.bits_written() == estimate_vlc(cb, v), (hex(cb), v)


# ---------------------------------------------------------------------- #
# in-process roundtrips
# ---------------------------------------------------------------------- #

def _mkframe(w, h, fmt, t=0, seed=3):
    from libav_tpu.avutil.frame import Frame
    rng = np.random.default_rng(seed + t)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((yy * 7 + xx * 5 + t * 31 +
          rng.integers(0, 64, (h, w))) % 1024).astype(np.uint16)
    cw = w if fmt == "yuv444p10le" else (w + 1) // 2
    u = ((yy * 3 + xx * 2 + t * 17) % 1024).astype(np.uint16)[:, :cw].copy()
    v = ((yy * 5 + xx * 11 + t * 23) % 1024).astype(np.uint16)[:, :cw].copy()
    f = Frame(width=w, height=h, format=fmt)
    f.planes = [y, u, v]
    f.pts = t
    return f


@pytest.mark.parametrize("w,h,fmt,opts", [
    (64, 48, "yuv422p10le", {"qscale": 1}),
    (64, 48, "yuv422p10le", {}),
    (60, 44, "yuv422p10le", {}),                      # non-MB-aligned
    (64, 48, "yuv444p10le", {"profile": "4444", "qscale": 1}),
])
def test_roundtrip(w, h, fmt, opts):
    from libav_tpu.codecs.api import find_decoder, find_encoder
    f = _mkframe(w, h, fmt)
    enc = find_encoder("prores")(None, options=dict(opts)).open()
    pkts = enc.encode_all([f])
    dec = find_decoder("prores")(None)
    g = dec.decode_all(pkts)[0]
    assert (g.width, g.height, g.format) == (w, h, fmt)
    for a, b in zip(f.planes, g.planes):
        d = (a.astype(np.int64) - b.astype(np.int64)).astype(np.float64)
        if opts.get("qscale") == 1:
            # near-lossless at q=1; maxdiff 4 = the CLIP_MIN floor
            assert np.abs(d).max() <= 6
        else:
            # rate-controlled on noisy content: quality floor (10-bit)
            psnr = 10 * np.log10(1023.0 ** 2 / max(np.mean(d * d), 1e-9))
            assert psnr > 38.0, psnr


# ---------------------------------------------------------------------- #
# reference cross-validation
# ---------------------------------------------------------------------- #

needs_ref = pytest.mark.skipif(not have_reference(),
                               reason="no .refbuild/avconv oracle")


def _write_src(path, w, h, n, fmt):
    with open(path, "wb") as fh:
        for t in range(n):
            f = _mkframe(w, h, fmt, t)
            for p in f.planes:
                fh.write(p.tobytes())


def _ref(args):
    r = subprocess.run([REF_AVCONV, "-v", "error", "-y"] + args,
                       capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[-1500:]
    return r.stdout


def _pkts_of(path):
    from libav_tpu.avutil.error import AVError
    from libav_tpu.formats.api import open_input
    ic = open_input(path)
    out = []
    while True:
        try:
            pkt = ic.read_frame()
        except AVError:
            break
        if pkt is None:
            break
        out.append(bytes(pkt.data))
    return out


@needs_ref
@pytest.mark.parametrize("profile,extra", [
    ("0", []), ("2", []), ("3", []), ("2", ["-flags", "+ildct"]),
])
def test_reference_decode_parity(tmp_path, profile, extra):
    """Reference-encoded prores (proxy/standard/hq + interlaced) decodes
    full-line framecrc-identical in our decoder."""
    from tests.fate_util import our_framecrc
    src = str(tmp_path / "src.yuv")
    mov = str(tmp_path / "ref.mov")
    _write_src(src, 96, 64, 3, "yuv422p10le")
    _ref(["-f", "rawvideo", "-pix_fmt", "yuv422p10le", "-s", "96x64",
          "-r", "25", "-i", src, "-c:v", "prores", "-profile", profile]
         + extra + [mov])
    ref = _ref(["-i", mov, "-f", "framecrc", "-"]).decode()
    assert our_framecrc(mov) == ref


@needs_ref
@pytest.mark.parametrize("profile,prof_name,fmt", [
    ("0", "proxy", "yuv422p10le"),
    ("2", "standard", "yuv422p10le"),
    ("4", "4444", "yuv444p10le"),
])
def test_encode_byte_parity(tmp_path, profile, prof_name, fmt):
    """Our packets are byte-identical to the reference encoder's for the
    same input/options — FDCT, trellis quant selection and VLC chains all
    walk the same deterministic integer path."""
    from libav_tpu.codecs.api import find_encoder
    src = str(tmp_path / "src.yuv")
    mov = str(tmp_path / "ref.mov")
    w, h, n = 96, 64, 3
    _write_src(src, w, h, n, fmt)
    _ref(["-f", "rawvideo", "-pix_fmt", fmt, "-s", f"{w}x{h}", "-r", "25",
          "-i", src, "-c:v", "prores", "-profile", profile, mov])
    ref_pkts = _pkts_of(mov)
    assert len(ref_pkts) == n
    enc = find_encoder("prores")(None, options={"profile": prof_name}).open()
    for t in range(n):
        f = _mkframe(w, h, fmt, t)
        enc.send_frame(f)
        p = enc.receive_packet()
        assert bytes(p.data) == ref_pkts[t], f"frame {t} differs"


@needs_ref
def test_our_mov_reference_decodes(tmp_path):
    """Full CLI path: our avconv rawvideo->prores->mov; the reference
    demuxes + decodes it framecrc-identical to its own encode."""
    from libav_tpu.tools import avconv
    src = str(tmp_path / "src.yuv")
    ref_mov = str(tmp_path / "ref.mov")
    our_mov = str(tmp_path / "ours.mov")
    _write_src(src, 96, 64, 3, "yuv422p10le")
    _ref(["-f", "rawvideo", "-pix_fmt", "yuv422p10le", "-s", "96x64",
          "-r", "25", "-i", src, "-c:v", "prores", ref_mov])
    rc = avconv.main(["-v", "error", "-y", "-f", "rawvideo", "-pix_fmt",
                      "yuv422p10le", "-s", "96x64", "-r", "25", "-i", src,
                      "-c:v", "prores", our_mov])
    assert rc == 0
    want = _ref(["-i", ref_mov, "-f", "framecrc", "-"]).decode()
    got = _ref(["-i", our_mov, "-f", "framecrc", "-"]).decode()
    assert got == want
