"""Oracle certification (round-5 VERDICT #7): prove the locally built
`.refbuild/avconv` matches UPSTREAM by replaying the reference's own
sample-free FATE recipes (tests/fate-run.sh:131-155 enc_dec over the
videogen/audiogen synthetic sources) and diffing the 4-line outputs
(encoded md5, encoded size, decoded md5, tiny_psnr stats) against the
PINNED checksum trees shipped in /root/reference/tests/ref/{vsynth,
acodec}.  A pass certifies every cross-validation test in this suite
against upstream, closing the both-wrong-the-same-way loophole.

Tooling (videogen/audiogen/tiny_psnr) is compiled from the reference's
own tests/*.c into the cache dir — these binaries generate inputs and
statistics for the ORACLE; nothing from them ships in libav_tpu.
"""

import hashlib
import os
import shutil
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fate_util import REF_AVCONV, have_reference

REF_SRC = "/root/reference"
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".fate_cache", "oracle")

pytestmark = pytest.mark.skipif(
    not have_reference(), reason="reference not built")

# fate-run.sh:126-129
FLAGS = ["-flags", "+bitexact", "-sws_flags", "+accurate_rnd+bitexact",
         "-fflags", "+bitexact"]
DEC_OPTS = ["-threads", "1", "-idct", "simple"] + FLAGS
ENC_OPTS = ["-threads", "1", "-idct", "simple", "-dct", "fastint"]
# fate-run.sh avconv(): injected before -i
DEC_INJ = ["-hwaccel", "none", "-threads", "1",
           "-thread_type", "frame+slice"]
GLOBAL = ["-nostats", "-cpuflags", "all"]


def _build_tool(name: str) -> str:
    out = os.path.join(CACHE, name)
    src = os.path.join(REF_SRC, "tests", name + ".c")
    if not os.path.exists(out):
        os.makedirs(CACHE, exist_ok=True)
        subprocess.run(["gcc", "-O2", "-o", out, src, "-lm"], check=True,
                       cwd=os.path.join(REF_SRC, "tests"))
    return out


@pytest.fixture(scope="module")
def fate_root():
    """Work tree laid out like the reference's so md5/wc lines carry
    the exact pinned relative paths."""
    if shutil.which("gcc") is None:
        pytest.skip("gcc unavailable")
    root = os.path.join(CACHE, "root")
    os.makedirs(os.path.join(root, "tests", "data", "fate"), exist_ok=True)
    vs = os.path.join(root, "tests", "data", "vsynth1.yuv")
    if not os.path.exists(vs):
        subprocess.run([_build_tool("videogen"), vs], check=True)
    aw = os.path.join(root, "tests", "data", "asynth-44100-2.wav")
    if not os.path.exists(aw):
        subprocess.run([_build_tool("audiogen"), aw, "44100", "2"],
                       check=True)
    _build_tool("tiny_psnr")
    return root


def _md5_line(root: str, rel: str) -> str:
    h = hashlib.md5(open(os.path.join(root, rel), "rb").read()).hexdigest()
    return f"{h} *{rel}"


def _size_line(root: str, rel: str) -> str:
    return f"{os.path.getsize(os.path.join(root, rel))} {rel}"


def _enc_dec(root, test, src_fmt_args, src_rel, enc_fmt, enc_opt,
             dec_fmt, dec_opt, cmp_unit, cmp_shift=0):
    """fate-run.sh:131 enc_dec, byte-for-byte output replication."""
    enc_rel = f"tests/data/fate/{test}.{enc_fmt}"
    dec_rel = f"tests/data/fate/{test}.out.{dec_fmt}"
    cmd = ([REF_AVCONV] + GLOBAL + src_fmt_args + DEC_OPTS + DEC_INJ +
           ["-i", src_rel] + ENC_OPTS + enc_opt + FLAGS +
           ["-f", enc_fmt, "-y", enc_rel])
    subprocess.run(cmd, cwd=root, check=True, capture_output=True)
    lines = [_md5_line(root, enc_rel), _size_line(root, enc_rel)]
    cmd = ([REF_AVCONV] + GLOBAL + DEC_OPTS + DEC_INJ +
           ["-i", enc_rel] + ENC_OPTS + dec_opt + FLAGS +
           ["-f", dec_fmt, "-y", dec_rel])
    subprocess.run(cmd, cwd=root, check=True, capture_output=True)
    lines.append(_md5_line(root, dec_rel))
    psnr = subprocess.run(
        [os.path.join(CACHE, "tiny_psnr"), src_rel, dec_rel,
         str(cmp_unit), str(cmp_shift)],
        cwd=root, check=True, capture_output=True, text=True)
    lines.append(psnr.stdout.strip("\n").splitlines()[-1])
    return "\n".join(lines) + "\n"


RAWVIDEO = ["-f", "rawvideo", "-s", "352x288", "-pix_fmt", "yuv420p"]

# (test name, FMT, ENCOPTS, DECOPTS) from tests/fate/vcodec.mak
VSYNTH = [
    ("mjpeg", "avi", ["-qscale", "9", "-pix_fmt", "yuvj420p"], []),
    ("mpeg1", "mpeg1video", ["-qscale", "10"], []),
    ("mpeg1b", "mpeg1video", ["-qscale", "8", "-bf", "3",
                              "-ps", "200"], []),
    ("mpeg2", "mpeg2video", ["-qscale", "10"], []),
    ("mpeg2-ilace", "mpeg2video", ["-qscale", "10", "-flags",
                                   "+ildct+ilme"], []),
    ("mpeg2-idct-int", "mpeg2video", ["-qscale", "10", "-idct", "int",
                                      "-dct", "int"], []),
    ("mpeg4", "mp4", ["-qscale", "10", "-flags", "+mv4",
                      "-mbd", "bits"], []),
    ("mpeg4-rc", "avi", ["-b", "400k", "-bf", "2"], []),
    ("mpeg4-adv", "avi", ["-qscale", "9", "-flags", "+mv4+aic",
                          "-data_partitioning", "1", "-trellis", "1",
                          "-mbd", "bits", "-ps", "200"], []),
    ("mpeg4-qpel", "avi", ["-qscale", "7", "-flags", "+mv4+qpel",
                           "-mbd", "2", "-bf", "2", "-cmp", "1",
                           "-subcmp", "2"], []),
    ("flv", "flv", ["-qscale", "10"], []),
    ("h263", "avi", ["-qscale", "10"], []),
    ("h263p", "avi", ["-qscale", "2", "-flags", "+aic", "-umv", "1",
                      "-aiv", "1", "-ps", "300"], []),
    ("msmpeg4", "avi", ["-qscale", "10"], []),
    ("msmpeg4v2", "avi", ["-qscale", "10"], []),
    ("wmv1", "avi", ["-qscale", "10"], []),
]

# (test name, FMT, codec args, CMP_SHIFT) from tests/fate/acodec.mak
ACODEC = [
    ("pcm-s16le", "wav", ["-c", "pcm_s16le"], 0),
    ("pcm-u8", "wav", ["-c", "pcm_u8"], 0),
    ("pcm-f32le", "wav", ["-c", "pcm_f32le"], 0),
    ("mp2", "mp2", ["-c", "mp2"], -1924),
    ("flac", "flac", ["-c", "flac", "-compression_level", "2"], 0),
]


class TestOracleCertification:
    @pytest.mark.parametrize(
        "name,fmt,encopts,decopts", VSYNTH,
        ids=[f"vsynth1-{v[0]}" for v in VSYNTH])
    def test_vsynth1(self, fate_root, name, fmt, encopts, decopts):
        test = f"vsynth1-{name}"
        codec = {"mpeg1": "mpeg1video", "mpeg1b": "mpeg1video",
                 "mpeg2": "mpeg2video", "mpeg2-ilace": "mpeg2video",
                 "mpeg2-idct-int": "mpeg2video",
                 "mpeg4-rc": "mpeg4", "mpeg4-adv": "mpeg4",
                 "mpeg4-qpel": "mpeg4", "msmpeg4": "msmpeg4v3",
                 }.get(name, name.split("-")[0])
        got = _enc_dec(fate_root, test, RAWVIDEO,
                       "tests/data/vsynth1.yuv", fmt,
                       ["-c", codec] + encopts, "rawvideo",
                       ["-s", "352x288", "-pix_fmt", "yuv420p"] + decopts,
                       cmp_unit=1)
        ref = open(f"{REF_SRC}/tests/ref/vsynth/{test}").read()
        assert got == ref, f"oracle diverges from upstream on {test}"

    @pytest.mark.parametrize("name,fmt,codec,shift", ACODEC,
                             ids=[f"acodec-{a[0]}" for a in ACODEC])
    def test_acodec(self, fate_root, name, fmt, codec, shift):
        test = f"acodec-{name}"
        got = _enc_dec(fate_root, test, ["-f", "wav"],
                       "tests/data/asynth-44100-2.wav", fmt,
                       ["-b", "128k", "-ar", "44100"] + codec, "wav",
                       ["-c", "pcm_s16le"], cmp_unit=2, cmp_shift=shift)
        ref = open(f"{REF_SRC}/tests/ref/acodec/{name}").read()
        assert got == ref, f"oracle diverges from upstream on {test}"
