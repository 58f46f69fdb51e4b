"""Multi-chip sharding dry-run test: __graft_entry__.dryrun_multichip
itself re-execs in a subprocess with JAX_PLATFORMS=cpu and 8 virtual
devices (env must be set before jax import), runs one sharded step of
the REAL H.264 whole-frame reconstruction program over a frame batch,
and cross-checks the sharded planes against single-device recon
bit-exactly. Here we just invoke it under the worst-case env (axon
preset) to prove the driver gate stays green."""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


@pytest.mark.slow
def test_dryrun_multichip_8dev():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def _encode_stream(codec, n_frames, gop_size, w=48, h=32, **opts):
    import numpy as np

    from libav_tpu.avutil.frame import Frame
    from libav_tpu.codecs import find_encoder
    from libav_tpu.codecs.api import CodecParameters, MediaType

    enc = find_encoder(codec)(CodecParameters(
        codec_type=MediaType.VIDEO, codec_id=codec, width=w, height=h))
    enc.set_opt("gop_size", gop_size)
    for k, v in opts.items():
        enc.set_opt(k, v)
    enc.open()
    rng = np.random.default_rng(3)
    base = rng.integers(16, 235, (h * 3 // 2, w)).astype(np.uint8)
    frames = []
    for t in range(n_frames):
        fl = np.roll(base, t * 3, axis=1)
        f = Frame(width=w, height=h, format="yuv420p")
        f.planes = [fl[:h].copy(),
                    fl[h:h + h // 4].reshape(h // 2, w // 2).copy(),
                    fl[h + h // 4:].reshape(h // 2, w // 2).copy()]
        f.pts = t
        frames.append(f)
    return enc.encode_all(frames)


@pytest.mark.parametrize("codec,opts", [
    ("h264", {"qp": 30}),
    ("mpeg1video", {}),
])
def test_gop_parallel_matches_serial(codec, opts):
    """GOPParallelDecoder on a REAL bitstream == serial decode, frame
    order preserved, pixels identical (scheduler of parallel/gop.py)."""
    import numpy as np

    from libav_tpu.codecs import find_decoder
    from libav_tpu.codecs.api import CodecParameters, MediaType
    from libav_tpu.parallel.gop import GOPParallelDecoder, split_gops

    n = 6
    pkts = _encode_stream(codec, n, gop_size=2, **opts)
    gops = split_gops(pkts, codec)
    assert len(gops) >= 3
    assert sum(len(g) for g in gops) == len(pkts)

    par = CodecParameters(codec_type=MediaType.VIDEO, codec_id=codec)
    serial = find_decoder(codec)(par).open().decode_all(list(pkts))
    parallel = GOPParallelDecoder(codec).decode(list(pkts))
    assert len(serial) == len(parallel) == n
    for f1, f2 in zip(serial, parallel):
        for a, b in zip(f1.planes, f2.planes):
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_split_gops_leading_nonkey():
    """Packets before the first keyframe form their own leading
    segment (decoded reference-less, concealed — same as serial)."""
    from libav_tpu.avutil.frame import Packet
    from libav_tpu.parallel.gop import split_gops

    idr = Packet(data=b"\x00\x00\x01\x65")       # IDR NAL
    p = Packet(data=b"\x00\x00\x01\x41")         # non-IDR slice
    gops = split_gops([p, idr, p, idr, p], "h264")
    assert [len(g) for g in gops] == [1, 2, 2]
    assert gops[0][0] is p
