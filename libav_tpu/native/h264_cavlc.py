"""Adapter for the native H.264 CAVLC slice decoder.

The FrameData tensors live in ONE contiguous int32 block (layout below,
mirrored in h264_cavlc.c) so a slice decode is a single zero-copy C call;
numpy views expose the per-field arrays to the Python side.
"""

from __future__ import annotations

import numpy as np

# per-MB int32 words: intra 1, luma_mode 1, chroma_mode 1, mv 2, qp 1,
# luma_dc 16, luma_ac 256, chroma_dc 8, chroma_ac 128, nnz_y 16,
# nnz_u 4, nnz_v 4, coded 1
WORDS_PER_MB = 1 + 1 + 1 + 2 + 1 + 16 + 256 + 8 + 128 + 16 + 4 + 4 + 1


def available() -> bool:
    from libav_tpu.native.build import get_lib, _present
    if not any(s == "h264_cavlc.c" for s, _ in _present()):
        return False
    return get_lib() is not None


def alloc_block(nmb: int) -> np.ndarray:
    return np.zeros(nmb * WORDS_PER_MB, dtype=np.int32)


def views(block: np.ndarray, nmb: int, mb_w: int, mb_h: int) -> dict:
    o = 0

    def take(n, shape):
        nonlocal o
        v = block[o:o + n].reshape(shape)
        o += n
        return v

    return dict(
        intra=take(nmb, (nmb,)),
        luma_mode=take(nmb, (nmb,)),
        chroma_mode=take(nmb, (nmb,)),
        mv=take(2 * nmb, (nmb, 2)),
        qp=take(nmb, (nmb,)),
        luma_dc=take(16 * nmb, (nmb, 16)),
        luma_ac=take(256 * nmb, (nmb, 16, 16)),
        chroma_dc=take(8 * nmb, (nmb, 2, 4)),
        chroma_ac=take(128 * nmb, (nmb, 8, 16)),
        nnz_y=take(16 * nmb, (4 * mb_h, 4 * mb_w)),
        nnz_u=take(4 * nmb, (2 * mb_h, 2 * mb_w)),
        nnz_v=take(4 * nmb, (2 * mb_h, 2 * mb_w)),
        coded=take(nmb, (nmb,)),
    )


def alloc_sparse(nmb: int):
    """(yvals, cvals, sctx) side-channel buffers: the C decoder appends
    each coded 4x4 block's 16 coefficients (int16) plus its flat block
    index; sctx = [ycount, ccount, yidx..., cidx...]."""
    return (np.zeros((nmb * 16, 16), dtype=np.int16),
            np.zeros((nmb * 8, 16), dtype=np.int16),
            np.zeros(2 + 24 * nmb, dtype=np.int32))


def decode_slice(block: np.ndarray, rbsp: bytes, mb_w: int, mb_h: int,
                 first_mb: int, slice_type: int, qp: int,
                 bit_offset: int = 0, sparse=None, num_ref: int = 1,
                 ref_idx: np.ndarray = None) -> int:
    """Run the C MB loop over `rbsp`, starting `bit_offset` bits into the
    first byte (the slice header ends mid-byte). Returns 0 on success.
    For multi-reference slices pass num_ref>1 and an int32 (nmb,)
    ref_idx output array."""
    from libav_tpu.native.build import get_lib, get_ffi
    lib = get_lib()
    ffi = get_ffi()
    params = np.array([mb_w, mb_h, first_mb, slice_type, qp, bit_offset,
                       num_ref], dtype=np.int32)
    if sparse is not None:
        yvals, cvals, sctx = sparse
        yv = ffi.cast("short*", ffi.from_buffer(yvals))
        cv = ffi.cast("short*", ffi.from_buffer(cvals))
        sc = ffi.cast("int*", ffi.from_buffer(sctx))
    else:
        yv = cv = sc = ffi.NULL
    if ref_idx is not None:
        rg = ffi.cast("int*", ffi.from_buffer(ref_idx))
    else:
        rg = ffi.NULL
    rc = lib.h264_cavlc_decode_slice(
        ffi.cast("const unsigned char*", ffi.from_buffer(rbsp)), len(rbsp),
        ffi.cast("const int*", ffi.from_buffer(params)),
        rg,                                         # ref_idx grid out
        yv,                                         # sparse luma values
        ffi.cast("int*", ffi.from_buffer(block)),   # the tensor block
        cv,                                         # sparse chroma values
        sc)                                         # sparse counts+indices
    return rc
