"""Python-side loader/adapter for the native MJPEG scan decoder.

Falls back to unavailable (the decoder then uses its Python loop) until the
C library is built — see libav_tpu/native/build.py.
"""

from __future__ import annotations

import numpy as np


def available() -> bool:
    from libav_tpu.native.build import get_lib
    return get_lib() is not None


def decode_scan(segments, scan_comps, vlcs, mcus_x, mcus_y, ns, coeffs,
                restart_interval):
    """Decode all MCUs of one scan using the C loop.

    Produces tensors byte-identical to MJPEGDecoder._huffman_scan_py.
    """
    from libav_tpu.native.build import get_lib, get_ffi
    lib = get_lib()
    ffi = get_ffi()

    # flatten VLC tables for the components in use
    def vlc_arrays(vlc):
        return (np.ascontiguousarray(vlc.flat_values),
                np.ascontiguousarray(vlc.flat_lengths),
                vlc.bits)

    n_comp = len(scan_comps)
    dc_v = []
    dc_l = []
    ac_v = []
    ac_l = []
    comp_meta = np.zeros((n_comp, 6), dtype=np.int32)  # h, v, bw, bh, dcbits, acbits
    keep = []
    for i, c in enumerate(scan_comps):
        dv, dl, dbits = vlc_arrays(vlcs[(0, c.dc_idx)])
        av, al, abits = vlc_arrays(vlcs[(1, c.ac_idx)])
        keep += [dv, dl, av, al]
        dc_v.append(ffi.cast("const int*", ffi.from_buffer(dv)))
        dc_l.append(ffi.cast("const signed char*", ffi.from_buffer(dl)))
        ac_v.append(ffi.cast("const int*", ffi.from_buffer(av)))
        ac_l.append(ffi.cast("const signed char*", ffi.from_buffer(al)))
        comp_meta[i] = (c.h, c.v, c.blocks_w, c.blocks_h, dbits, abits)

    out_ptrs = []
    for c in scan_comps:
        arr = coeffs[c.id]
        assert arr.dtype == np.int16 and arr.flags.c_contiguous
        out_ptrs.append(ffi.cast("short*", ffi.from_buffer(arr)))

    meta_p = ffi.cast("const int*", ffi.from_buffer(comp_meta))

    seg_bufs = [ffi.from_buffer(s) for s in segments]
    seg_ptrs = ffi.new("const unsigned char*[]",
                       [ffi.cast("const unsigned char*", b) for b in seg_bufs])
    seg_lens = np.array([len(s) for s in segments], dtype=np.int64)
    seg_lens_p = ffi.cast("const long long*", ffi.from_buffer(seg_lens))

    rc = lib.mjpeg_decode_scan(
        seg_ptrs, seg_lens_p, len(segments),
        meta_p, n_comp,
        ffi.new("const int*[]", dc_v), ffi.new("const signed char*[]", dc_l),
        ffi.new("const int*[]", ac_v), ffi.new("const signed char*[]", ac_l),
        ffi.new("short*[]", out_ptrs),
        mcus_x, mcus_y, ns, restart_interval)
    if rc != 0:
        from libav_tpu.avutil.error import AVError, INVALIDDATA
        raise AVError(INVALIDDATA, f"native mjpeg scan decode failed ({rc})")
