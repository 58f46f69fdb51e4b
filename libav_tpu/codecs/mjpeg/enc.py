"""Baseline JPEG / MJPEG encoder (reference: libavcodec/mjpegenc.c +
ljpegenc shared header writer mjpegenc_common).

Device: plane pad -> blockify -> level shift -> exact int FDCT -> quant ->
zigzag reorder, one jitted call per plane shape (all the FLOPs).
Host: MCU-ordered Huffman pack with the Annex K tables + marker writing
(serial bit work, C fast path in native/jpeg_enc.c when built).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np

from libav_tpu.avutil.error import AVError, EINVAL
from libav_tpu.avutil.frame import Frame, Packet, PKT_FLAG_KEY
from libav_tpu.avutil.opt import Option
from libav_tpu.bitstream import PutBits
from libav_tpu.bitstream.vlc import build_huffman_codes
from libav_tpu.codecs.api import Encoder, MediaType, register_codec
from libav_tpu.codecs.mjpeg import tables as T
from libav_tpu.ops.quant import zigzag_scan


def huff_code_table(bits: List[int], values: List[int], size: int = 256):
    """(bits, values) -> (codes[sym], sizes[sym]) arrays for encoding."""
    codes = build_huffman_codes(bits)
    lengths = []
    for ln, c in enumerate(bits, 1):
        lengths += [ln] * c
    code_arr = np.zeros(size, dtype=np.uint32)
    size_arr = np.zeros(size, dtype=np.uint8)
    for code, ln, sym in zip(codes, lengths, values):
        code_arr[sym] = code
        size_arr[sym] = ln
    return code_arr, size_arr


def _csize(v: int) -> int:
    """JPEG category (number of magnitude bits) of a value."""
    return int(abs(v)).bit_length()


_SAMPLING = {
    "yuvj420p": [(2, 2), (1, 1), (1, 1)],
    "yuv420p": [(2, 2), (1, 1), (1, 1)],
    "yuvj422p": [(2, 1), (1, 1), (1, 1)],
    "yuv422p": [(2, 1), (1, 1), (1, 1)],
    "yuvj444p": [(1, 1), (1, 1), (1, 1)],
    "yuv444p": [(1, 1), (1, 1), (1, 1)],
    "gray": [(1, 1)],
}


@register_codec
class MJPEGEncoder(Encoder):
    NAME = "mjpeg"
    TYPE = MediaType.VIDEO
    LONG_NAME = "Motion JPEG (TPU-batched FDCT/quant)"

    OPTIONS = Encoder.OPTIONS + [
        Option("quality", "JPEG quality 1-100", "int", 90, 1, 100),
        Option("qscale", "mpeg-style qscale 1-31 (overrides quality)",
               "int", 0, 0, 31),
    ]

    def _init(self):
        q = self.quality
        if self.qscale:
            # map qscale 1..31 -> IJG quality, same spirit as the
            # reference's ff_convert_matrix qscale scaling
            q = max(2, min(97, int(round(100 - (self.qscale - 1) * 97 / 30))))
        self.qmat = [T.scale_quant_table(T.STD_LUMINANCE_QUANT, q),
                     T.scale_quant_table(T.STD_CHROMINANCE_QUANT, q)]
        self.dc_tabs = [huff_code_table(*T.STD_DC_LUMINANCE, 16),
                        huff_code_table(*T.STD_DC_CHROMINANCE, 16)]
        self.ac_tabs = [huff_code_table(*T.STD_AC_LUMINANCE, 256),
                        huff_code_table(*T.STD_AC_CHROMINANCE, 256)]

    # ------------------------------------------------------------------ #

    def _encode(self, frame: Frame) -> List[Packet]:
        fmt = frame.format
        if fmt not in _SAMPLING:
            raise AVError(EINVAL, f"mjpeg encoder: unsupported pix_fmt {fmt}")
        sampling = _SAMPLING[fmt]
        hmax = max(h for h, v in sampling)
        vmax = max(v for h, v in sampling)
        mcus_x = (frame.width + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (frame.height + 8 * vmax - 1) // (8 * vmax)

        levels = []       # per comp: (bh*bw, 64) int zigzag-order levels
        comp_dims = []    # per comp: (bh, bw)
        for ci, (h, v) in enumerate(sampling):
            plane = np.asarray(frame.planes[ci])
            bw, bh = mcus_x * h, mcus_y * v
            tabidx = 0 if ci == 0 else 1
            lv = _encode_plane_jit(bh, bw)(
                _pad_plane(plane, bh * 8, bw * 8),
                self.qmat[tabidx])
            levels.append(np.asarray(lv).astype(np.int16))
            comp_dims.append((bh, bw))

        data = self._pack(levels, comp_dims, sampling, frame.width,
                          frame.height, mcus_x, mcus_y)
        pkt = Packet(data=data, pts=frame.pts, dts=frame.pts,
                     flags=PKT_FLAG_KEY, time_base=frame.time_base)
        return [pkt]

    # ------------------------------------------------------------------ #

    def _pack(self, levels, comp_dims, sampling, width, height,
              mcus_x, mcus_y) -> bytes:
        out = bytearray()
        out += b"\xFF\xD8"                         # SOI
        # JFIF APP0
        app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xFF\xE0" + (len(app0) + 2).to_bytes(2, "big") + app0
        # DQT (zigzag order on the wire)
        zz = zigzag_scan()
        for ti in range(min(2, len(sampling))):
            body = bytes([ti]) + bytes(int(self.qmat[ti][z]) for z in zz)
            out += b"\xFF\xDB" + (len(body) + 2).to_bytes(2, "big") + body
        # SOF0
        sof = bytearray([8])
        sof += height.to_bytes(2, "big") + width.to_bytes(2, "big")
        sof.append(len(sampling))
        for ci, (h, v) in enumerate(sampling):
            sof += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])
        out += b"\xFF\xC0" + (len(sof) + 2).to_bytes(2, "big") + bytes(sof)
        # DHT x4 (or x2 for gray)
        hts = [(0, 0, T.STD_DC_LUMINANCE), (1, 0, T.STD_AC_LUMINANCE)]
        if len(sampling) > 1:
            hts += [(0, 1, T.STD_DC_CHROMINANCE), (1, 1, T.STD_AC_CHROMINANCE)]
        for tc, th, (bits, vals) in hts:
            body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
            out += b"\xFF\xC4" + (len(body) + 2).to_bytes(2, "big") + body
        # SOS
        sos = bytearray([len(sampling)])
        for ci in range(len(sampling)):
            t = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (t << 4) | t])
        sos += bytes([0, 63, 0])
        out += b"\xFF\xDA" + (len(sos) + 2).to_bytes(2, "big") + bytes(sos)
        # entropy-coded scan
        scan = self._encode_scan(levels, comp_dims, sampling, mcus_x, mcus_y)
        out += scan
        out += b"\xFF\xD9"                         # EOI
        return bytes(out)

    def _encode_scan(self, levels, comp_dims, sampling, mcus_x, mcus_y) -> bytes:
        from libav_tpu.native import jpeg_enc as native
        raw = None
        if native.available():
            raw = native.encode_scan(levels, comp_dims, sampling,
                                     self.dc_tabs, self.ac_tabs,
                                     mcus_x, mcus_y)
        if raw is None:
            raw = self._encode_scan_py(levels, comp_dims, sampling,
                                       mcus_x, mcus_y)
        # byte stuffing
        return raw.replace(b"\xFF", b"\xFF\x00")

    def _encode_scan_py(self, levels, comp_dims, sampling, mcus_x, mcus_y) -> bytes:
        pb = PutBits()
        dc_pred = [0] * len(sampling)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (h, v) in enumerate(sampling):
                    bh, bw = comp_dims[ci]
                    t = 0 if ci == 0 else 1
                    dct_c, dct_s = self.dc_tabs[t]
                    act_c, act_s = self.ac_tabs[t]
                    for bv in range(v):
                        for bhx in range(h):
                            bx, by = mx * h + bhx, my * v + bv
                            blk = levels[ci][by * bw + bx]
                            dc_pred[ci] = self._put_block(
                                pb, blk, dc_pred[ci],
                                dct_c, dct_s, act_c, act_s)
        pb.align(pad_bit=1)
        return pb.flush()

    @staticmethod
    def _put_block(pb, blk, dc_pred, dct_c, dct_s, act_c, act_s) -> int:
        dc = int(blk[0])
        diff = dc - dc_pred
        sz = _csize(diff)
        pb.put_bits(int(dct_s[sz]), int(dct_c[sz]))
        if sz:
            pb.put_bits(sz, diff & ((1 << sz) - 1) if diff >= 0 else (diff + (1 << sz) - 1))
        run = 0
        for k in range(1, 64):
            val = int(blk[k])
            if val == 0:
                run += 1
                continue
            while run > 15:
                pb.put_bits(int(act_s[0xF0]), int(act_c[0xF0]))  # ZRL
                run -= 16
            sz = _csize(val)
            sym = (run << 4) | sz
            pb.put_bits(int(act_s[sym]), int(act_c[sym]))
            pb.put_bits(sz, val & ((1 << sz) - 1) if val >= 0 else (val + (1 << sz) - 1))
            run = 0
        if run:
            pb.put_bits(int(act_s[0]), int(act_c[0]))  # EOB
        return dc


def _pad_plane(plane: np.ndarray, H: int, W: int) -> np.ndarray:
    """Edge-replicate pad to coded size (reference: encoders pad with edge
    pixels to avoid ringing — mpegvideoencdsp draw_edges)."""
    h, w = plane.shape
    if h == H and w == W:
        return plane
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


@functools.lru_cache(maxsize=64)
def _encode_plane_jit(blocks_h: int, blocks_w: int):
    """(H, W) uint8 plane + (64,) raster qmat -> (nb, 64) int32 zigzag
    quantized levels."""
    import jax
    import jax.numpy as jnp

    from libav_tpu.ops import fdct
    from libav_tpu.ops.quant import jpeg_quant, zigzag_scan

    zz = zigzag_scan()

    def fn(plane, qmat_raster):
        blocks = (plane.reshape(blocks_h, 8, blocks_w, 8)
                  .transpose(0, 2, 1, 3)
                  .reshape(blocks_h * blocks_w, 8, 8))
        resid = blocks.astype(jnp.int32) - 128
        coeffs = fdct.fdct8x8_int(resid)                     # x8 scale
        q8 = qmat_raster.astype(jnp.int32) * fdct.FDCT_OUT_SCALE
        lv = jpeg_quant(coeffs.reshape(-1, 64), q8)
        return lv[:, zz]                                      # zigzag order

    return jax.jit(fn)
