"""MJPEG / baseline JPEG decoder (reference: libavcodec/mjpegdec.c:
ff_mjpeg_decode_frame :1488, scan loop mjpeg_decode_scan :859, per-block
Huffman decode_block :467 -> idct_put :923).

Host: marker parse + Huffman scan decode into per-component
(nb_blocks, 64) zigzag-order coefficient tensors (raster block order).
Device: dequant -> dezigzag -> exact int IDCT -> clamp -> plane reshape,
jitted once per (blocks_h, blocks_w) shape.

The Python scan decoder is the reference implementation; the C fast path
(libav_tpu/native/mjpeg_scan.c) decodes identical tensors and is used
automatically when built.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from libav_tpu.avutil import log
from libav_tpu.avutil.error import AVError, INVALIDDATA
from libav_tpu.avutil.frame import Frame, Packet, PictureType
from libav_tpu.bitstream import GetBits, VLC
from libav_tpu.bitstream.vlc import build_huffman_codes
from libav_tpu.codecs.api import Decoder, MediaType, register_codec

# JPEG markers (ITU-T T.81 table B.1)
SOI, EOI, SOS, DQT, DHT, DRI, COM = 0xD8, 0xD9, 0xDA, 0xDB, 0xC4, 0xDD, 0xFE
SOF0, SOF1, SOF2, SOF3 = 0xC0, 0xC1, 0xC2, 0xC3
RST0, RST7 = 0xD0, 0xD7
APP0 = 0xE0


@dataclass
class Component:
    id: int = 0
    h: int = 1
    v: int = 1
    quant_idx: int = 0
    dc_idx: int = 0
    ac_idx: int = 0
    # derived per frame
    blocks_w: int = 0
    blocks_h: int = 0


@functools.lru_cache(maxsize=64)
def _build_jpeg_vlc_cached(bits: tuple, values: tuple) -> VLC:
    codes = build_huffman_codes(bits)
    lengths = []
    for ln, c in enumerate(bits, 1):
        lengths += [ln] * c
    return VLC(9, codes=codes, lengths=lengths, values=list(values))


def build_jpeg_vlc(bits: List[int], values: List[int]) -> VLC:
    """DHT (bits, values) -> VLC (reference: mjpegdec.c build_vlc).
    Cached — MJPEG streams repeat identical DHT segments every frame."""
    return _build_jpeg_vlc_cached(tuple(bits), tuple(values))


def _receive_signed(gb: GetBits, n: int) -> int:
    """JPEG 'receive and extend' (T.81 F.2.2.1): n-bit value, MSB 0 means
    negative: v - (2^n - 1)."""
    if n == 0:
        return 0
    v = gb.get_bits(n)
    if v < (1 << (n - 1)):
        v -= (1 << n) - 1
    return v


def destuff(data: bytes) -> Tuple[List[bytes], int]:
    """Split entropy-coded data at RST markers and remove 0xFF00 stuffing.
    Returns (segments, bytes_consumed_up_to_the_terminating_marker).

    Scans only the 0xFF positions (bytes.find) and strips stuffing with
    one bytes.replace per segment — C speed instead of a per-byte Python
    loop (this was 30% of 1080p decode time).
    """
    n = len(data)
    boundaries = []      # byte offsets where RST markers sit
    i = 0
    end = n
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            end = n
            break
        m = data[j + 1]
        if m == 0x00:
            i = j + 2
        elif RST0 <= m <= RST7:
            boundaries.append(j)
            i = j + 2
        else:
            end = j
            break
    segments = []
    start = 0
    for b in boundaries:
        segments.append(data[start:b].replace(b"\xff\x00", b"\xff"))
        start = b + 2
    segments.append(data[start:end].replace(b"\xff\x00", b"\xff"))
    return segments, end


@register_codec
class MJPEGDecoder(Decoder):
    NAME = "mjpeg"
    TYPE = MediaType.VIDEO
    LONG_NAME = "Motion JPEG (TPU-batched reconstruction)"

    def _init(self):
        self.quant_tables: Dict[int, np.ndarray] = {}
        self.vlcs: Dict[Tuple[int, int], VLC] = {}   # (class, id)
        self.restart_interval = 0
        self._use_native = None  # resolved lazily

    def _flush(self):
        pass

    # ------------------------------------------------------------------ #

    def _decode(self, pkt: Packet) -> List[Frame]:
        frame = self.decode_jpeg(pkt.data)
        frame.pts = pkt.pts
        frame.time_base = pkt.time_base
        frame.pict_type = PictureType.I
        frame.key_frame = True
        return [frame]

    # ------------------------------------------------------------------ #

    def decode_jpeg(self, data: bytes) -> Frame:
        if len(data) < 4 or data[0] != 0xFF or data[1] != SOI:
            raise AVError(INVALIDDATA, "no SOI marker")
        pos = 2
        components: List[Component] = []
        width = height = 0
        precision = 8
        self.restart_interval = 0
        frame = None
        progressive = False

        while pos < len(data) - 1:
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            pos += 2
            if marker == SOI or (RST0 <= marker <= RST7) or marker == 0xFF:
                continue
            if marker == EOI:
                break
            if pos + 2 > len(data):
                raise AVError(INVALIDDATA, "truncated marker segment")
            seglen = (data[pos] << 8) | data[pos + 1]
            seg = data[pos + 2:pos + seglen]
            if marker == DQT:
                self._parse_dqt(seg)
            elif marker == DHT:
                self._parse_dht(seg)
            elif marker == DRI:
                self.restart_interval = (seg[0] << 8) | seg[1]
            elif marker in (SOF0, SOF1, SOF2):
                precision, height, width, components = self._parse_sof(seg)
                progressive = marker == SOF2
                if progressive:
                    self._prog_init(width, height, components)
            elif marker == SOS:
                scan_data = data[pos + seglen:]
                if progressive:
                    consumed = self._decode_scan_progressive(
                        seg, scan_data, width, height, components)
                else:
                    frame, consumed = self._decode_scan(
                        seg, scan_data, width, height, components)
                pos = pos + seglen + consumed
                continue
            pos += seglen
        if progressive:
            frame = self._reconstruct(width, height, components,
                                      self._prog_coeffs)
        if frame is None:
            raise AVError(INVALIDDATA, "no scan decoded")
        return frame

    # ------------------------------------------------------------------ #

    def _parse_dqt(self, seg: bytes):
        """reference: mjpegdec.c ff_mjpeg_decode_dqt"""
        i = 0
        while i < len(seg):
            pq = seg[i] >> 4
            tq = seg[i] & 15
            i += 1
            if pq:
                vals = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.int32)
                i += 128
            else:
                vals = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.int32)
                i += 64
            self.quant_tables[tq] = vals  # zigzag order, as transmitted

    def _parse_dht(self, seg: bytes):
        """reference: mjpegdec.c ff_mjpeg_decode_dht"""
        i = 0
        while i < len(seg):
            tc = seg[i] >> 4   # 0=DC, 1=AC
            th = seg[i] & 15
            i += 1
            bits = list(seg[i:i + 16])
            i += 16
            n = sum(bits)
            values = list(seg[i:i + n])
            i += n
            self.vlcs[(tc, th)] = build_jpeg_vlc(bits, values)

    def _parse_sof(self, seg: bytes):
        """reference: mjpegdec.c ff_mjpeg_decode_sof"""
        precision = seg[0]
        height = (seg[1] << 8) | seg[2]
        width = (seg[3] << 8) | seg[4]
        ncomp = seg[5]
        comps = []
        for c in range(ncomp):
            o = 6 + c * 3
            comps.append(Component(
                id=seg[o], h=seg[o + 1] >> 4, v=seg[o + 1] & 15,
                quant_idx=seg[o + 2]))
        self.width = width
        self.height = height
        return precision, height, width, comps

    # ------------------------------------------------------------------ #

    def _decode_scan(self, sos: bytes, scan_data: bytes, width: int,
                     height: int, components: List[Component]):
        """reference: mjpegdec.c ff_mjpeg_decode_sos + mjpeg_decode_scan"""
        ns = sos[0]
        scan_comps = []
        for i in range(ns):
            cid = sos[1 + 2 * i]
            tabs = sos[2 + 2 * i]
            comp = next((c for c in components if c.id == cid), None)
            if comp is None:
                raise AVError(INVALIDDATA, f"SOS references unknown component {cid}")
            comp.dc_idx = tabs >> 4
            comp.ac_idx = tabs & 15
            scan_comps.append(comp)

        hmax = max(c.h for c in components)
        vmax = max(c.v for c in components)
        mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

        if ns == 1 and len(components) > 1:
            # non-interleaved single-component scan
            c = scan_comps[0]
            cw = (width * c.h + hmax - 1) // hmax
            ch = (height * c.v + vmax - 1) // vmax
            c.blocks_w = (cw + 7) // 8
            c.blocks_h = (ch + 7) // 8
        else:
            for c in scan_comps:
                c.blocks_w = mcus_x * c.h
                c.blocks_h = mcus_y * c.v

        segments, consumed = destuff(scan_data)
        coeffs = {c.id: np.zeros((c.blocks_h * c.blocks_w, 64), dtype=np.int16)
                  for c in scan_comps}

        self._huffman_scan(segments, scan_comps, mcus_x, mcus_y, ns, coeffs)

        frame = self._reconstruct(width, height, components, coeffs)
        return frame, consumed

    def _huffman_scan(self, segments, scan_comps, mcus_x, mcus_y, ns, coeffs):
        """Entropy decode all MCUs (host-serial). Tries the native C fast
        path first; falls back to the Python reference loop."""
        from libav_tpu.native import mjpeg_scan as native
        if native.available():
            native.decode_scan(segments, scan_comps, self.vlcs,
                               mcus_x, mcus_y, ns, coeffs,
                               self.restart_interval)
            return
        self._huffman_scan_py(segments, scan_comps, mcus_x, mcus_y, ns, coeffs)

    def _huffman_scan_py(self, segments, scan_comps, mcus_x, mcus_y, ns, coeffs):
        n_mcus = (mcus_x * mcus_y if ns > 1 or len(scan_comps) == 1
                  else scan_comps[0].blocks_w * scan_comps[0].blocks_h)
        if ns == 1:
            c = scan_comps[0]
            n_mcus = c.blocks_w * c.blocks_h
        ri = self.restart_interval or n_mcus
        seg_idx = 0
        gb = GetBits(segments[0])
        dc_pred = {c.id: 0 for c in scan_comps}
        mcu = 0
        while mcu < n_mcus:
            if mcu and mcu % ri == 0:
                seg_idx += 1
                if seg_idx < len(segments):
                    gb = GetBits(segments[seg_idx])
                dc_pred = {c.id: 0 for c in scan_comps}
            if ns == 1:
                c = scan_comps[0]
                self._decode_block(gb, c, dc_pred, coeffs[c.id][mcu])
            else:
                mx, my = mcu % mcus_x, mcu // mcus_x
                for c in scan_comps:
                    for v in range(c.v):
                        for h in range(c.h):
                            bx = mx * c.h + h
                            by = my * c.v + v
                            blk = coeffs[c.id][by * c.blocks_w + bx]
                            self._decode_block(gb, c, dc_pred, blk)
            mcu += 1

    # ------------------------------------------------------------------ #
    # Progressive mode (reference: mjpegdec.c mjpeg_decode_scan_progressive_ac,
    # decode_block_progressive / decode_block_refinement)
    # ------------------------------------------------------------------ #

    def _prog_init(self, width, height, components):
        hmax = max(c.h for c in components)
        vmax = max(c.v for c in components)
        self._prog_coeffs = {}
        for c in components:
            cw = (width * c.h + hmax - 1) // hmax
            ch = (height * c.v + vmax - 1) // vmax
            c.blocks_w = (cw + 7) // 8
            c.blocks_h = (ch + 7) // 8
            self._prog_coeffs[c.id] = np.zeros(
                (c.blocks_h * c.blocks_w, 64), dtype=np.int32)

    def _decode_scan_progressive(self, sos, scan_data, width, height,
                                 components):
        ns = sos[0]
        scan_comps = []
        for i in range(ns):
            cid = sos[1 + 2 * i]
            tabs = sos[2 + 2 * i]
            comp = next((c for c in components if c.id == cid), None)
            if comp is None:
                raise AVError(INVALIDDATA, "SOS unknown component")
            comp.dc_idx = tabs >> 4
            comp.ac_idx = tabs & 15
            scan_comps.append(comp)
        ss = sos[1 + 2 * ns]
        se = sos[2 + 2 * ns]
        ahal = sos[3 + 2 * ns]
        ah, al = ahal >> 4, ahal & 15

        hmax = max(c.h for c in components)
        vmax = max(c.v for c in components)
        mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

        segments, consumed = destuff(scan_data)
        coeffs = self._prog_coeffs

        if ss == 0:
            self._prog_dc_scan(segments, scan_comps, mcus_x, mcus_y, ns,
                               coeffs, ah, al)
        else:
            if ns != 1:
                raise AVError(INVALIDDATA,
                              "interleaved progressive AC scan")
            self._prog_ac_scan(segments, scan_comps[0], coeffs, ss, se,
                               ah, al)
        return consumed

    def _prog_dc_scan(self, segments, scan_comps, mcus_x, mcus_y, ns,
                      coeffs, ah, al):
        n_mcus = mcus_x * mcus_y if ns > 1 else \
            scan_comps[0].blocks_w * scan_comps[0].blocks_h
        ri = self.restart_interval or n_mcus
        seg_idx = 0
        gb = GetBits(segments[0])
        dc_pred = {c.id: 0 for c in scan_comps}

        def one_block(c, blk):
            if ah == 0:
                dc_vlc = self.vlcs[(0, c.dc_idx)]
                sz = dc_vlc.read(gb)
                diff = _receive_signed(gb, sz)
                dc_pred[c.id] += diff
                if blk is not None:
                    blk[0] = dc_pred[c.id] << al
            else:
                bit = gb.get_bits(1)
                if blk is not None and bit:
                    blk[0] |= 1 << al

        for mcu in range(n_mcus):
            if mcu and mcu % ri == 0:
                seg_idx += 1
                if seg_idx < len(segments):
                    gb = GetBits(segments[seg_idx])
                dc_pred = {c.id: 0 for c in scan_comps}
            if ns == 1:
                c = scan_comps[0]
                one_block(c, coeffs[c.id][mcu])
            else:
                mx, my = mcu % mcus_x, mcu // mcus_x
                for c in scan_comps:
                    for v in range(c.v):
                        for h in range(c.h):
                            bx, by = mx * c.h + h, my * c.v + v
                            if bx < c.blocks_w and by < c.blocks_h:
                                one_block(c, coeffs[c.id][
                                    by * c.blocks_w + bx])
                            else:
                                one_block(c, None)   # pad block: consume

    def _prog_ac_scan(self, segments, c, coeffs, ss, se, ah, al):
        n_blocks = c.blocks_w * c.blocks_h
        ri = self.restart_interval or n_blocks
        seg_idx = 0
        gb = GetBits(segments[0])
        ac_vlc = self.vlcs[(1, c.ac_idx)]
        eobrun = 0
        for b in range(n_blocks):
            if b and b % ri == 0:
                seg_idx += 1
                if seg_idx < len(segments):
                    gb = GetBits(segments[seg_idx])
                eobrun = 0
            blk = coeffs[c.id][b]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = ac_vlc.read(gb)
                    r, sz = rs >> 4, rs & 15
                    if sz == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += gb.get_bits(r)
                            break
                        k += 16
                        continue
                    k += r
                    if k > se:
                        raise AVError(INVALIDDATA, "AC index overflow")
                    blk[k] = _receive_signed(gb, sz) << al
                    k += 1
            else:
                eobrun = self._prog_ac_refine(gb, ac_vlc, blk, ss, se,
                                              al, eobrun)

    def _prog_ac_refine(self, gb, ac_vlc, blk, ss, se, al, eobrun):
        """reference: mjpegdec.c decode_block_refinement + the spec
        G.1.2.3 correction-bit procedure."""
        one = 1 << al
        k = ss
        if not eobrun:
            while k <= se:
                rs = ac_vlc.read(gb)
                r, sz = rs >> 4, rs & 15
                newval = 0
                if sz == 0:
                    if r != 15:
                        # refinement EOB run includes the current block,
                        # which still receives its correction bits below
                        eobrun = 1 << r
                        if r:
                            eobrun += gb.get_bits(r)
                        break
                else:
                    newval = one if gb.get_bits(1) else -one
                # advance over r zero-history coefficients, refining any
                # nonzero-history ones passed on the way
                while k <= se:
                    if blk[k]:
                        if gb.get_bits(1) and not (abs(blk[k]) & one):
                            blk[k] += one if blk[k] > 0 else -one
                    else:
                        if r == 0:
                            if newval:
                                blk[k] = newval
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun:
            # correction bits for the rest of the band
            while k <= se:
                if blk[k]:
                    if gb.get_bits(1) and not (abs(blk[k]) & one):
                        blk[k] += one if blk[k] > 0 else -one
                k += 1
            eobrun -= 1
        return eobrun

    def _decode_block(self, gb: GetBits, c: Component, dc_pred, out):
        """reference: mjpegdec.c decode_block :467"""
        dc_vlc = self.vlcs[(0, c.dc_idx)]
        ac_vlc = self.vlcs[(1, c.ac_idx)]
        s = dc_vlc.read(gb)
        diff = _receive_signed(gb, s)
        dc_pred[c.id] += diff
        out[0] = dc_pred[c.id]
        k = 0
        while k < 63:
            rs = ac_vlc.read(gb)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r + 1
            if k > 63:
                raise AVError(INVALIDDATA, "AC coefficient index overflow")
            out[k] = _receive_signed(gb, s)

    # ------------------------------------------------------------------ #
    # Batched decode (the TPU-native path: N frames per device dispatch)
    # ------------------------------------------------------------------ #

    def decode_jpeg_batch(self, datas: List[bytes]) -> List[Frame]:
        """Host-scan every packet, then reconstruct the whole batch with
        ONE jitted device call per component shape — the frame-batch axis
        that replaces the reference's frame threading (SURVEY.md §2.10)."""
        parsed = []
        for data in datas:
            saved = self._reconstruct
            store = {}

            def capture(width, height, components, coeffs,
                        _s=store):
                _s.update(width=width, height=height,
                          components=components, coeffs=coeffs)
                return Frame(width=width, height=height, format="yuvj420p")

            self._reconstruct = capture
            try:
                self.decode_jpeg(data)
            finally:
                self._reconstruct = saved
            parsed.append(store)

        if not parsed:
            return []
        # group by identical geometry: stack coeff tensors per component
        first = parsed[0]
        comps = first["components"]
        hmax = max(c.h for c in comps)
        vmax = max(c.v for c in comps)
        frames = [Frame(width=p["width"], height=p["height"],
                        format=self._pick_pix_fmt(p["components"], hmax, vmax),
                        color_range="pc") for p in parsed]
        B = len(parsed)
        for ci, c in enumerate(comps):
            stack = np.stack([p["coeffs"][c.id] for p in parsed])
            qmat = self.quant_tables[c.quant_idx]
            planes = _reconstruct_plane_batch_jit(c.blocks_h, c.blocks_w)(
                stack.reshape(B * c.blocks_h * c.blocks_w, 64), qmat, B)
            cw = -(-first["width"] * c.h // hmax)
            ch = -(-first["height"] * c.v // vmax)
            for bi in range(B):
                frames[bi].planes.append(planes[bi, :ch, :cw])
        return frames

    # ------------------------------------------------------------------ #
    # Device reconstruction
    # ------------------------------------------------------------------ #

    def _reconstruct(self, width, height, components, coeffs) -> Frame:
        hmax = max(c.h for c in components)
        vmax = max(c.v for c in components)
        planes = []
        for c in components:
            qmat = self.quant_tables[c.quant_idx]
            plane = _reconstruct_plane_jit(c.blocks_h, c.blocks_w)(
                coeffs[c.id], qmat)
            cw = -(-width * c.h // hmax)
            ch = -(-height * c.v // vmax)
            planes.append(plane[:ch, :cw])

        fmt = self._pick_pix_fmt(components, hmax, vmax)
        f = Frame(width=width, height=height, format=fmt,
                  color_range="pc")
        f.planes = list(planes)
        return f

    @staticmethod
    def _pick_pix_fmt(components, hmax, vmax) -> str:
        if len(components) == 1:
            return "gray"
        if len(components) == 3:
            c1 = components[1]
            sub_w = hmax // max(c1.h, 1)
            sub_h = vmax // max(c1.v, 1)
            return {(2, 2): "yuvj420p", (2, 1): "yuvj422p",
                    (1, 1): "yuvj444p", (4, 1): "yuv411p",
                    (4, 4): "yuv410p"}.get((sub_w, sub_h), "yuvj420p")
        raise AVError(INVALIDDATA, f"unsupported component count {len(components)}")


@functools.lru_cache(maxsize=64)
def _reconstruct_plane_jit(blocks_h: int, blocks_w: int):
    """Jitted device pipeline for one plane shape:
    (nb, 64) zigzag coeffs + (64,) zigzag qmat -> (H, W) uint8."""
    import jax
    import jax.numpy as jnp

    from libav_tpu.ops import idct, quant

    def fn(coeffs_zz, qmat_zz):
        deq = coeffs_zz.astype(jnp.int32) * qmat_zz.astype(jnp.int32)
        # the +128 level shift rides inside the DC coefficient through
        # the IDCT (reference: mjpegdec.c:962 last_dc[i] = 1024)
        deq = deq.at[:, 0].add(1024)
        blocks = quant.dezigzag(deq)
        pix = idct.idct_put(blocks)
        return (pix.reshape(blocks_h, blocks_w, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(blocks_h * 8, blocks_w * 8))

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def _reconstruct_plane_batch_jit(blocks_h: int, blocks_w: int):
    """Batched variant of _reconstruct_plane_jit: (B*nb, 64) coeffs ->
    (B, H, W) planes in one dispatch."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from libav_tpu.ops import idct, quant

    @partial(jax.jit, static_argnums=2)
    def fn(coeffs_zz, qmat_zz, B):
        deq = coeffs_zz.astype(jnp.int32) * qmat_zz.astype(jnp.int32)
        deq = deq.at[:, 0].add(1024)     # mjpegdec.c:962 last_dc = 1024
        blocks = quant.dezigzag(deq)
        pix = idct.idct_put(blocks)
        return (pix.reshape(B, blocks_h, blocks_w, 8, 8)
                .transpose(0, 1, 3, 2, 4)
                .reshape(B, blocks_h * 8, blocks_w * 8))

    return fn
