"""MPEG-1/2 video decoder (reference: libavcodec/mpeg12dec.c:
mpeg_decode_frame :2516 -> decode_chunks :2250 -> mpeg_decode_slice :1642,
per-MB mpeg_decode_mb :659 + ff_mpv_decode_mb path mpegvideo.c:1700).

Host: start-code walk, headers, per-slice entropy decode producing
whole-frame tensors; device: one jitted dequant+IDCT+MC+add program per
frame geometry (_recon_jit).

Supported: MPEG-1 I/P/B CPB; MPEG-2 main profile frame pictures
(progressive + interlaced tools: field MC in frame pictures with per-
field vectors/selects and field DCT, intra_dc_precision, q_scale_type,
intra_vlc_format, alternate_scan, both dequant paths with mismatch
control). Field pictures (picture_structure != frame) and dual-prime
are round-2 items.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from libav_tpu.avutil import log
from libav_tpu.avutil.error import AVError, EAGAIN, EOF_, INVALIDDATA
from libav_tpu.avutil.frame import Frame, Packet, PictureType
from libav_tpu.avutil.rational import Rational
from libav_tpu.bitstream import GetBits
from libav_tpu.codecs.api import Decoder, MediaType, register_codec
from libav_tpu.codecs.mpeg12 import tables as T
from libav_tpu.ops.quant import zigzag_scan, alternate_scan

# picture_coding_type
PICT_I, PICT_P, PICT_B, PICT_D = 1, 2, 3, 4


@dataclass
class SeqContext:
    width: int = 0
    height: int = 0
    mb_width: int = 0
    mb_height: int = 0
    frame_rate: Rational = field(default_factory=lambda: Rational(25, 1))
    intra_matrix: np.ndarray = None      # raster order
    inter_matrix: np.ndarray = None
    mpeg2: bool = False
    progressive_sequence: bool = True
    chroma_format: int = 1               # 1=420


@dataclass
class PicContext:
    pict_type: int = PICT_I
    temporal_ref: int = 0
    full_pel: Tuple[int, int] = (0, 0)
    f_code: Tuple[Tuple[int, int], Tuple[int, int]] = ((15, 15), (15, 15))
    intra_dc_precision: int = 0
    picture_structure: int = 3           # 3 = frame
    frame_pred_frame_dct: int = 1
    concealment_mvs: int = 0
    q_scale_type: int = 0
    intra_vlc_format: int = 0
    alternate_scan: int = 0
    top_field_first: int = 0
    progressive_frame: int = 1


class MBData:
    """Per-frame tensor accumulation (the device-side program inputs)."""

    def __init__(self, nmb: int):
        self.coeffs = np.zeros((nmb, 6, 64), dtype=np.int16)
        self.qscale = np.ones(nmb, dtype=np.int32)
        self.intra = np.zeros(nmb, dtype=bool)
        self.use_fwd = np.zeros(nmb, dtype=bool)
        self.use_bwd = np.zeros(nmb, dtype=bool)
        self.mv_fwd = np.zeros((nmb, 2), dtype=np.int32)
        self.mv_bwd = np.zeros((nmb, 2), dtype=np.int32)
        self.coded = np.zeros(nmb, dtype=bool)
        # MPEG-2 frame-picture interlace tools
        self.field_mc = np.zeros(nmb, dtype=bool)
        self.dct_field = np.zeros(nmb, dtype=bool)
        self.mv_fwd2 = np.zeros((nmb, 2, 2), dtype=np.int32)
        self.mv_bwd2 = np.zeros((nmb, 2, 2), dtype=np.int32)
        self.sel_fwd = np.zeros((nmb, 2), dtype=np.int32)
        self.sel_bwd = np.zeros((nmb, 2), dtype=np.int32)


def find_start_codes(data: bytes) -> List[Tuple[int, int]]:
    """[(offset_of_code_byte, code)] for every 00 00 01 xx."""
    out = []
    pos = 0
    while True:
        idx = data.find(b"\x00\x00\x01", pos)
        if idx < 0 or idx + 3 >= len(data):
            break
        out.append((idx + 3, data[idx + 3]))
        pos = idx + 3
    return out


class MPEG1Decoder(Decoder):
    NAME = "mpeg1video"
    TYPE = MediaType.VIDEO
    LONG_NAME = "MPEG-1 video (TPU-batched reconstruction)"

    def _init(self):
        self.seq: Optional[SeqContext] = None
        self.pic = PicContext()
        # DPB: last two reference frames as device plane tuples
        self.ref_prev = None    # (y, u, v) padded device arrays
        self.ref_next = None
        self.ref_prev_frame: Optional[Frame] = None
        self.ref_next_frame: Optional[Frame] = None
        self._pending: List[Frame] = []
        self._frame_num = 0

    def _flush(self):
        self.ref_prev = self.ref_next = None
        self.ref_prev_frame = self.ref_next_frame = None

    # ------------------------------------------------------------------ #

    def _decode(self, pkt: Packet) -> List[Frame]:
        # frames carry the pts of the packet they were *coded* in; with B
        # reordering a delayed anchor is emitted during a later packet and
        # must keep its own pts
        self._cur_pts = pkt.pts
        self._cur_tb = pkt.time_base
        frames = []
        data = pkt.data
        codes = find_start_codes(data)
        slices: List[Tuple[int, bytes]] = []
        pic_seen = False

        def segment(i):
            start = codes[i][0] + 1
            end = codes[i + 1][0] - 3 if i + 1 < len(codes) else len(data)
            return data[start:end]

        for i, (off, code) in enumerate(codes):
            if code == 0xB3:
                self._parse_seq_header(segment(i))
            elif code == 0xB5:
                self._parse_extension(segment(i))
            elif code == 0xB8:
                pass  # GOP header
            elif code == 0x00:
                if pic_seen and slices:
                    frames.extend(self._finish_picture(slices))
                    slices = []
                self._parse_picture_header(segment(i))
                pic_seen = True
            elif 0x01 <= code <= 0xAF:
                slices.append((code, segment(i)))
            elif code == 0xB7:  # sequence end
                pass
        if pic_seen and slices:
            frames.extend(self._finish_picture(slices))
        return frames

    def _drain(self) -> List[Frame]:
        # emit the held-back last reference frame (reordering delay)
        if self.ref_next_frame is not None and \
                getattr(self.ref_next_frame, "_emitted", False) is False:
            self.ref_next_frame._emitted = True
            return [self.ref_next_frame]
        return []

    # ------------------------------------------------------------------ #
    # Headers
    # ------------------------------------------------------------------ #

    def _parse_seq_header(self, seg: bytes):
        """reference: mpeg12dec.c mpeg1_decode_sequence"""
        gb = GetBits(seg)
        w = gb.get_bits(12)
        h = gb.get_bits(12)
        gb.get_bits(4)   # aspect
        frc = gb.get_bits(4)
        gb.get_bits(18)  # bit_rate
        gb.get_bits(1)   # marker
        gb.get_bits(10)  # vbv buffer size
        gb.get_bits(1)   # constrained
        seq = self.seq or SeqContext()
        seq.width, seq.height = w, h
        seq.mb_width = (w + 15) >> 4
        seq.mb_height = (h + 15) >> 4
        if 1 <= frc <= 8:
            n, d = T.FRAME_RATES[frc]
            seq.frame_rate = Rational(n, d)
        if gb.get_bits(1):  # load_intra_quantiser_matrix
            zz = zigzag_scan()
            m = np.zeros(64, dtype=np.int32)
            for k in range(64):
                m[zz[k]] = gb.get_bits(8)
            seq.intra_matrix = m
        elif seq.intra_matrix is None:
            seq.intra_matrix = T.DEFAULT_INTRA_MATRIX.copy()
        if gb.get_bits(1):  # load_non_intra
            zz = zigzag_scan()
            m = np.zeros(64, dtype=np.int32)
            for k in range(64):
                m[zz[k]] = gb.get_bits(8)
            seq.inter_matrix = m
        elif seq.inter_matrix is None:
            seq.inter_matrix = T.DEFAULT_NON_INTRA_MATRIX.copy()
        self.seq = seq
        self.width, self.height = w, h

    def _parse_extension(self, seg: bytes):
        """reference: mpeg12dec.c mpeg_decode_postinit + extension parsers"""
        gb = GetBits(seg)
        ext_id = gb.get_bits(4)
        if ext_id == 1:      # sequence extension -> this is MPEG-2
            self.seq.mpeg2 = True
            gb.get_bits(8)   # profile/level
            self.seq.progressive_sequence = gb.get_bits(1)
            self.seq.chroma_format = gb.get_bits(2)
            horiz_ext = gb.get_bits(2)
            vert_ext = gb.get_bits(2)
            if horiz_ext or vert_ext:
                self.seq.width |= horiz_ext << 12
                self.seq.height |= vert_ext << 12
                self.seq.mb_width = (self.seq.width + 15) >> 4
                self.seq.mb_height = (self.seq.height + 15) >> 4
        elif ext_id == 8:    # picture coding extension
            p = self.pic
            p.f_code = ((gb.get_bits(4), gb.get_bits(4)),
                        (gb.get_bits(4), gb.get_bits(4)))
            p.intra_dc_precision = gb.get_bits(2)
            p.picture_structure = gb.get_bits(2)
            p.top_field_first = gb.get_bits(1)
            p.frame_pred_frame_dct = gb.get_bits(1)
            p.concealment_mvs = gb.get_bits(1)
            p.q_scale_type = gb.get_bits(1)
            p.intra_vlc_format = gb.get_bits(1)
            p.alternate_scan = gb.get_bits(1)
            gb.get_bits(1)   # repeat_first_field
            gb.get_bits(1)   # chroma_420_type
            p.progressive_frame = gb.get_bits(1)
        elif ext_id == 2:    # sequence display extension
            pass
        elif ext_id == 3:    # quant matrix extension
            zz = zigzag_scan()
            if gb.get_bits(1):
                m = np.zeros(64, dtype=np.int32)
                for k in range(64):
                    m[zz[k]] = gb.get_bits(8)
                self.seq.intra_matrix = m
            if gb.get_bits(1):
                m = np.zeros(64, dtype=np.int32)
                for k in range(64):
                    m[zz[k]] = gb.get_bits(8)
                self.seq.inter_matrix = m

    def _parse_picture_header(self, seg: bytes):
        """reference: mpeg12dec.c mpeg1_decode_picture"""
        gb = GetBits(seg)
        p = PicContext()
        p.temporal_ref = gb.get_bits(10)
        p.pict_type = gb.get_bits(3)
        gb.get_bits(16)  # vbv_delay
        if p.pict_type in (PICT_P, PICT_B):
            fp = gb.get_bits(1)
            fc = gb.get_bits(3)
            p.full_pel = (fp, 0)
            p.f_code = ((fc, fc), (15, 15))
        if p.pict_type == PICT_B:
            fpb = gb.get_bits(1)
            fcb = gb.get_bits(3)
            p.full_pel = (p.full_pel[0], fpb)
            p.f_code = (p.f_code[0], (fcb, fcb))
        self.pic = p

    # ------------------------------------------------------------------ #
    # Slice entropy decode
    # ------------------------------------------------------------------ #

    def _finish_picture(self, slices) -> List[Frame]:
        seq, pic = self.seq, self.pic
        nmb = seq.mb_width * seq.mb_height
        mb = MBData(nmb)
        for code, seg in slices:
            try:
                self._decode_slice(code, seg, mb)
            except AVError as e:
                log.warning(self, "slice %d decode error: %s", code, e)
        frame = self._reconstruct(mb)
        frame.pts = getattr(self, "_cur_pts", None)
        frame.time_base = getattr(self, "_cur_tb", None)
        frame.pict_type = {PICT_I: PictureType.I, PICT_P: PictureType.P,
                           PICT_B: PictureType.B}.get(pic.pict_type,
                                                      PictureType.I)
        frame.key_frame = pic.pict_type == PICT_I
        # reorder: B frames output immediately; I/P delayed by one ref
        out = []
        if pic.pict_type == PICT_B:
            out.append(frame)
        else:
            if self.ref_next_frame is not None and \
                    not getattr(self.ref_next_frame, "_emitted", False):
                self.ref_next_frame._emitted = True
                out.append(self.ref_next_frame)
            self.ref_prev = self.ref_next
            self.ref_prev_frame = self.ref_next_frame
            self.ref_next = self._padded_refs
            self.ref_next_frame = frame
            if self.ref_prev is None:
                self.ref_prev = self.ref_next
                self.ref_prev_frame = frame
        return out

    def _decode_slice(self, code: int, seg: bytes, mb: MBData):
        """reference: mpeg12dec.c mpeg_decode_slice :1642"""
        seq, pic = self.seq, self.pic
        gb = GetBits(seg)
        mb_y = code - 1
        if seq.mb_height > 175 and False:
            pass  # slice_vertical_position_extension for >2800 tall
        qscale = self._qscale(gb.get_bits(5))
        while gb.get_bits(1):   # extra_bit_slice
            gb.get_bits(8)

        mb_x = -1
        dc_pred = self._dc_reset()     # lum, cb, cr
        # motion predictors PMV[dir][vector][xy] (ISO 13818-2 7.6.3)
        pmv = np.zeros((2, 2, 2), dtype=np.int32)
        first_in_slice = True
        prev_mb_params = None   # for B skipped

        addr_vlc = T.mb_addr_vlc()

        while gb.bits_left() > 0 and gb.show_bits(23) != 0:
            # macroblock address increment
            inc = 0
            while True:
                v = addr_vlc.read(gb)
                if v == T.MB_ADDR_ESCAPE:
                    inc += 33
                    continue
                if v == T.MB_ADDR_STUFFING:
                    continue
                inc += v + 1
                break
            def advance():
                # MPEG-1 slices may span multiple MB rows; wrap like the
                # reference (mpeg12dec.c:1782 '++mb_x >= mb_width' path)
                nonlocal mb_x, mb_y
                mb_x += 1
                if mb_x >= seq.mb_width:
                    mb_x = 0
                    mb_y += 1
                if mb_y >= seq.mb_height:
                    raise AVError(INVALIDDATA, "MB address out of range")

            if first_in_slice:
                mb_x = inc - 1
                first_in_slice = False
                if mb_x >= seq.mb_width or mb_y >= seq.mb_height:
                    raise AVError(INVALIDDATA, "MB address out of range")
            else:
                # skipped MBs
                for s in range(inc - 1):
                    advance()
                    self._skipped_mb(mb, mb_y * seq.mb_width + mb_x,
                                     pmv, prev_mb_params)
                advance()
                if inc > 1:
                    dc_pred = self._dc_reset()
                    if pic.pict_type == PICT_P:
                        pmv[:] = 0
            idx = mb_y * seq.mb_width + mb_x
            qscale, dc_pred, prev_mb_params = self._decode_mb(
                gb, mb, idx, qscale, dc_pred, pmv)

    def _qscale(self, code: int) -> int:
        """MPEG-2 linear: 2*code; non-linear: table 7-6; MPEG-1: code."""
        if self.seq.mpeg2:
            if self.pic.q_scale_type:
                return int(T.NON_LINEAR_QSCALE[code])
            return code << 1
        return code

    def _dc_reset(self):
        # Predictors live in IDCT-input units: MPEG-1 stores pixel units
        # (device dequant scales DC x8 -> 1024); MPEG-2 diffs are
        # pre-scaled by (3 - intra_dc_precision) so the reset is the
        # constant 1<<10 regardless of precision (ISO 13818-2 §7.2.1).
        p = 1024 if self.seq.mpeg2 else 128
        return [p, p, p]

    def _decode_mb(self, gb, mb: MBData, idx: int, qscale: int,
                   dc_pred, pmv):
        """reference: mpeg12dec.c mpeg_decode_mb :659"""
        seq, pic = self.seq, self.pic
        # macroblock_type
        if pic.pict_type == PICT_I:
            if gb.get_bits(1):
                flags = T.MB_INTRA
            else:
                if not gb.get_bits(1):
                    raise AVError(INVALIDDATA, "bad I-MB type code")
                flags = T.MB_QUANT | T.MB_INTRA
        elif pic.pict_type == PICT_P:
            flags = T.mb_ptype_vlc().read(gb)
        else:
            flags = T.mb_btype_vlc().read(gb)

        motion_type = 2  # frame MC
        if seq.mpeg2 and pic.picture_structure == 3 and \
                not pic.frame_pred_frame_dct and \
                (flags & (T.MB_FOR | T.MB_BACK)):
            motion_type = gb.get_bits(2)
            if motion_type == 3:
                raise AVError(INVALIDDATA, "dual-prime MC unsupported")
        dct_type = 0
        if seq.mpeg2 and pic.picture_structure == 3 and \
                not pic.frame_pred_frame_dct and \
                (flags & (T.MB_PAT | T.MB_INTRA)):
            pass  # dct_type read later, after MVs

        if flags & T.MB_QUANT:
            qscale = self._qscale(gb.get_bits(5))
        mb.qscale[idx] = max(qscale, 1)

        if flags & T.MB_INTRA:
            mb.intra[idx] = True
            pmv[:] = 0
            if pic.concealment_mvs:
                self._read_mv_pair(gb, pmv, 0, 2)
                gb.get_bits(1)  # marker
        else:
            dc_pred[:] = self._dc_reset()

        if flags & T.MB_FOR:
            kind, mv2, sels = self._read_mv_pair(gb, pmv, 0, motion_type)
            mb.use_fwd[idx] = True
            if kind == "field":
                mb.field_mc[idx] = True
                mb.mv_fwd2[idx] = mv2
                mb.sel_fwd[idx] = sels
                mb.mv_fwd[idx] = (mv2[0, 0], 2 * mv2[0, 1])
            else:
                # MPEG-1 full_pel: coded vector is in full-pel units
                mb.mv_fwd[idx] = pmv[0, 0] * \
                    (2 if self.pic.full_pel[0] else 1)
        if flags & T.MB_BACK:
            kind, mv2, sels = self._read_mv_pair(gb, pmv, 1, motion_type)
            mb.use_bwd[idx] = True
            if kind == "field":
                mb.field_mc[idx] = True
                mb.mv_bwd2[idx] = mv2
                mb.sel_bwd[idx] = sels
                mb.mv_bwd[idx] = (mv2[0, 0], 2 * mv2[0, 1])
            else:
                mb.mv_bwd[idx] = pmv[1, 0] * \
                    (2 if self.pic.full_pel[1] else 1)
        if mb.field_mc[idx] and (flags & (T.MB_FOR | T.MB_BACK)) and \
                not (flags & T.MB_FOR):
            # bwd-only field MB: fwd side must not contribute
            mb.mv_fwd2[idx] = 0
        if pic.pict_type == PICT_P and not (flags & (T.MB_FOR | T.MB_INTRA)):
            # no-MV P macroblock: zero forward vector
            pmv[:] = 0
            mb.use_fwd[idx] = True
            mb.mv_fwd[idx] = 0

        if seq.mpeg2 and pic.picture_structure == 3 and \
                not pic.frame_pred_frame_dct and \
                (flags & (T.MB_PAT | T.MB_INTRA)):
            mb.dct_field[idx] = bool(gb.get_bits(1))

        cbp = 0
        if flags & T.MB_PAT:
            cbp = T.cbp_vlc().read(gb)
            if cbp == 0 and not seq.mpeg2:
                raise AVError(INVALIDDATA, "zero CBP invalid in MPEG-1")
        elif flags & T.MB_INTRA:
            cbp = 0x3F

        if cbp or (flags & T.MB_INTRA):
            for blk in range(6):
                if cbp & (0x20 >> blk):
                    if flags & T.MB_INTRA:
                        dc_pred = self._decode_intra_block(
                            gb, mb.coeffs[idx, blk], blk, dc_pred)
                    else:
                        self._decode_inter_block(gb, mb.coeffs[idx, blk])
            mb.coded[idx] = True

        prev_params = (mb.use_fwd[idx], mb.use_bwd[idx],
                       mb.mv_fwd[idx].copy(), mb.mv_bwd[idx].copy())
        return qscale, dc_pred, prev_params

    def _skipped_mb(self, mb: MBData, idx: int, pmv, prev_params):
        """reference: mpeg12dec.c skipped-MB handling in mpeg_decode_slice"""
        if self.pic.pict_type == PICT_P:
            mb.use_fwd[idx] = True
            mb.mv_fwd[idx] = 0
        elif self.pic.pict_type == PICT_B and prev_params is not None:
            uf, ub, mf, mbk = prev_params
            mb.use_fwd[idx] = uf
            mb.use_bwd[idx] = ub
            mb.mv_fwd[idx] = mf
            mb.mv_bwd[idx] = mbk

    # -- motion vectors -------------------------------------------------- #

    def _read_mv_pair(self, gb, pmv, direction: int, motion_type: int):
        """reference: mpeg12dec.c mpeg_decode_mb MT_FRAME/MT_FIELD
        branches. Frame MC updates both PMV rows; field MC in frame
        pictures reads two field vectors, the vertical component
        predicted from PMV>>1 and stored back doubled (frame units).
        Returns ('frame', None, None) or ('field', mv2 (2,2), sels)."""
        if self.seq.mpeg2 and motion_type == 1 and \
                self.pic.picture_structure == 3:
            mv2 = np.zeros((2, 2), dtype=np.int32)
            sels = np.zeros(2, dtype=np.int32)
            for v in range(2):
                sels[v] = gb.get_bits(1)   # motion_vertical_field_select
                fx = self.pic.f_code[direction][0]
                fy = self.pic.f_code[direction][1]
                x = self._decode_motion(gb, fx, int(pmv[direction, v, 0]))
                pmv[direction, v, 0] = x
                y = self._decode_motion(gb, fy,
                                        int(pmv[direction, v, 1]) >> 1)
                pmv[direction, v, 1] = 2 * y
                mv2[v] = (x, y)
            return "field", mv2, sels
        for xy in range(2):
            fcode = self.pic.f_code[direction][xy]
            val = self._decode_motion(gb, fcode,
                                      int(pmv[direction, 0, xy]))
            pmv[direction, 0, xy] = val
            pmv[direction, 1, xy] = val
        return "frame", None, None

    def _decode_motion(self, gb, fcode: int, pred: int) -> int:
        """reference: mpeg12dec.c mpeg_decode_motion (ISO 11172-2
        §2.4.4.2 reconstruction)."""
        code_vlc = T.motion_vlc()
        code = code_vlc.read(gb)
        if code == 0:
            return pred
        sign = gb.get_bits(1)
        shift = fcode - 1
        if shift > 0:
            residual = gb.get_bits(shift)
            delta = ((code - 1) << shift) + residual + 1
        else:
            delta = code
        if sign:
            delta = -delta
        val = pred + delta
        # wrap into legal range
        lim = 1 << (shift + 4)
        if val < -lim:
            val += 2 * lim
        elif val >= lim:
            val -= 2 * lim
        if self.pic.full_pel[0]:
            pass  # handled by caller scaling (rare; MPEG-1 only)
        return val

    # -- block coefficient decode ---------------------------------------- #

    def _decode_intra_block(self, gb, out: np.ndarray, blk: int, dc_pred):
        """reference: mpeg12dec.c mpeg1_decode_block_intra /
        mpeg2_decode_block_intra"""
        seq, pic = self.seq, self.pic
        comp = 0 if blk < 4 else (1 if blk == 4 else 2)
        dc_vlc = T.dc_lum_vlc() if blk < 4 else T.dc_chroma_vlc()
        size = dc_vlc.read(gb)
        if size > 0:
            diff = gb.get_bits(size)
            if diff < (1 << (size - 1)):
                diff -= (1 << size) - 1
        else:
            diff = 0
        dc_pred[comp] += diff << (3 - pic.intra_dc_precision) \
            if seq.mpeg2 else diff
        out[0] = dc_pred[comp] if seq.mpeg2 else dc_pred[comp]
        # MPEG-1: DC stored in "pixel" units (x1); device dequant scales x8.
        # MPEG-2: host pre-scales by (3 - intra_dc_precision); device
        # passes DC through.
        use_b15 = seq.mpeg2 and pic.intra_vlc_format
        self._decode_ac(gb, out, first=False, mpeg2_table=use_b15,
                        start=1)
        return dc_pred

    def _decode_inter_block(self, gb, out: np.ndarray):
        self._decode_ac(gb, out, first=True, mpeg2_table=False, start=0)

    def _decode_ac(self, gb, out: np.ndarray, first: bool,
                   mpeg2_table: bool, start: int):
        """Run-level loop, table B.14/B.15 (reference: mpeg12dec.c
        mpeg1_decode_block_inter inner loop)."""
        seq = self.seq
        vlc = T.dct_vlc(mpeg2_table)
        i = start
        if first:
            # special case: first coefficient '1s' means (0, +-1)
            if gb.show_bits(1) == 1:
                gb.skip_bits(1)
                level = 1 if gb.get_bits(1) == 0 else -1
                out[0] = level
                i = 1
                first = False
        while True:
            v = vlc.read(gb)
            if v == T.EOB_INDEX:
                break
            if v == T.ESCAPE_INDEX:
                run = gb.get_bits(6)
                if seq.mpeg2:
                    level = gb.get_sbits(12)
                else:
                    level = gb.get_sbits(8)
                    if level == -128:
                        level = gb.get_bits(8) - 256
                    elif level == 0:
                        level = gb.get_bits(8)
            else:
                run = T.RUN_LEVEL[0][v]
                level = T.RUN_LEVEL[1][v]
                if gb.get_bits(1):
                    level = -level
            i += run
            if i > 63:
                raise AVError(INVALIDDATA, "AC index overflow")
            out[i] = level
            i += 1
            if i > 64:
                break

    # ------------------------------------------------------------------ #
    # Device reconstruction
    # ------------------------------------------------------------------ #

    def _reconstruct(self, mb: MBData) -> Frame:
        from libav_tpu.codecs.mpegvideo import recon_jit
        seq, pic = self.seq, self.pic
        interlaced = bool(mb.field_mc.any() or mb.dct_field.any())
        fn = recon_jit(seq.mb_width, seq.mb_height,
                       "mpeg2" if seq.mpeg2 else "mpeg1",
                       bool(pic.alternate_scan), pic.pict_type != PICT_I,
                       interlaced=interlaced)

        scan = alternate_scan() if pic.alternate_scan else zigzag_scan()
        # qmat in scan order to match coefficient layout
        intra_q = self.seq.intra_matrix[scan]
        inter_q = self.seq.inter_matrix[scan]

        # P pictures predict from the most recent reference; B pictures
        # use (older, newer) as (forward, backward)
        if pic.pict_type == PICT_B:
            ref0 = self.ref_prev or _zero_refs(seq)
            ref1 = self.ref_next or ref0
        else:
            ref0 = self.ref_next or self.ref_prev or _zero_refs(seq)
            ref1 = ref0

        kw = {}
        if interlaced:
            kw = dict(field_mc=mb.field_mc, dct_field=mb.dct_field,
                      mvf2=mb.mv_fwd2, mvb2=mb.mv_bwd2,
                      sel_f=mb.sel_fwd, sel_b=mb.sel_bwd)
        planes, padded = fn(mb.coeffs, mb.qscale, mb.intra, mb.use_fwd,
                            mb.use_bwd, mb.mv_fwd, mb.mv_bwd,
                            intra_q.astype(np.int32),
                            inter_q.astype(np.int32),
                            ref0[0], ref0[1], ref0[2],
                            ref1[0], ref1[1], ref1[2], **kw)
        self._padded_refs = padded
        f = Frame(width=seq.width, height=seq.height, format="yuv420p")
        f.planes = [p[:h, :w] for p, (w, h) in
                    zip(planes, [(seq.width, seq.height),
                                 ((seq.width + 1) // 2, (seq.height + 1) // 2),
                                 ((seq.width + 1) // 2, (seq.height + 1) // 2)])]
        return f


@register_codec
class MPEG2Decoder(MPEG1Decoder):
    NAME = "mpeg2video"
    LONG_NAME = "MPEG-2 video (TPU-batched reconstruction)"


# register mpeg1 as well
register_codec(MPEG1Decoder)


def _zero_refs(seq: SeqContext):
    from libav_tpu.codecs.mpegvideo import zero_pad_refs
    return zero_pad_refs(seq.mb_width, seq.mb_height)
