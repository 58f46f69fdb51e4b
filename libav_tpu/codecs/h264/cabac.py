"""CABAC entropy coding for H.264 (reference: cabac.c ff_init_cabac_decoder
:163, cabac_functions.h get_cabac :117, h264_cabac.c ff_h264_decode_mb_cabac
:1908 — re-expressed as one symmetric bin coder driven by either an
arithmetic decoder or encoder engine, so the encode and decode MB layers
are literally the same code path and cannot diverge).

Engine follows the spec formulation (ISO/IEC 14496-10 §9.3.3.2 decode,
§9.3.4 encode) with the normative tables in cabac_tables.py. The MB layer
covers the framework subset: I_16x16 / I_4x4(later) / P_L0_16x16 / P_Skip,
coded_block_pattern, mb_qp_delta, ref_idx, mvd, and the 4x4 residual
categories 0-4. The host-serial hot path also exists as native C
(native/h264_cabac_dec.c) — this module is the reference implementation
and the encoder.
"""

from __future__ import annotations

import numpy as np

from libav_tpu.avutil.error import AVError, INVALIDDATA
from libav_tpu.codecs.h264.cabac_tables import (INIT_I, INIT_PB,
                                                RANGE_TAB_LPS,
                                                TRANS_IDX_LPS)

NCTX = 1024


def init_states(slice_is_i: bool, cabac_init_idc: int, qp: int):
    """Context init (spec 9.3.1.1): packed state bytes 2*pStateIdx+valMPS."""
    tab = INIT_I if slice_is_i else INIT_PB[cabac_init_idc]
    qp = min(51, max(0, qp))
    st = np.zeros(NCTX, dtype=np.uint8)
    for i, (m, n) in enumerate(tab):
        pre = min(126, max(1, ((m * qp) >> 4) + n))
        if pre <= 63:
            st[i] = 2 * (63 - pre)           # valMPS = 0
        else:
            st[i] = 2 * (pre - 64) + 1       # valMPS = 1
    return st


class CabacDecoder:
    """Arithmetic decoding engine (spec 9.3.3.2)."""

    def __init__(self, data: bytes, states):
        self.data = data
        self.pos = 0            # bit position
        self.states = states
        self.range = 510
        self.offset = self._bits(9)

    def _bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3] if (self.pos >> 3) < len(self.data) else 0
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def decision(self, ctx: int, value=None) -> int:
        s = self.states[ctx]
        p, mps = s >> 1, s & 1
        rlps = RANGE_TAB_LPS[p][(self.range >> 6) & 3]
        self.range -= rlps
        if self.offset >= self.range:
            bit = 1 - mps
            self.offset -= self.range
            self.range = rlps
            if p == 0:
                mps ^= 1
            p = TRANS_IDX_LPS[p]
        else:
            bit = mps
            p = p + 1 if p < 62 else 62
        self.states[ctx] = 2 * p + mps
        while self.range < 0x100:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bits(1)
        return bit

    def bypass(self, value=None) -> int:
        self.offset = (self.offset << 1) | self._bits(1)
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def terminate(self, value=None) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 0x100:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bits(1)
        return 0

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3

    def read_pcm(self, n: int) -> bytes:
        """I_PCM raw samples: byte-align past the terminate bin, read n
        bytes, re-initialise the arithmetic engine (spec 9.3.1.2 — the
        context states persist; reference h264_cabac.c:2030
        ff_init_cabac_decoder after intra_pcm_ptr)."""
        byte = self.bytes_consumed()
        out = bytes(self.data[byte:byte + n])
        self.pos = 8 * (byte + n)
        self.range = 510
        self.offset = self._bits(9)
        return out


class CabacEncoder:
    """Arithmetic encoding engine (spec 9.3.4), writing into a PutBits."""

    def __init__(self, pb, states):
        self.pb = pb
        self.states = states
        self.low = 0
        self.range = 510
        self.bo = 0             # bitsOutstanding
        self.first = True

    def _put(self, b: int):
        if self.first:
            self.first = False
        else:
            self.pb.put_bits(1, b)
        while self.bo:
            self.pb.put_bits(1, 1 - b)
            self.bo -= 1

    def _renorm(self):
        while self.range < 0x100:
            if self.low < 0x100:
                self._put(0)
            elif self.low >= 0x200:
                self.low -= 0x200
                self._put(1)
            else:
                self.low -= 0x100
                self.bo += 1
            self.low <<= 1
            self.range <<= 1

    def decision(self, ctx: int, value: int) -> int:
        value = int(value)
        s = self.states[ctx]
        p, mps = s >> 1, s & 1
        rlps = RANGE_TAB_LPS[p][(self.range >> 6) & 3]
        self.range -= rlps
        if value != mps:
            self.low += self.range
            self.range = rlps
            if p == 0:
                mps ^= 1
            p = TRANS_IDX_LPS[p]
        else:
            p = p + 1 if p < 62 else 62
        self.states[ctx] = 2 * p + mps
        self._renorm()
        return value

    def bypass(self, value: int) -> int:
        value = int(value)
        self.low <<= 1
        if value:
            self.low += self.range
        if self.low >= 0x400:
            self._put(1)
            self.low -= 0x400
        elif self.low < 0x200:
            self._put(0)
        else:
            self.low -= 0x200
            self.bo += 1
        return value

    def terminate(self, value: int) -> int:
        value = int(value)
        self.range -= 2
        if value:
            self.low += self.range
            self.flush()
        else:
            self._renorm()
        return value

    def flush(self):
        self.range = 2
        self._renorm()
        self._put((self.low >> 9) & 1)
        self.pb.put_bits(2, ((self.low >> 7) & 3) | 1)

    def write_pcm(self, data: bytes):
        """After terminate(1): pcm_alignment_zero_bit(s), the raw
        samples, then a fresh arithmetic engine (contexts persist)."""
        self.pb.align(0)
        for b in data:
            self.pb.put_bits(8, b)
        self.low = 0
        self.range = 510
        self.bo = 0
        self.first = True


# --------------------------------------------------------------------- #
# Residual level-coding state machine (reference h264_cabac.c
# decode_cabac_residual_internal; spec 9.3.3.1.1.x ctx derivations)
# --------------------------------------------------------------------- #

_LVL1_CTX = (1, 2, 3, 4, 0, 0, 0, 0)
_GT1_CTX = (5, 5, 5, 5, 6, 7, 8, 9)
_TRANS_EQ1 = (1, 2, 3, 3, 4, 5, 6, 7)
_TRANS_GT1 = (4, 4, 4, 4, 5, 6, 7, 7)

# per-ctxBlockCat bases (cats 0..4 for 4x4 + 5 for 8x8 luma); field
# macroblocks use a separate context bank (spec Table 9-40; reference
# h264_cabac.c significant/last_coeff_flag_offset[1])
_SIG_BASE = (105, 105 + 15, 105 + 29, 105 + 44, 105 + 47, 402)
_LAST_BASE = (166, 166 + 15, 166 + 29, 166 + 44, 166 + 47, 417)
_SIG_BASE_FIELD = (277, 277 + 15, 277 + 29, 277 + 44, 277 + 47, 436)
_LAST_BASE_FIELD = (338, 338 + 15, 338 + 29, 338 + 44, 338 + 47, 451)
_LVL_BASE = (227, 227 + 10, 227 + 20, 227 + 30, 227 + 39, 426)
_CBF_BASE = (85, 89, 93, 97, 101, 1012)

# 8x8 significance ctx increments (frame) — spec Table 9-43 / reference
# significant_coeff_flag_offset_8x8[0]
_SIG8_INC = (
    0, 1, 2, 3, 4, 5, 5, 4, 4, 3, 3, 4, 4, 4, 5, 5,
    4, 4, 4, 4, 3, 3, 6, 7, 7, 7, 8, 9, 10, 9, 8, 7,
    7, 6, 11, 12, 13, 11, 6, 7, 8, 9, 14, 10, 9, 8, 6, 11,
    12, 13, 11, 6, 9, 14, 10, 9, 11, 12, 13, 11, 14, 10, 12)
# last_significant 8x8 ctx increments (spec Table 9-43 right column /
# reference cabac.c last_coeff_flag_offset_8x8)
_LAST8_INC = (
    (0,) + (1,) * 15 + (2,) * 16 + (3,) * 8 + (4,) * 8 +
    (5,) * 4 + (6,) * 4 + (7,) * 4 + (8,) * 3)
assert len(_LAST8_INC) == 63


# 8x8 significance ctx increments for FIELD macroblocks (Table 9-43
# field column; reference significant_coeff_flag_offset_8x8[1])
_SIG8_INC_FIELD = (
    0, 1, 1, 2, 2, 3, 3, 4, 5, 6, 7, 7, 7, 8, 4, 5,
    6, 9, 10, 10, 8, 11, 12, 11, 9, 9, 10, 10, 8, 11, 12, 11,
    9, 9, 10, 10, 8, 11, 12, 11, 9, 9, 10, 10, 8, 13, 13, 9,
    9, 10, 10, 8, 13, 13, 9, 9, 10, 10, 14, 14, 14, 14, 14)


def code_residual(eng, cat: int, levels, max_coeff: int,
                  field: bool = False):
    """Transcode one residual block's significance map + levels.

    levels: decode -> an int32[max_coeff] array filled in scan order;
    encode -> the scan-order coefficients to write (at least one nonzero).
    Returns total number of coefficients (the nnz the caches record).
    """
    enc = isinstance(eng, CabacEncoder)
    sig_base = (_SIG_BASE_FIELD if field else _SIG_BASE)[cat]
    last_base = (_LAST_BASE_FIELD if field else _LAST_BASE)[cat]
    lvl_base = _LVL_BASE[cat]
    if enc:
        nz = [i for i in range(max_coeff) if levels[i]]
        last_nz = nz[-1]
    idx = []
    if cat == 5:
        sig_inc = _SIG8_INC_FIELD if field else _SIG8_INC
        last_inc = _LAST8_INC
    else:
        sig_inc = last_inc = range(max_coeff)
    broke = False
    for i in range(max_coeff - 1):
        sig = eng.decision(sig_base + sig_inc[i],
                           None if not enc else (1 if levels[i] else 0))
        if sig:
            idx.append(i)
            last = eng.decision(last_base + last_inc[i],
                                None if not enc else (1 if i == last_nz else 0))
            if last:
                broke = True
                break
    if not broke:
        idx.append(max_coeff - 1)

    node = 0
    for pos in reversed(idx):
        want = abs(int(levels[pos])) if enc else None
        gt1 = eng.decision(lvl_base + _LVL1_CTX[node],
                           None if not enc else (1 if want > 1 else 0))
        if not gt1:
            mag = 1
            node = _TRANS_EQ1[node]
        else:
            gctx = lvl_base + _GT1_CTX[node]
            node = _TRANS_GT1[node]
            mag = 2
            while mag < 15 and eng.decision(
                    gctx, None if not enc else (1 if want > mag else 0)):
                mag += 1
            if mag == 15:
                # EG0 suffix on (mag - 14)
                if enc:
                    e = want - 14
                    j = e.bit_length() - 1
                    for _ in range(j):
                        eng.bypass(1)
                    eng.bypass(0)
                    for b in range(j - 1, -1, -1):
                        eng.bypass((e >> b) & 1)
                    mag = want
                else:
                    j = 0
                    while eng.bypass() and j < 30:
                        j += 1
                    add = 1
                    while j:
                        j -= 1
                        add = add * 2 + eng.bypass()
                    mag = add + 14
        neg = eng.bypass(None if not enc else (1 if int(levels[pos]) < 0 else 0))
        if not enc:
            levels[pos] = -mag if neg else mag
    return len(idx)


def code_ueg3_mvd(eng, ctx_base: int, amvd: int, value=None) -> int:
    """mvd_l0 component (UEG3 binarization, spec 9.3.2.3; ctx increments
    9.3.3.1.1.7). Returns the signed mvd."""
    enc = value is not None
    inc = (1 if amvd > 2 else 0) + (1 if amvd > 32 else 0)
    nonzero = eng.decision(ctx_base + inc,
                           None if not enc else (1 if value else 0))
    if not nonzero:
        return 0
    mag = abs(value) if enc else None
    m = 1
    ctx = ctx_base + 3
    while m < 9:
        b = eng.decision(ctx, None if not enc else (1 if mag > m else 0))
        if not b:
            break
        if m < 4:
            ctx += 1
        m += 1
    if m >= 9:
        if enc:
            e = mag - 9
            k = 3
            while e >= (1 << k):
                eng.bypass(1)
                e -= 1 << k
                k += 1
            eng.bypass(0)
            for b in range(k - 1, -1, -1):
                eng.bypass((e >> b) & 1)
            m = mag
        else:
            k = 3
            while eng.bypass():
                m += 1 << k
                k += 1
                if k > 24:
                    raise AVError(INVALIDDATA, "mvd overflow")
            while k:
                k -= 1
                m += eng.bypass() << k
    neg = eng.bypass(None if not enc else (1 if value < 0 else 0))
    return -m if neg else m


# --------------------------------------------------------------------- #
# MB layer
# --------------------------------------------------------------------- #

class MbCtx:
    """Per-frame neighbor state the context derivations need (the role of
    the reference's *_cache fills in h264_mvpred.h fill_decode_caches)."""

    def __init__(self, mb_w: int, mb_h: int):
        self.mb_w, self.mb_h = mb_w, mb_h
        nmb = mb_w * mb_h
        self.slice_id = np.full(nmb, -1, np.int32)
        self.skip = np.zeros(nmb, bool)
        self.intra16 = np.zeros(nmb, bool)    # I_16x16 or I_PCM
        self.intra = np.zeros(nmb, bool)
        self.cbp = np.zeros(nmb, np.int32)    # | dcflags (0x100 Y, 0x40/0x80 C)
        self.chroma_mode = np.zeros(nmb, np.int32)
        self.mvd = np.zeros((nmb, 2, 2), np.int32)  # [list][comp], |.|<=70
        self.ref = np.zeros((nmb, 2), np.int32)     # per list
        self.direct = np.zeros(nmb, bool)
        self.transform8 = np.zeros(nmb, bool)
        # CABAC nnz semantics: 0 for uncoded blocks
        self.nnz_y = np.zeros((4 * mb_h, 4 * mb_w), np.int32)
        self.nnz_u = np.zeros((2 * mb_h, 2 * mb_w), np.int32)
        self.nnz_v = np.zeros((2 * mb_h, 2 * mb_w), np.int32)

    def neighbors(self, i: int, cur_slice: int):
        """(left, top) MB indices or -1 when unavailable / other slice."""
        x, y = i % self.mb_w, i // self.mb_w
        left = i - 1 if x > 0 else -1
        top = i - self.mb_w if y > 0 else -1
        if left >= 0 and self.slice_id[left] != cur_slice:
            left = -1
        if top >= 0 and self.slice_id[top] != cur_slice:
            top = -1
        return left, top


class CabacMbLayer:
    """Symmetric MB-layer coder. Every `code_*` method drives the engine;
    with a CabacEncoder the `value` arguments are written, with a
    CabacDecoder they are ignored and the decoded value is returned."""

    def __init__(self, eng, ctx: MbCtx, slice_type: int, cur_slice: int,
                 grids=None, field: bool = False):
        self.eng = eng
        self.ctx = ctx
        self.slice_type = slice_type            # 0=P, 1=B, 2=I
        self.cur_slice = cur_slice
        self.field = field                      # PAFF field picture
        self.last_dqp = 0
        self.enc = isinstance(eng, CabacEncoder)
        # block-granular motion state (part.MotionGrids) for the
        # ref_idx/mvd context derivations (9.3.3.1.1.6/.7)
        self.grids = grids

    # -- helper -----------------------------------------------------------

    def _v(self, value):
        return value if self.enc else None

    # -- syntax elements ---------------------------------------------------

    def mb_skip(self, i: int, value=None) -> int:
        c = self.ctx
        left, top = c.neighbors(i, self.cur_slice)
        inc = 0
        if left >= 0 and not c.skip[left]:
            inc += 1
        if top >= 0 and not c.skip[top]:
            inc += 1
        if self.slice_type == 1:
            inc += 13
        return self.eng.decision(11 + inc, self._v(value))

    def mb_field_flag(self, inc: int, value=None) -> int:
        """MBAFF mb_field_decoding_flag (ctx 70..72; 9.3.3.1.1.2 — inc =
        left-pair-field + above-pair-field condition terms, derived by
        the pair walk)."""
        return self.eng.decision(70 + inc, self._v(value))

    def mb_type_p_is_intra(self, value=None) -> int:
        """bin0 of P mb_type: 1 = intra suffix follows."""
        return self.eng.decision(14, self._v(value))

    def mb_type_p_inter(self, value=None) -> int:
        """P inter types: 0=16x16, 1=16x8, 2=8x16, 3=8x8 (after bin0=0)."""
        eng = self.eng
        if self.enc:
            b1 = 1 if value in (1, 2) else 0
            eng.decision(15, b1)
            if b1:
                eng.decision(17, 1 if value == 1 else 0)
            else:
                eng.decision(16, 1 if value == 3 else 0)
            return value
        if eng.decision(15) == 0:
            return 3 * eng.decision(16)
        return 2 - eng.decision(17)

    def mb_type_intra(self, i: int, value=None):
        """Intra mb_type suffix. value (enc): (kind, cbp_luma15, cbp_chroma,
        pred_mode) where kind: 0=I_4x4, 1=I_16x16. Returns same tuple
        (kind 2 = I_PCM, rejected)."""
        eng = self.eng
        c = self.ctx
        in_i = self.slice_type == 2
        if in_i:
            left, top = c.neighbors(i, self.cur_slice)
            inc = 0
            if left >= 0 and c.intra16[left]:
                inc += 1
            if top >= 0 and c.intra16[top]:
                inc += 1
            base = 3
            b0 = eng.decision(base + inc,
                              self._v(None if value is None else
                                      (1 if value[0] else 0)))
            base += 5        # states 3..5 used by bin0; suffix at 6..10
            off = (6, 7, 8, 9, 10)
        else:
            # P suffix at ctx 17-20, B suffix at 32-35 (Table 9-11)
            base = 17 if self.slice_type == 0 else 32
            b0 = eng.decision(base, self._v(None if value is None else
                                            (1 if value[0] else 0)))
            off = (base + 1, base + 2, base + 2, base + 3, base + 3)
        if not b0:
            return (0, 0, 0, 0) if not self.enc else value
        pcm = eng.terminate(self._v(
            None if value is None else (1 if value[0] == 2 else 0)))
        if pcm:
            # I_PCM: caller reads/writes the raw samples via
            # pcm_samples() (reference h264_cabac.c:1316)
            return (2, 0, 0, 0) if not self.enc else value
        if self.enc:
            _, cbp_l, cbp_c, mode = value
            eng.decision(off[0], 1 if cbp_l else 0)
            eng.decision(off[1], 1 if cbp_c else 0)
            if cbp_c:
                eng.decision(off[2], 1 if cbp_c == 2 else 0)
            eng.decision(off[3], (mode >> 1) & 1)
            eng.decision(off[4], mode & 1)
            return value
        cbp_l = 15 * eng.decision(off[0])
        cbp_c = 0
        if eng.decision(off[1]):
            cbp_c = 1 + eng.decision(off[2])
        mode = 2 * eng.decision(off[3])
        mode += eng.decision(off[4])
        return (1, cbp_l, cbp_c, mode)

    def intra4x4_pred_mode(self, pred: int, value=None) -> int:
        """prev_intra4x4_pred_mode_flag + rem (ctx 68/69)."""
        eng = self.eng
        if self.enc:
            if value == pred:
                eng.decision(68, 1)
                return value
            eng.decision(68, 0)
            rem = value - (1 if value > pred else 0)
            eng.decision(69, rem & 1)
            eng.decision(69, (rem >> 1) & 1)
            eng.decision(69, (rem >> 2) & 1)
            return value
        if eng.decision(68):
            return pred
        mode = eng.decision(69)
        mode += 2 * eng.decision(69)
        mode += 4 * eng.decision(69)
        return mode + (1 if mode >= pred else 0)

    def intra_chroma_pred_mode(self, i: int, value=None) -> int:
        eng = self.eng
        c = self.ctx
        left, top = c.neighbors(i, self.cur_slice)
        inc = 0
        if left >= 0 and c.intra[left] and c.chroma_mode[left] != 0:
            inc += 1
        if top >= 0 and c.intra[top] and c.chroma_mode[top] != 0:
            inc += 1
        if self.enc:
            eng.decision(64 + inc, 1 if value else 0)
            if value:
                eng.decision(67, 1 if value >= 2 else 0)
                if value >= 2:
                    eng.decision(67, 1 if value == 3 else 0)
            return value
        if eng.decision(64 + inc) == 0:
            return 0
        if eng.decision(67) == 0:
            return 1
        if eng.decision(67) == 0:
            return 2
        return 3

    def _neighbor_cbp(self, i: int):
        """(left_cbp, top_cbp) with the reference's unavailable defaults
        (h264_mvpred.h:592-601): intra current -> 0x7CF, inter -> 0x00F."""
        c = self.ctx
        left, top = c.neighbors(i, self.cur_slice)
        cur_intra = bool(c.intra[i])
        dflt = 0x7CF if cur_intra else 0x00F
        lc = int(c.cbp[left]) if left >= 0 else dflt
        tc = int(c.cbp[top]) if top >= 0 else dflt
        return lc, tc

    def cbp(self, i: int, value=None) -> int:
        """coded_block_pattern for inter (and I_NxN) MBs."""
        eng = self.eng
        cbp_a, cbp_b = self._neighbor_cbp(i)
        cbp = 0
        want = value
        # luma bins (reference decode_cabac_mb_cbp_luma)
        ctx = (0 if cbp_a & 0x02 else 1) + 2 * (0 if cbp_b & 0x04 else 1)
        cbp += eng.decision(73 + ctx, self._v(None if want is None else want & 1))
        ctx = (0 if cbp & 0x01 else 1) + 2 * (0 if cbp_b & 0x08 else 1)
        cbp += eng.decision(73 + ctx, self._v(None if want is None else
                                              (want >> 1) & 1)) << 1
        ctx = (0 if cbp_a & 0x08 else 1) + 2 * (0 if cbp & 0x01 else 1)
        cbp += eng.decision(73 + ctx, self._v(None if want is None else
                                              (want >> 2) & 1)) << 2
        ctx = (0 if cbp & 0x04 else 1) + 2 * (0 if cbp & 0x02 else 1)
        cbp += eng.decision(73 + ctx, self._v(None if want is None else
                                              (want >> 3) & 1)) << 3
        # chroma bins
        ca = (cbp_a >> 4) & 3
        cb = (cbp_b >> 4) & 3
        ctx = (1 if ca > 0 else 0) + 2 * (1 if cb > 0 else 0)
        wc = None if want is None else (want >> 4)
        b = eng.decision(77 + ctx, self._v(None if wc is None else
                                           (1 if wc else 0)))
        if b:
            ctx = 4 + (1 if ca == 2 else 0) + 2 * (1 if cb == 2 else 0)
            b2 = eng.decision(77 + ctx, self._v(None if wc is None else
                                                (1 if wc == 2 else 0)))
            cbp |= (1 + b2) << 4
        return cbp if not self.enc else value

    def mb_qp_delta(self, value=None) -> int:
        eng = self.eng
        inc = 1 if self.last_dqp != 0 else 0
        if self.enc:
            val = 2 * value - 1 if value > 0 else -2 * value
            eng.decision(60 + inc, 1 if val else 0)
            if val:
                n = 1
                ctx = 2
                while n < val:
                    eng.decision(60 + ctx, 1)
                    ctx = 3
                    n += 1
                eng.decision(60 + ctx, 0)
            self.last_dqp = value
            return value
        if eng.decision(60 + inc):
            val = 1
            ctx = 2
            while eng.decision(60 + ctx):
                ctx = 3
                val += 1
                if val > 104:
                    raise AVError(INVALIDDATA, "dqp overflow")
            delta = (val + 1) >> 1 if val & 1 else -((val + 1) >> 1)
        else:
            delta = 0
        self.last_dqp = delta
        return delta

    def mb_type_b(self, i: int, value=None) -> int:
        """B mb_type, full binarization (Table 9-37; reference
        decode_cabac_mb_type B branch): 0=B_Direct_16x16, 1..21 per
        Table 7-14, 22=B_8x8, 23 = intra marker (the intra suffix
        follows via mb_type_intra)."""
        eng = self.eng
        c = self.ctx
        left, top = c.neighbors(i, self.cur_slice)
        inc = 0
        if left >= 0 and not c.direct[left]:
            inc += 1
        if top >= 0 and not c.direct[top]:
            inc += 1
        if self.enc:
            eng.decision(27 + inc, 1 if value else 0)
            if not value:
                return value
            if value in (1, 2):
                eng.decision(27 + 3, 0)
                eng.decision(27 + 5, value - 1)
                return value
            eng.decision(27 + 3, 1)
            if 3 <= value <= 10:
                bits, nb = value - 3, 4
            elif value == 23:                    # intra suffix follows
                bits, nb = 13, 4
            elif value == 11:
                bits, nb = 14, 4
            elif value == 22:
                bits, nb = 15, 4
            else:                                # 12..21: 5-bin suffix
                bits, nb = ((value - 12) >> 1) + 8, 4
                bits = (bits << 1) | ((value - 12) & 1)
                nb = 5
            for k in range(nb - 1, -1, -1):
                ctx = 27 + 4 if k == nb - 1 else 27 + 5
                eng.decision(ctx, (bits >> k) & 1)
            return value
        if not eng.decision(27 + inc):
            return 0
        if not eng.decision(27 + 3):
            return 1 + eng.decision(27 + 5)
        bits = eng.decision(27 + 4) << 3
        bits |= eng.decision(27 + 5) << 2
        bits |= eng.decision(27 + 5) << 1
        bits |= eng.decision(27 + 5)
        if bits < 8:
            return bits + 3
        if bits == 13:
            return 23                            # intra suffix follows
        if bits == 14:
            return 11
        if bits == 15:
            return 22
        return ((bits - 8) << 1 | eng.decision(27 + 5)) + 12

    def sub_mb_type_p(self, value=None) -> int:
        """P sub_mb_type 0..3 (ctx 21-23; reference
        decode_cabac_p_mb_sub_type)."""
        eng = self.eng
        if self.enc:
            eng.decision(21, 1 if value == 0 else 0)
            if value != 0:
                eng.decision(22, 0 if value == 1 else 1)
                if value != 1:
                    eng.decision(23, 1 if value == 2 else 0)
            return value
        if eng.decision(21):
            return 0
        if not eng.decision(22):
            return 1
        return 2 if eng.decision(23) else 3

    def sub_mb_type_b(self, value=None) -> int:
        """B sub_mb_type 0..12 (ctx 36-39; reference
        decode_cabac_b_mb_sub_type)."""
        eng = self.eng
        if self.enc:
            eng.decision(36, 0 if value == 0 else 1)
            if value == 0:
                return value
            if value in (1, 2):
                eng.decision(37, 0)
                eng.decision(39, value - 1)
                return value
            eng.decision(37, 1)
            if value >= 11:
                eng.decision(38, 1)
                eng.decision(39, 1)
                eng.decision(39, value - 11)
            elif value >= 7:
                eng.decision(38, 1)
                eng.decision(39, 0)
                eng.decision(39, ((value - 7) >> 1) & 1)
                eng.decision(39, (value - 7) & 1)
            else:
                eng.decision(38, 0)
                eng.decision(39, ((value - 3) >> 1) & 1)
                eng.decision(39, (value - 3) & 1)
            return value
        if not eng.decision(36):
            return 0
        if not eng.decision(37):
            return 1 + eng.decision(39)
        t = 3
        if eng.decision(38):
            if eng.decision(39):
                return 11 + eng.decision(39)
            t += 4
        t += eng.decision(39) << 1
        t += eng.decision(39)
        return t

    def ref_idx(self, lst: int, bx: int, by: int, nref: int,
                value=None) -> int:
        """ref_idx_lX with block-granular context (9.3.3.1.1.6;
        reference decode_cabac_mb_ref reading ref_cache/direct_cache)."""
        eng = self.eng
        g = self.grids
        inc = 0
        for bit, (nx, ny) in ((1, (bx - 1, by)), (2, (bx, by - 1))):
            if nx < 0 or ny < 0 or nx >= g.bw:
                continue
            mb = (ny >> 2) * g.mb_w + (nx >> 2)
            if g.slice_id[mb] != self.cur_slice:
                continue
            if g.bref[lst, ny, nx] > 0 and not (
                    self.slice_type == 1 and g.bdirect[ny, nx]):
                inc += bit
        ref = 0
        ctx = inc
        while True:
            b = eng.decision(54 + ctx,
                             self._v(None if value is None else
                                     (1 if ref < value else 0)))
            if not b:
                break
            ref += 1
            ctx = (ctx >> 2) + 4
            if ref >= 32:
                raise AVError(INVALIDDATA, "ref_idx overflow")
        return ref

    def mvd(self, lst: int, bx: int, by: int, comp: int,
            value=None) -> int:
        """mvd_lX with block-granular amvd context (9.3.3.1.1.7)."""
        amvd = self.grids.amvd(lst, bx, by, comp, self.cur_slice)
        base = 40 if comp == 0 else 47
        return code_ueg3_mvd(self.eng, base, amvd, value)

    def motion(self, lst: int, bx: int, by: int, pred):
        """Decode-side leg of the shared inter walk (part.code_inter_mb);
        the encoder drives the same walk through its plan writer."""
        mvdx = self.mvd(lst, bx, by, 0)
        mvdy = self.mvd(lst, bx, by, 1)
        return (pred[0] + mvdx, pred[1] + mvdy), (mvdx, mvdy)

    def end_of_slice(self, value=None) -> int:
        return self.eng.terminate(self._v(value))

    def pcm_samples(self, i: int, value=None) -> bytes:
        """I_PCM raw sample transport + the reference's bookkeeping for
        every context the MB participates in afterwards
        (h264_cabac.c:2045-2052: cbp 0xf7ef, chroma_pred_mode 0,
        qscale 0, nnz 16, last_qscale_diff 0)."""
        c = self.ctx
        c.intra[i] = True
        c.intra16[i] = True                # counts as non-I_NxN (1304)
        c.cbp[i] = 0x1EF       # luma 0xf, chroma 2, Y/Cb/Cr DC coded
        c.chroma_mode[i] = 0
        mb_x, mb_y = i % c.mb_w, i // c.mb_w
        c.nnz_y[4 * mb_y:4 * mb_y + 4, 4 * mb_x:4 * mb_x + 4] = 16
        c.nnz_u[2 * mb_y:2 * mb_y + 2, 2 * mb_x:2 * mb_x + 2] = 16
        c.nnz_v[2 * mb_y:2 * mb_y + 2, 2 * mb_x:2 * mb_x + 2] = 16
        self.last_dqp = 0
        if self.enc:
            self.eng.write_pcm(value)
            return value
        return self.eng.read_pcm(384)

    def transform_size_8x8(self, i: int, value=None) -> int:
        """transform_size_8x8_flag (spec 9.3.3.1.1.10, ctxIdxOffset 399:
        inc = left neighbor's flag + top neighbor's flag)."""
        c = self.ctx
        left, top = c.neighbors(i, self.cur_slice)
        inc = (1 if left >= 0 and c.transform8[left] else 0) + \
              (1 if top >= 0 and c.transform8[top] else 0)
        return self.eng.decision(399 + inc, self._v(value))

    def residual8(self, levels64):
        """One 8x8 luma residual block, ctxBlockCat 5 (no
        coded_block_flag for 4:2:0 — presence is signalled by the cbp
        bit, spec 7.4.5.3.3). levels64 in 8x8 zigzag scan order."""
        return code_residual(self.eng, 5, levels64, 64,
                             field=self.field)

    # -- residual with coded_block_flag -------------------------------------

    def _cbf_ctx(self, i: int, cat: int, blk: int) -> int:
        """ctx for coded_block_flag (reference get_cabac_cbf_ctx)."""
        c = self.ctx
        mb_w = c.mb_w
        x, y = i % mb_w, i // mb_w
        cur_intra = bool(c.intra[i])
        left, top = c.neighbors(i, self.cur_slice)
        if cat == 0:       # luma DC: dc flag bit of neighbor MB cbp
            nza = (int(c.cbp[left]) if left >= 0 else
                   (0x7CF if cur_intra else 0)) & 0x100
            nzb = (int(c.cbp[top]) if top >= 0 else
                   (0x7CF if cur_intra else 0)) & 0x100
        elif cat == 3:     # chroma DC (blk = component)
            bit = 0x40 << blk
            nza = (int(c.cbp[left]) if left >= 0 else
                   (0x7CF if cur_intra else 0)) & bit
            nzb = (int(c.cbp[top]) if top >= 0 else
                   (0x7CF if cur_intra else 0)) & bit
        elif cat in (1, 2):  # luma 4x4/AC: nnz grid neighbors
            bx = 4 * x + (2 * ((blk >> 2) & 1) + (blk & 1))
            by = 4 * y + (2 * (blk >> 3) + ((blk >> 1) & 1))
            nza = self._nnz_at(c.nnz_y, bx - 1, by, i, left if bx % 4 == 0
                               else i, cur_intra, horiz=True)
            nzb = self._nnz_at(c.nnz_y, bx, by - 1, i, top if by % 4 == 0
                               else i, cur_intra, horiz=False)
        else:              # cat 4: chroma AC (blk = 4*c + b)
            comp, b = blk >> 2, blk & 3
            grid = c.nnz_u if comp == 0 else c.nnz_v
            bx = 2 * x + (b & 1)
            by = 2 * y + (b >> 1)
            nza = self._nnz_at(grid, bx - 1, by, i, left if bx % 2 == 0
                               else i, cur_intra, horiz=True)
            nzb = self._nnz_at(grid, bx, by - 1, i, top if by % 2 == 0
                               else i, cur_intra, horiz=False)
        inc = (1 if nza > 0 else 0) + 2 * (1 if nzb > 0 else 0)
        return _CBF_BASE[cat] + inc

    def _nnz_at(self, grid, bx, by, i, nbr_mb, cur_intra, horiz):
        """nnz of the neighboring 4x4 block, with the reference's
        unavailable defaults (h264_mvpred.h:555/585: CABAC inter -> 0,
        intra -> 64)."""
        if bx < 0 or by < 0:
            return 64 if cur_intra else 0
        if nbr_mb != i and nbr_mb < 0:
            return 64 if cur_intra else 0
        return int(grid[by, bx])

    def residual(self, i: int, cat: int, blk: int, levels, max_coeff: int,
                 coded=None):
        """coded_block_flag + (if set) the block. Returns nnz (0 when
        cbf=0). For encode, `coded` = bool(any levels)."""
        eng = self.eng
        ctx = self._cbf_ctx(i, cat, blk)
        cbf = eng.decision(ctx, self._v(None if coded is None else
                                        (1 if coded else 0)))
        if not cbf:
            return 0
        nnz = code_residual(eng, cat, levels, max_coeff,
                            field=self.field)
        # record DC flags in the cbp table for later neighbors
        if cat == 0:
            self.ctx.cbp[i] |= 0x100
        elif cat == 3:
            self.ctx.cbp[i] |= 0x40 << blk
        return nnz
