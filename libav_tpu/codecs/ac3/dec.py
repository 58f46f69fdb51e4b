"""AC-3 decoder (reference: libavcodec/ac3dec.c ac3_decode_frame ->
decode_audio_block -> do_imdct :641 — SURVEY.md §3.4).

Full A/52 block decode: channel coupling (coupling_strategy /
coupling_coordinates / calc_transform_coeffs_cpl), stereo rematrixing,
block switching (dual 256-point transforms), zero-bap dither with the
reference's lagged-Fibonacci PRNG, delta bit allocation, and bsid 9/10
half/quarter sample rates.  Mantissas are reconstructed in the
reference's 1.24 fixed-point convention (symmetric_dequant with integer
truncation, coefficients = mantissa >> exponent) so the float output
tracks the reference decoder to rounding error."""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np

from libav_tpu.avutil import log
from libav_tpu.avutil.error import AVError, INVALIDDATA
from libav_tpu.avutil.frame import Frame, Packet
from libav_tpu.avutil.samplefmt import default_channel_layout
from libav_tpu.bitstream import GetBits
from libav_tpu.codecs.api import Decoder, MediaType, register_codec
from libav_tpu.codecs.ac3 import bitalloc, tables as T

EXP_REUSE, EXP_D15, EXP_D25, EXP_D45 = 0, 1, 2, 3
DBA_NONE, DBA_REUSE, DBA_NEW, DBA_RESERVED = 0, 1, 2, 3
CPL = -1          # coupling-channel key

# A/52 §7.5.2 rematrixing band edges (ff_ac3_rematrix_band_tab)
REMATRIX_BANDS = [13, 25, 37, 61, 253]


class LFG:
    """av_lfg lagged-Fibonacci PRNG (libavutil/lfg.c): 64-word state
    seeded via MD5, state[i] = state[i-24] + state[i-55] mod 2^32.
    Bit-exact replication is required for zero-bap dither parity."""

    def __init__(self, seed: int = 0):
        self.state = [0] * 64
        tmp = bytearray(16)          # REUSED across iterations: each MD5
        for i in range(8, 64, 4):    # input is the previous digest with
            tmp[0:4] = int(seed).to_bytes(4, "little")   # seed+i patched
            tmp[4] = i
            tmp[:] = hashlib.md5(bytes(tmp)).digest()
            for k in range(4):
                self.state[i + k] = int.from_bytes(
                    tmp[4 * k:4 * k + 4], "little")
        self.index = 0

    def get(self) -> int:
        i = self.index
        v = (self.state[(i - 24) & 63] + self.state[(i - 55) & 63]) \
            & 0xFFFFFFFF
        self.state[i & 63] = v
        self.index += 1
        return v


def _sym(code: int, levels: int) -> float:
    """A/52 symmetric quantizer reconstruction level (float, spec
    convention) — used by the encoder's quantizer decisions."""
    return (2 * code - (levels - 1)) / levels


def _symmetric_dequant(code: int, levels: int) -> int:
    """reference: ac3dec.c:112 — 1.24 fixed point, C int division
    (truncation toward zero)."""
    num = (code - (levels >> 1)) << 24
    q = abs(num) // levels
    return -q if num < 0 else q


def _build_mant_tables():
    b1 = np.zeros((32, 3), dtype=np.int64)
    for i in range(32):
        b1[i] = [_symmetric_dequant(i // 9, 3),
                 _symmetric_dequant((i % 9) // 3, 3),
                 _symmetric_dequant(i % 3, 3)]
    b2 = np.zeros((128, 3), dtype=np.int64)
    for i in range(128):
        b2[i] = [_symmetric_dequant(i // 25, 5),
                 _symmetric_dequant((i % 25) // 5, 5),
                 _symmetric_dequant(i % 5, 5)]
    b3 = np.array([_symmetric_dequant(i, 7) for i in range(8)],
                  dtype=np.int64)
    b4 = np.zeros((128, 2), dtype=np.int64)
    for i in range(128):
        if i < 121:
            b4[i] = [_symmetric_dequant(i // 11, 11),
                     _symmetric_dequant(i % 11, 11)]
    b5 = np.array([_symmetric_dequant(i, 15) for i in range(16)],
                  dtype=np.int64)
    return b1, b2, b3, b4, b5


_B1, _B2, _B3, _B4, _B5 = _build_mant_tables()


def decode_exponents(gb: GetBits, strategy: int, absexp: int,
                     ngrps: int) -> np.ndarray:
    """A/52 §7.1.3 grouped differential exponents: returns the chain of
    3*group_size*ngrps exponents following the absolute predictor."""
    group_size = {EXP_D15: 1, EXP_D25: 2, EXP_D45: 4}[strategy]
    out = np.zeros(ngrps * 3 * group_size, dtype=np.int32)
    prev = absexp
    pos = 0
    for _ in range(ngrps):
        code = gb.get_bits(7)
        if code >= 125:
            raise AVError(INVALIDDATA, "bad exponent group")
        for d in (code // 25, (code % 25) // 5, code % 5):
            prev += d - 2
            if prev < 0 or prev > 24:
                raise AVError(INVALIDDATA, "exponent out-of-range")
            out[pos:pos + group_size] = prev
            pos += group_size
    return out


class _MantState:
    def __init__(self):
        self.b1 = self.b2 = self.b4 = 0
        self.b1_mant = [0, 0]
        self.b2_mant = [0, 0]
        self.b4_mant = 0


@register_codec
class AC3Decoder(Decoder):
    NAME = "ac3"
    TYPE = MediaType.AUDIO
    LONG_NAME = "ATSC A/52 AC-3 (TPU IMDCT)"

    def _init(self):
        self._delay = None                 # (nch, 128) raw half overlap
        self._dith = LFG(0)

    def _flush(self):
        self._delay = None
        self._dith = LFG(0)

    def _decode(self, pkt: Packet) -> List[Frame]:
        frames = []
        data = pkt.data
        pos = 0
        while pos + 8 <= len(data):
            sync = data.find(b"\x0b\x77", pos)
            if sync < 0:
                break
            f = self._decode_syncframe(data[sync:])
            if f is None:
                break
            frame, consumed = f
            frame.pts = pkt.pts if not frames else frame.pts
            frame.time_base = pkt.time_base
            frames.append(frame)
            pos = sync + consumed
        return frames

    # ------------------------------------------------------------------ #

    def _decode_syncframe(self, data: bytes):
        gb = GetBits(data)
        if gb.get_bits(16) != 0x0B77:
            raise AVError(INVALIDDATA, "bad AC-3 sync word")
        gb.get_bits(16)             # crc1 (not verified)
        fscod = gb.get_bits(2)
        frmsizecod = gb.get_bits(6)
        if fscod == 3 or frmsizecod >= 38:
            raise AVError(INVALIDDATA, "bad fscod/frmsizecod")
        frame_bytes = int(T.FRAME_SIZE[frmsizecod][fscod]) * 2
        if len(data) < frame_bytes:
            return None

        bsid = gb.get_bits(5)
        if bsid > 10:
            raise AVError(INVALIDDATA, f"unsupported bsid {bsid} (E-AC-3?)")
        sr_shift = max(bsid - 8, 0)
        sample_rate = int(T.SAMPLE_RATES[fscod]) >> sr_shift
        gb.get_bits(3)              # bsmod
        acmod = gb.get_bits(3)
        nfchans = int(T.CHANNELS[acmod])
        if acmod & 1 and acmod != 1:
            gb.get_bits(2)          # cmixlev
        if acmod & 4:
            gb.get_bits(2)          # surmixlev
        if acmod == 2:
            gb.get_bits(2)          # dsurmod
        lfeon = gb.get_bits(1)
        gb.get_bits(5)              # dialnorm
        if gb.get_bits(1):
            gb.get_bits(8)          # compr
        if gb.get_bits(1):
            gb.get_bits(8)          # langcod
        if gb.get_bits(1):
            gb.get_bits(7)          # mixlevel + roomtyp
        if acmod == 0:
            gb.get_bits(5)
            if gb.get_bits(1):
                gb.get_bits(8)
            if gb.get_bits(1):
                gb.get_bits(8)
            if gb.get_bits(1):
                gb.get_bits(7)
        gb.get_bits(2)              # copyrightb + origbs
        if gb.get_bits(1):
            gb.get_bits(14)         # timecod1
        if gb.get_bits(1):
            gb.get_bits(14)         # timecod2
        if gb.get_bits(1):          # addbsie
            n = gb.get_bits(6)
            gb.skip_bits((n + 1) * 8)

        lfe_ch = nfchans            # row index of LFE when present
        nrows = nfchans + (1 if lfeon else 0)

        # persistent per-frame channel state (CPL rides under key CPL)
        st = {
            "exps": {ch: np.zeros(256, dtype=np.int32)
                     for ch in list(range(nrows)) + [CPL]},
            "start": {ch: 0 for ch in range(nrows)},
            "end": {ch: (7 if lfeon and ch == lfe_ch else 253)
                    for ch in range(nrows)},
            "exp_strategy": {},
            "snr_offset": {ch: 0 for ch in list(range(nrows)) + [CPL]},
            "fast_gain": {ch: int(T.FAST_GAIN[4])
                          for ch in list(range(nrows)) + [CPL]},
            "ba": dict(sdcycod=2, fdcycod=1, sgaincod=1, dbpbcod=2,
                       floorcod=7),
            "cpl_in_use": False,
            "chincpl": [False] * nfchans,
            "phsflginu": False,
            "num_cpl_bands": 0,
            "cpl_band_sizes": [],
            "cpl_coords": np.zeros((nfchans, 18), dtype=np.int64),
            "phase_flags": [0] * 18,
            "cpl_leak": (0, 0),
            "dba_mode": {ch: DBA_NONE
                         for ch in list(range(nrows)) + [CPL]},
            "dba": {},
            "dynrng": 1.0,
        }
        st["start"][CPL] = 0
        st["end"][CPL] = 0

        out = np.zeros((nrows, 1536), dtype=np.float64)
        if self._delay is None or self._delay.shape[0] != nrows:
            self._delay = np.zeros((nrows, 128), dtype=np.float64)

        for blk in range(6):
            self._decode_block(gb, blk, st, nfchans, nrows, lfeon, lfe_ch,
                               acmod, fscod, sr_shift,
                               out[:, blk * 256:(blk + 1) * 256])

        # AC-3 channel order -> default layout order (FL FR FC LFE BL BR)
        if acmod == 7:
            order = [0, 2, 1] + ([lfe_ch] if lfeon else []) + [3, 4]
        elif lfeon:
            order = list(range(nfchans)) + [lfe_ch]
        else:
            order = list(range(nfchans))
        frame = Frame(nb_samples=1536, sample_rate=sample_rate,
                      format="fltp", channels=nrows,
                      channel_layout=default_channel_layout(nrows))
        frame.planes = [out[c].astype(np.float32) for c in order]
        return frame, frame_bytes

    # ------------------------------------------------------------------ #

    def _decode_block(self, gb, blk, st, nfchans, nrows, lfeon, lfe_ch,
                      acmod, fscod, sr_shift, out):
        """reference: ac3dec.c decode_audio_block"""
        blksw = [gb.get_bits(1) for _ in range(nfchans)]
        dith = [gb.get_bits(1) for _ in range(nfchans)]
        i = 1 if acmod == 0 else 0
        while True:
            if gb.get_bits(1):
                v = gb.get_bits(8)
                e = (v >> 5) - ((v >> 7) << 3) - 5
                st["dynrng"] = (2.0 ** e) * ((v & 0x1F) | 0x20)
            elif blk == 0:
                st["dynrng"] = 1.0
            if i == 0:
                break
            i -= 1

        # ---- coupling strategy ----
        if gb.get_bits(1):          # cplstre
            st["cpl_in_use"] = bool(gb.get_bits(1))
            if st["cpl_in_use"]:
                if acmod < 2:
                    raise AVError(INVALIDDATA, "coupling in mono")
                st["chincpl"] = [bool(gb.get_bits(1))
                                 for _ in range(nfchans)]
                if acmod == 2:
                    st["phsflginu"] = bool(gb.get_bits(1))
                cplbegf = gb.get_bits(4)
                cplendf = gb.get_bits(4) + 3
                if cplbegf >= cplendf:
                    raise AVError(INVALIDDATA, "bad coupling range")
                st["start"][CPL] = cplbegf * 12 + 37
                st["end"][CPL] = cplendf * 12 + 37
                # band structure (A/52: cplbndstrc bits)
                nsub = cplendf - cplbegf
                struct_bits = [gb.get_bits(1) for _ in range(nsub - 1)]
                sizes = [12]
                for b in struct_bits:
                    if b:
                        sizes[-1] += 12
                    else:
                        sizes.append(12)
                st["num_cpl_bands"] = len(sizes)
                st["cpl_band_sizes"] = sizes
            else:
                st["chincpl"] = [False] * nfchans
                st["phsflginu"] = False
        elif blk == 0:
            raise AVError(INVALIDDATA,
                          "coupling strategy must be present in block 0")
        cpl_in_use = st["cpl_in_use"]

        # ---- coupling coordinates ----
        if cpl_in_use:
            coords_exist = False
            for ch in range(nfchans):
                if not st["chincpl"][ch]:
                    continue
                if gb.get_bits(1):  # cplcoe
                    coords_exist = True
                    mstr = 3 * gb.get_bits(2)
                    for bnd in range(st["num_cpl_bands"]):
                        cexp = gb.get_bits(4)
                        cmant = gb.get_bits(4)
                        if cexp == 15:
                            v = cmant << 22
                        else:
                            v = (cmant + 16) << 21
                        st["cpl_coords"][ch][bnd] = v >> (cexp + mstr)
                elif blk == 0:
                    raise AVError(INVALIDDATA,
                                  "coupling coords missing in block 0")
            if acmod == 2 and coords_exist:
                for bnd in range(st["num_cpl_bands"]):
                    st["phase_flags"][bnd] = \
                        gb.get_bits(1) if st["phsflginu"] else 0

        # ---- rematrixing ----
        if acmod == 2:
            if gb.get_bits(1):      # rematstr
                nbnd = 4
                if cpl_in_use and st["start"][CPL] <= 61:
                    nbnd -= 1 + (st["start"][CPL] == 37)
                st["num_remat"] = nbnd
                st["remat_flags"] = [gb.get_bits(1) for _ in range(nbnd)]
            elif blk == 0:
                st["num_remat"] = 0
                st["remat_flags"] = []

        # ---- exponent strategies ----
        chans = ([CPL] if cpl_in_use else []) + list(range(nrows))
        estrat = {}
        for ch in chans:
            bits = 1 if (lfeon and ch == lfe_ch) else 2
            estrat[ch] = gb.get_bits(bits)

        # ---- channel bandwidth ----
        for ch in range(nfchans):
            if estrat[ch] != EXP_REUSE:
                if st["chincpl"][ch]:
                    st["end"][ch] = st["start"][CPL]
                else:
                    bwcod = gb.get_bits(6)
                    if bwcod > 60:
                        raise AVError(INVALIDDATA, "bandwidth code > 60")
                    st["end"][ch] = bwcod * 3 + 73

        # ---- exponents ----
        for ch in chans:
            if estrat[ch] == EXP_REUSE:
                continue
            gs = 3 << (estrat[ch] - 1)
            if ch == CPL:
                absexp = gb.get_bits(4) << 1
                ngrps = (st["end"][CPL] - st["start"][CPL]) // gs
                st["exps"][CPL][st["start"][CPL]:st["start"][CPL] +
                                ngrps * gs] = decode_exponents(
                    gb, estrat[ch], absexp, ngrps)[:ngrps * gs]
            else:
                end = st["end"][ch]
                absexp = gb.get_bits(4)
                ngrps = (end + gs - 4) // gs
                chain = decode_exponents(gb, estrat[ch], absexp, ngrps)
                st["exps"][ch][0] = absexp
                st["exps"][ch][1:end] = chain[:end - 1]
                if ch != lfe_ch or not lfeon:
                    gb.get_bits(2)  # gainrng
        st["exp_strategy"] = estrat

        # ---- bit allocation info ----
        if gb.get_bits(1):
            st["ba"] = dict(sdcycod=gb.get_bits(2), fdcycod=gb.get_bits(2),
                            sgaincod=gb.get_bits(2), dbpbcod=gb.get_bits(2),
                            floorcod=gb.get_bits(3))
        elif blk == 0:
            raise AVError(INVALIDDATA,
                          "bit allocation info missing in block 0")

        # ---- snr offsets + fast gains ----
        if gb.get_bits(1):
            csnr = (gb.get_bits(6) - 15) << 4
            for ch in chans:
                st["snr_offset"][ch] = (csnr + gb.get_bits(4)) << 2
                st["fast_gain"][ch] = int(T.FAST_GAIN[gb.get_bits(3)])
        elif blk == 0:
            raise AVError(INVALIDDATA, "snr offsets missing in block 0")

        # ---- coupling leak ----
        if cpl_in_use:
            if gb.get_bits(1):
                st["cpl_leak"] = (gb.get_bits(3), gb.get_bits(3))
            elif blk == 0:
                raise AVError(INVALIDDATA,
                              "coupling leak missing in block 0")

        # ---- delta bit allocation ----
        if gb.get_bits(1):          # deltbaie
            dchans = ([CPL] if cpl_in_use else []) + list(range(nfchans))
            for ch in dchans:
                st["dba_mode"][ch] = gb.get_bits(2)
                if st["dba_mode"][ch] == DBA_RESERVED:
                    raise AVError(INVALIDDATA, "reserved dba strategy")
            for ch in dchans:
                if st["dba_mode"][ch] == DBA_NEW:
                    nseg = gb.get_bits(3) + 1
                    segs = []
                    for _ in range(nseg):
                        segs.append((gb.get_bits(5), gb.get_bits(4),
                                     gb.get_bits(3)))
                    st["dba"][ch] = segs
        elif blk == 0:
            for ch in list(range(nrows)) + [CPL]:
                st["dba_mode"][ch] = DBA_NONE

        # ---- bit allocation ----
        bap = {}
        for ch in chans:
            dba = st["dba"].get(ch) \
                if st["dba_mode"][ch] in (DBA_REUSE, DBA_NEW) else None
            bap[ch] = bitalloc.run_bit_alloc(
                st["exps"][ch], st["start"].get(ch, 0), st["end"][ch],
                fscod, fgaincod=None,
                fast_gain=st["fast_gain"][ch],
                snr_offset=st["snr_offset"][ch],
                is_lfe=(lfeon and ch == lfe_ch),
                cpl_leak=st["cpl_leak"] if ch == CPL else None,
                dba=dba, sr_shift=sr_shift, **st["ba"])

        # ---- skip field ----
        if gb.get_bits(1):
            skipl = gb.get_bits(9)
            gb.skip_bits(skipl * 8)

        # ---- transform coefficients (1.24 fixed) ----
        fixed = np.zeros((nrows, 256), dtype=np.int64)
        cpl_fixed = np.zeros(256, dtype=np.int64)
        cpl_bap = bap.get(CPL)
        m = _MantState()
        got_cpl = False
        for ch in range(nrows):
            is_lfe_ch = lfeon and ch == lfe_ch
            dither = (not is_lfe_ch) and ch < nfchans and dith[ch]
            fixed[ch, st["start"][ch]:st["end"][ch]] = \
                self._decode_mants(gb, bap[ch], st["exps"][ch],
                                   st["start"][ch], st["end"][ch],
                                   dither, m)
            if ch < nfchans and st["chincpl"][ch]:
                if not got_cpl:
                    cpl_fixed[st["start"][CPL]:st["end"][CPL]] = \
                        self._decode_mants(gb, cpl_bap, st["exps"][CPL],
                                           st["start"][CPL],
                                           st["end"][CPL], True, m)
                    got_cpl = True
                # uncouple this channel
                bin0 = st["start"][CPL]
                for bnd in range(st["num_cpl_bands"]):
                    bend = bin0 + st["cpl_band_sizes"][bnd]
                    coord = int(st["cpl_coords"][ch][bnd]) << 5
                    seg = cpl_fixed[bin0:bend]
                    vals = ((seg << 4) * coord) >> 32
                    if ch == 1 and acmod == 2 and st["phase_flags"][bnd]:
                        vals = -vals
                    fixed[ch, bin0:bend] = vals
                    bin0 = bend

        # remove dithering from coupled channels that don't dither
        for ch in range(nfchans):
            if st["chincpl"][ch] and not dith[ch]:
                rng = slice(st["start"][CPL], st["end"][CPL])
                z = cpl_bap[st["start"][CPL]:st["end"][CPL]] == 0
                seg = fixed[ch, rng]
                seg[z] = 0
                fixed[ch, rng] = seg

        # ---- rematrixing ----
        if acmod == 2:
            end = min(st["end"][0], st["end"][1])
            for bnd in range(st.get("num_remat", 0)):
                if st.get("remat_flags", [])[bnd]:
                    b0 = REMATRIX_BANDS[bnd]
                    b1 = min(end, REMATRIX_BANDS[bnd + 1])
                    t = fixed[0, b0:b1].copy()
                    fixed[0, b0:b1] = t + fixed[1, b0:b1]
                    fixed[1, b0:b1] = t - fixed[1, b0:b1]

        # ---- scale to float + IMDCT ----
        gain = st["dynrng"] / 4194304.0
        coeffs = fixed.astype(np.float64) * gain
        self._imdct_block(coeffs, blksw + [0] * (nrows - nfchans), out)

    # ------------------------------------------------------------------ #

    def _decode_mants(self, gb, bap, exps, start, end, dither,
                      m: _MantState) -> np.ndarray:
        """reference: ac3dec.c ac3_decode_transform_coeffs_ch (1.24
        fixed mantissa >> exponent)."""
        n = end - start
        out = np.zeros(n, dtype=np.int64)
        for k in range(n):
            freq = start + k
            b = int(bap[freq])
            if b == 0:
                if dither:
                    mant = (self._dith.get() // 362) - 5932275
                else:
                    mant = 0
            elif b == 1:
                if m.b1:
                    m.b1 -= 1
                    mant = m.b1_mant[m.b1]
                else:
                    bits = gb.get_bits(5)
                    mant = int(_B1[bits][0])
                    m.b1_mant = [int(_B1[bits][2]), int(_B1[bits][1])]
                    m.b1 = 2
            elif b == 2:
                if m.b2:
                    m.b2 -= 1
                    mant = m.b2_mant[m.b2]
                else:
                    bits = gb.get_bits(7)
                    mant = int(_B2[bits][0])
                    m.b2_mant = [int(_B2[bits][2]), int(_B2[bits][1])]
                    m.b2 = 2
            elif b == 3:
                mant = int(_B3[gb.get_bits(3)])
            elif b == 4:
                if m.b4:
                    m.b4 = 0
                    mant = m.b4_mant
                else:
                    bits = gb.get_bits(7)
                    mant = int(_B4[bits][0])
                    m.b4_mant = int(_B4[bits][1])
                    m.b4 = 1
            elif b == 5:
                mant = int(_B5[gb.get_bits(4)])
            else:
                nbits = int(T.BAP_BITS[b])
                raw = gb.get_sbits(nbits)
                mant = raw << (24 - nbits)
            out[k] = mant >> int(exps[freq])
        return out

    def _imdct_block(self, coeffs: np.ndarray, blksw, out):
        """One 256-sample block: IMDCT + KBD window TDAC butterfly
        against the 128-sample raw-half delay (reference: ac3dec.c
        do_imdct, float_dsp vector_fmul_window — restructured to full
        transforms; the half outputs are the middle half of the full
        IMDCT, see mdct_template.c ff_imdct_calc_c)."""
        from libav_tpu.ops import fftmdct as F
        nch = coeffs.shape[0]
        w = F.kbd_window(512, alpha=5.0)[:256]     # 256-tap KBD half
        for ch in range(nch):
            # -64/-128 = (N/2)x(-1/2): ops/fftmdct's imdct carries 2/N
            # and the opposite sign of the reference's imdct_half
            if blksw[ch]:
                even = coeffs[ch, 0::2].astype(np.float32)
                odd = coeffs[ch, 1::2].astype(np.float32)
                g1 = np.asarray(F.imdct((even * -64.0)[None, :]))[0]
                g2 = np.asarray(F.imdct((odd * -64.0)[None, :]))[0]
                cur = g1[64:192].astype(np.float64)
                nxt = g2[64:192].astype(np.float64)
            else:
                g = np.asarray(
                    F.imdct((coeffs[ch].astype(np.float32)
                             * -128.0)[None, :]))[0].astype(np.float64)
                cur = g[128:256]
                nxt = g[256:384]
            d = self._delay[ch]
            a = np.arange(128)
            out[ch, :128] = d * w[255 - a] - cur[127 - a] * w[a]
            out[ch, 128:] = d[127 - a] * w[127 - a] + cur * w[128 + a]
            self._delay[ch] = nxt
