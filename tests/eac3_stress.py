"""E-AC-3 stress-stream emitter: writes syntactically valid A/52B
Annex E frames exercising the decode paths the reference *encoder*
never emits — AHT (GAQ modes 0-3, VQ hebaps, zero-hebap noise),
spectral extension (band structure new/default/no-change, coords
reuse, attenuation), eac3 coupling (first-coords rule, leak rule,
phase flags, spx-derived cpl end), short frames (1/2/3 blocks), and
the header skip fields (mixing/informational metadata).

Payload bits (exponents, mantissas, coords) are pseudo-random but
syntactically consistent: the emitter computes the same bit allocation
the decoder will (libav_tpu.codecs.ac3.bitalloc), so the mantissa
field lengths line up.  Audio content is noise — the point is that our
decoder and the reference decoder agree sample-exactly on the result
(reference: eac3dec.c, ac3dec.c s->eac3 branches).
"""

from __future__ import annotations

import numpy as np

from libav_tpu.bitstream.putbits import PutBits
from libav_tpu.codecs.ac3 import bitalloc, tables as T
from libav_tpu.codecs.ac3 import eac3_tables as E

CPL = -1
EXP_REUSE, EXP_D15 = 0, 1


class _FrameSpec:
    """Per-frame feature knobs."""

    def __init__(self, acmod=2, lfeon=0, num_blocks=6,
                 aht=(), gaq_mode=0, hebap_hi=9,
                 spx=False, spx_default_struct=False, spx_restrobe=False,
                 cpl=False, cpl_default_struct=False, phsflg=False,
                 mixmd=False, infomd=False, csnr=28, fsnr=8,
                 bwcod=48, seed=0):
        self.acmod = acmod
        self.lfeon = lfeon
        self.num_blocks = num_blocks
        self.aht = set(aht)          # channel indices (CPL allowed)
        self.gaq_mode = gaq_mode
        self.hebap_hi = hebap_hi     # target top hebap for AHT channels
        self.spx = spx
        self.spx_default_struct = spx_default_struct
        self.spx_restrobe = spx_restrobe
        self.cpl = cpl
        self.cpl_default_struct = cpl_default_struct
        self.phsflg = phsflg
        self.mixmd = mixmd
        self.infomd = infomd
        self.csnr = csnr
        self.fsnr = fsnr
        self.bwcod = bwcod
        self.seed = seed


def _exponents(rng, n, absexp):
    """Random-walk exponent chain staying in [0, 24]: returns group
    codes (7-bit) plus the per-bin exponent values after the absolute
    predictor."""
    codes, exps = [], []
    prev = absexp
    for _ in range(n):          # n groups of 3 (D15)
        ds = []
        for _ in range(3):
            lo = max(0, 2 - prev)        # keep prev+d-2 in [0, 24]
            hi = min(4, 26 - prev)
            d = int(rng.integers(lo, hi + 1))
            prev += d - 2
            ds.append(d)
            exps.append(prev)
        codes.append(ds[0] * 25 + ds[1] * 5 + ds[2])
    return codes, exps


def write_frame(spec: _FrameSpec) -> bytes:
    rng = np.random.default_rng(spec.seed)
    acmod, lfeon, nblocks = spec.acmod, spec.lfeon, spec.num_blocks
    nfchans = int(T.CHANNELS[acmod])
    lfe_ch = nfchans
    nrows = nfchans + (1 if lfeon else 0)
    pb = PutBits()
    put = pb.put_bits

    put(16, 0x0B77)
    put(2, 0)                   # strmtyp independent
    put(3, 0)                   # substreamid
    frmsiz_pos_bits = pb.bits_written()
    put(11, 0)                  # frmsiz — patched after flush
    put(2, 0)                   # fscod 48 kHz
    put(2, {1: 0, 2: 1, 3: 2, 6: 3}[nblocks])  # numblkscod
    put(3, acmod)
    put(1, lfeon)
    put(5, 16)                  # bsid
    for _ in range(2 if acmod == 0 else 1):
        put(5, 31)              # dialnorm
        put(1, 0)               # compre
    # mixing metadata
    put(1, 1 if spec.mixmd else 0)
    if spec.mixmd:
        if acmod > 2:
            put(2, 0)
            if acmod & 1:
                put(6, 0)
            if acmod & 4:
                put(6, 0)
        if lfeon:
            put(1, 0)
        for _ in range(2 if acmod == 0 else 1):
            put(1, 0)           # no program scale factor
        put(1, 0)               # no external program scale
        put(2, 3)               # mixdef 3: length-coded mix data
        put(5, 1)               # (1+2)*8 bits of mix data
        put(24, 0xABCDEF)
        if acmod < 2:
            for _ in range(2 if acmod == 0 else 1):
                put(1, 0)
        put(1, 0)               # no frame mix config info
    # informational metadata
    put(1, 1 if spec.infomd else 0)
    if spec.infomd:
        put(5, 0)               # bsmod + copyright + origbs
        if acmod == 2:
            put(4, 0)
        if acmod >= 6:
            put(2, 0)
        for _ in range(2 if acmod == 0 else 1):
            put(1, 0)
        put(1, 0)               # sourcefscod
    if nblocks != 6:
        put(1, 1)               # convsync
    put(1, 0)                   # addbsie

    # ---- audio frame header ----
    if nblocks == 6:
        put(1, 1)               # ac3_exponent_strategy (per-block)
        put(1, 1 if spec.aht else 0)
    put(2, 0)                   # snr_offset_strategy 0 (per frame)
    put(1, 0)                   # transient proc
    put(1, 0)                   # block switch syntax
    put(1, 0)                   # dither flag syntax
    put(1, 0)                   # bit allocation syntax
    put(1, 0)                   # fast gain syntax
    put(1, 0)                   # dba syntax
    put(1, 0)                   # skip syntax
    put(1, 0)                   # spx atten data

    cpl_in_use = [spec.cpl] * nblocks
    if acmod > 1:
        for blk in range(nblocks):
            if blk:
                put(1, 0)       # cplstre: reuse
            else:
                put(1, 1 if spec.cpl else 0)
    else:
        cpl_in_use = [False] * nblocks
    num_cpl_blocks = sum(cpl_in_use)

    # exponent strategies: D15 at block 0, REUSE after (AHT-compatible)
    estrat = {ch: [EXP_D15] + [EXP_REUSE] * (nblocks - 1)
              for ch in [CPL] + list(range(nfchans))}
    for blk in range(nblocks):
        chans = ([CPL] if cpl_in_use[blk] else []) + list(range(nfchans))
        for ch in chans:
            put(2, estrat[ch][blk])
    if lfeon:
        for blk in range(nblocks):
            put(1, EXP_D15 if blk == 0 else EXP_REUSE)
    if nblocks == 6:
        put(5 * nfchans, 0)     # converter channel exponent strategy
    else:
        put(1, 0)               # no converter exponent strategy
    # AHT eligibility mirrors the decoder: all-reuse after block 0
    aht = {}
    if spec.aht and nblocks == 6:
        chans = ([CPL] if num_cpl_blocks == 6 else []) + list(range(nrows))
        for ch in chans:
            eligible = all(e == EXP_REUSE for e in
                           (estrat.get(ch, [0] + [EXP_REUSE] * 5))[1:])
            if eligible:
                use = ch in spec.aht
                put(1, 1 if use else 0)
                aht[ch] = use
    put(6, spec.csnr)
    put(4, spec.fsnr)
    snr_offset = ((((spec.csnr - 15) << 4) + spec.fsnr) << 2)
    if nblocks > 1:
        put(1, 0)               # no block start info

    # ---- per-frame channel state the emitter tracks ----
    start = {ch: 0 for ch in range(nrows)}
    end = {ch: (7 if (lfeon and ch == lfe_ch) else spec.bwcod * 3 + 73)
           for ch in range(nrows)}
    exps = {}
    first_cpl_coords = [True] * nfchans
    first_spx_coords = [True] * nfchans
    first_cpl_leak = True
    spx_state = {}
    cpl_state = {}
    pre_mant_written = set()

    for blk in range(nblocks):
        for _ in range(2 if acmod == 0 else 1):
            put(1, 0)           # dynrnge

        # ---- spectral extension ----
        spx_in_use = spec.spx
        if blk == 0:
            put(1, 1 if spx_in_use else 0)
        elif spec.spx_restrobe and blk == 2:
            put(1, 1)           # spxstre: re-strobe, no struct change
            put(1, 1 if spx_in_use else 0)
        else:
            put(1, 0)           # spxstre: reuse
        if spx_in_use and (blk == 0 or (spec.spx_restrobe and blk == 2)):
            # strategy
            if acmod != 1:
                for _ in range(nfchans):
                    put(1, 1)   # all channels in spx
            dst_start = 0
            start_subband = 3
            end_subband = 7     # codes > 7 double (spx_strategy); keep linear
            put(2, dst_start)
            put(3, start_subband - 2)
            put(3, end_subband - 5)
            n_subbands = end_subband - start_subband
            if blk == 0 and not spec.spx_default_struct:
                put(1, 1)       # new band structure
                struct = [int(rng.integers(0, 2))
                          for _ in range(n_subbands - 1)]
                for b in struct:
                    put(1, b)
            elif blk == 0:
                put(1, 0)       # use default band structure
                struct = list(E.DEFAULT_SPX_BAND_STRUCT[
                    start_subband + 1:start_subband + n_subbands])
            else:
                put(1, 0)       # no change
                struct = spx_state["struct"]
            sizes = [12]
            for b in struct:
                if b:
                    sizes[-1] += 12
                else:
                    sizes.append(12)
            spx_state = dict(struct=struct, nbands=len(sizes),
                             sizes=sizes,
                             src_start=start_subband * 12 + 25,
                             dst_start=dst_start * 12 + 25)
            for ch in range(nfchans):
                end[ch] = spx_state["src_start"]
        if spx_in_use:
            # coordinates: forced at the first block after (re)entry
            for ch in range(nfchans):
                if first_spx_coords[ch]:
                    first_spx_coords[ch] = False
                else:
                    put(1, 1 if blk == 1 else 0)  # re-send once
                    if blk != 1:
                        continue
                put(5, int(rng.integers(0, 32)))     # spx_blend
                put(2, 0)                            # master
                for _ in range(spx_state["nbands"]):
                    put(4, int(rng.integers(0, 4)))  # exp (small=loud)
                    put(2, int(rng.integers(0, 4)))  # mant

        # ---- coupling ----
        if cpl_in_use[blk] and blk == 0:
            put(1, 0)           # ecplinu
            if acmod != 2:
                for _ in range(nfchans):
                    put(1, 1)
            if acmod == 2:
                put(1, 1 if spec.phsflg else 0)
            # with spx, the cpl range ends at spx_src_start (cplendf
            # derived): keep cplbegf below it
            cplbegf = 0 if spx_in_use else 2
            put(4, cplbegf)
            if spx_in_use:
                cplendf = (spx_state["src_start"] - 37) // 12
            else:
                cplendf = 6
                put(4, cplendf - 3)
            n_sub = cplendf - cplbegf
            if spec.cpl_default_struct:
                put(1, 0)
                struct = list(E.DEFAULT_CPL_BAND_STRUCT[
                    cplbegf + 1:cplbegf + n_sub])
            else:
                put(1, 1)
                struct = [int(rng.integers(0, 2)) for _ in range(n_sub - 1)]
                for b in struct:
                    put(1, b)
            sizes = [12]
            for b in struct:
                if b:
                    sizes[-1] += 12
                else:
                    sizes.append(12)
            cpl_state = dict(nbands=len(sizes), sizes=sizes,
                             start=cplbegf * 12 + 37,
                             end=cplendf * 12 + 37)
            for ch in range(nfchans):
                end[ch] = cpl_state["start"]
        if cpl_in_use[blk]:
            coords_exist = False
            for ch in range(nfchans):
                if first_cpl_coords[ch]:
                    first_cpl_coords[ch] = False
                else:
                    put(1, 1 if blk == 1 else 0)
                    if blk != 1:
                        continue
                coords_exist = True
                put(2, 0)       # master
                for _ in range(cpl_state["nbands"]):
                    put(4, int(rng.integers(0, 6)))
                    put(4, int(rng.integers(0, 16)))
            if acmod == 2 and coords_exist and spec.phsflg:
                for _ in range(cpl_state["nbands"]):
                    put(1, int(rng.integers(0, 2)))

        # ---- rematrixing ----
        if acmod == 2:
            if blk == 0:
                nbnd = 4
                if cpl_in_use[blk] and cpl_state["start"] <= 61:
                    nbnd -= 1 + (cpl_state["start"] == 37)
                elif spx_in_use and spx_state["src_start"] <= 61:
                    nbnd -= 1
                for _ in range(nbnd):
                    put(1, int(rng.integers(0, 2)))
            else:
                put(1, 0)       # rematstr reuse

        # ---- channel bandwidth + exponents ----
        chans = ([CPL] if cpl_in_use[blk] else []) + list(range(nrows))
        for ch in range(nfchans):
            if estrat[ch][blk] != EXP_REUSE and not cpl_in_use[blk] \
                    and not spx_in_use:
                put(6, spec.bwcod)
        for ch in chans:
            is_lfe = lfeon and ch == lfe_ch
            stra = (EXP_D15 if blk == 0 else EXP_REUSE) if is_lfe \
                else estrat[ch][blk]
            if stra == EXP_REUSE:
                continue
            if ch == CPL:
                absexp = int(rng.integers(2, 8))
                put(4, absexp)
                ngrps = (cpl_state["end"] - cpl_state["start"]) // 3
                codes, ex = _exponents(rng, ngrps, absexp << 1)
                for c in codes:
                    put(7, c)
                e_arr = np.zeros(256, dtype=np.int32)
                e_arr[cpl_state["start"]:cpl_state["start"] + 3 * ngrps] \
                    = ex
                exps[CPL] = e_arr
            else:
                absexp = int(rng.integers(2, 10))
                put(4, absexp)
                ngrps = (end[ch] + 3 - 4) // 3
                codes, ex = _exponents(rng, ngrps, absexp)
                for c in codes:
                    put(7, c)
                e_arr = np.zeros(256, dtype=np.int32)
                e_arr[0] = absexp
                e_arr[1:end[ch]] = ex[:end[ch] - 1]
                exps[ch] = e_arr
                if not is_lfe:
                    put(2, 0)   # gainrng

        # ---- converter snr offset (independent frames: 1 bit) ----
        put(1, 0)

        # ---- coupling leak ----
        if cpl_in_use[blk]:
            if first_cpl_leak:
                put(3, 4)       # fast leak (no existence bit: forced)
                put(3, 3)       # slow leak
                first_cpl_leak = False
            else:
                put(1, 0)       # cplleake: reuse

        # ---- bit allocation (emitter mirror) ----
        bap = {}
        for ch in chans:
            is_lfe = lfeon and ch == lfe_ch
            s0 = cpl_state["start"] if ch == CPL else 0
            s1 = cpl_state["end"] if ch == CPL else end[ch]
            bap[ch] = bitalloc.run_bit_alloc(
                exps[ch], s0, s1, 0,
                fast_gain=int(T.FAST_GAIN[4]),
                snr_offset=snr_offset, is_lfe=is_lfe,
                cpl_leak=(4, 3) if ch == CPL else None,
                bap_tab=(E.HEBAP_TAB if aht.get(ch) else None))

        # ---- mantissas ----
        b1c = b2c = b4c = 0

        def write_mants(ch):
            nonlocal b1c, b2c, b4c
            is_lfe = lfeon and ch == lfe_ch
            s0 = cpl_state["start"] if ch == CPL else 0
            s1 = cpl_state["end"] if ch == CPL else end[ch]
            if aht.get(ch):
                if ch in pre_mant_written:
                    return
                pre_mant_written.add(ch)
                _write_aht(ch, s0, s1)
                return
            for k in range(s0, s1):
                b = int(bap[ch][k])
                if b == 0:
                    continue
                if b == 1:
                    if b1c == 0:
                        put(5, int(rng.integers(0, 27)))
                        b1c = 3
                    b1c -= 1
                elif b == 2:
                    if b2c == 0:
                        put(7, int(rng.integers(0, 125)))
                        b2c = 3
                    b2c -= 1
                elif b == 3:
                    put(3, int(rng.integers(0, 8)))
                elif b == 4:
                    if b4c == 0:
                        put(7, int(rng.integers(0, 121)))
                        b4c = 2
                    b4c -= 1
                elif b == 5:
                    put(4, int(rng.integers(0, 16)))
                else:
                    put(T.BAP_BITS[b], int(rng.integers(
                        0, 1 << T.BAP_BITS[b])))

        def _write_aht(ch, s0, s1):
            """AHT pre-mantissa field for all 6 blocks (block 0 only)."""
            gaq = spec.gaq_mode
            put(2, gaq)
            end_bap = 12 if gaq < 2 else 17
            hebap = bap[ch]
            gains = []
            if gaq in (1, 2):
                for k in range(s0, s1):
                    if 7 < int(hebap[k]) < end_bap:
                        g = int(rng.integers(0, 2))
                        put(1, g)
                        gains.append(g << (gaq - 1))
            elif gaq == 3:
                gc = 2
                for k in range(s0, s1):
                    if 7 < int(hebap[k]) < 17:
                        gc += 1
                        if gc == 3:
                            code = int(rng.integers(0, 27))
                            put(5, code)
                            gains.extend(E.UNGROUP_3_IN_5[code])
                            gc = 0
            gs = 0
            for k in range(s0, s1):
                hb = int(hebap[k])
                bits = E.BITS_VS_HEBAP[hb]
                if hb == 0:
                    continue
                if hb < 8:
                    put(bits, int(rng.integers(0, len(E.MANTISSA_VQ[hb]))))
                    continue
                if gaq != 0 and hb < end_bap:
                    log_gain = gains[gs]
                    gs += 1
                else:
                    log_gain = 0
                gbits = bits - log_gain
                for _ in range(6):
                    v = int(rng.integers(-(1 << (gbits - 1)),
                                         1 << (gbits - 1)))
                    pb.put_sbits(gbits, v)
                    if log_gain and v == -(1 << (gbits - 1)):
                        mbits = bits - (2 - log_gain)
                        pb.put_sbits(mbits, int(rng.integers(
                            -(1 << (mbits - 1)), 1 << (mbits - 1))))

        got_cpl = False
        for ch in range(nrows):
            write_mants(ch)
            if ch < nfchans and cpl_in_use[blk] and not got_cpl:
                write_mants(CPL)
                got_cpl = True

    pb.align()
    raw = bytearray(pb.flush())
    if len(raw) % 2:
        raw.append(0)
    words = len(raw) // 2
    assert words <= 2048, f"frame too large for frmsiz: {words} words"
    assert frmsiz_pos_bits == 21
    frmsiz = words - 1
    raw[2] = (raw[2] & 0xF8) | ((frmsiz >> 8) & 0x07)
    raw[3] = frmsiz & 0xFF
    return bytes(raw)


def write_stream(path: str, specs) -> None:
    with open(path, "wb") as f:
        for spec in specs:
            f.write(write_frame(spec))
