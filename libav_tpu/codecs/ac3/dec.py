"""AC-3 decoder (reference: libavcodec/ac3dec.c ac3_decode_frame ->
decode_audio_block -> do_imdct :641 — SURVEY.md §3.4)."""

from __future__ import annotations

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


def decode_exponents(gb: GetBits, strategy: int, absexp: int,
                     nbins: int) -> np.ndarray:
    """A/52 §7.1.3: grouped differential exponents."""
    group_size = {EXP_D15: 1, EXP_D25: 2, EXP_D45: 4}[strategy]
    ngrps = (nbins + group_size * 3 - 4) // (3 * group_size)
    exps = np.zeros(nbins, dtype=np.int32)
    exps[0] = absexp
    prev = absexp
    pos = 1
    for _ in range(ngrps):
        code = gb.get_bits(7)
        for d in (code // 25, (code % 25) // 5, code % 5):
            if d > 4:
                raise AVError(INVALIDDATA, "bad exponent group")
            prev += d - 2
            if prev < 0 or prev > 24:
                raise AVError(INVALIDDATA, "exponent out of range")
            for _ in range(group_size):
                if pos < nbins:
                    exps[pos] = prev
                    pos += 1
    return exps


def _sym(code: int, levels: int) -> float:
    return (2 * code - (levels - 1)) / levels


class _MantState:
    """Grouped-mantissa carry state, reset per block (shared across
    channels — reference: ac3dec.c mant_groups)."""

    def __init__(self):
        self.b1_cnt = self.b2_cnt = self.b4_cnt = 0
        self.b1 = [0.0] * 3
        self.b2 = [0.0] * 3
        self.b4 = [0.0] * 2


def decode_mantissas(gb: GetBits, bap: np.ndarray, exps: np.ndarray,
                     nbins: int, st: _MantState) -> np.ndarray:
    coef = np.zeros(256, dtype=np.float64)
    for i in range(nbins):
        b = int(bap[i])
        if b == 0:
            v = 0.0          # dither not reconstructed (round-2)
        elif b == 1:
            if st.b1_cnt == 0:
                code = gb.get_bits(5)
                st.b1 = [_sym(code // 9, 3), _sym((code % 9) // 3, 3),
                         _sym(code % 3, 3)]
                st.b1_cnt = 3
            v = st.b1[3 - st.b1_cnt]
            st.b1_cnt -= 1
        elif b == 2:
            if st.b2_cnt == 0:
                code = gb.get_bits(7)
                st.b2 = [_sym(code // 25, 5), _sym((code % 25) // 5, 5),
                         _sym(code % 5, 5)]
                st.b2_cnt = 3
            v = st.b2[3 - st.b2_cnt]
            st.b2_cnt -= 1
        elif b == 3:
            v = _sym(gb.get_bits(3), 7)
        elif b == 4:
            if st.b4_cnt == 0:
                code = gb.get_bits(7)
                st.b4 = [_sym(code // 11, 11), _sym(code % 11, 11)]
                st.b4_cnt = 2
            v = st.b4[2 - st.b4_cnt]
            st.b4_cnt -= 1
        elif b == 5:
            v = _sym(gb.get_bits(4), 15)
        else:
            bits = T.BAP_BITS[b]
            raw = gb.get_sbits(bits)
            v = raw / (1 << (bits - 1))
        coef[i] = v * (2.0 ** (-int(exps[i])))
    return coef


@register_codec
class AC3Decoder(Decoder):
    NAME = "ac3"
    TYPE = MediaType.AUDIO
    LONG_NAME = "ATSC A/52 AC-3 (TPU IMDCT)"

    def _init(self):
        self._overlap = None
        self._warned = set()

    def _flush(self):
        self._overlap = None

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

    def _warn_once(self, key, msg):
        if key not in self._warned:
            log.warning(self, msg)
            self._warned.add(key)

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
        sample_rate = T.SAMPLE_RATES[fscod]

        bsid = gb.get_bits(5)
        if bsid > 8:
            raise AVError(INVALIDDATA, f"unsupported bsid {bsid} (E-AC-3?)")
        gb.get_bits(3)              # bsmod
        acmod = gb.get_bits(3)
        nfchans = T.CHANNELS[acmod]
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

        # per-channel persistent state across blocks; the LFE channel,
        # when present, rides as row nfchans with endmant 7
        nrows = nfchans + (1 if lfeon else 0)
        exps = [np.zeros(256, dtype=np.int32) for _ in range(nrows)]
        endmant = [253] * nfchans + ([7] if lfeon else [])
        bap = [np.zeros(256, dtype=np.int32) for _ in range(nrows)]
        ba_params = dict(sdcycod=2, fdcycod=1, sgaincod=1, dbpbcod=2,
                         floorcod=7)
        snr = [dict(csnroffst=0, fsnroffst=0, fgaincod=4)
               for _ in range(nrows)]
        spectra = np.zeros((6, nrows, 256), dtype=np.float64)

        for blk in range(6):
            blksw = [gb.get_bits(1) for _ in range(nfchans)]
            if any(blksw):
                self._warn_once("blksw", "AC-3 block switching (short "
                                "transforms) not supported — audio will "
                                "be degraded")
            dith = [gb.get_bits(1) for _ in range(nfchans)]
            if gb.get_bits(1):
                gb.get_bits(8)      # dynrng
            if acmod == 0 and gb.get_bits(1):
                gb.get_bits(8)
            if gb.get_bits(1):      # cplstre
                cplinu = gb.get_bits(1)
                if cplinu:
                    raise AVError(INVALIDDATA, "coupling not supported yet")
            if acmod == 2:
                if gb.get_bits(1):  # rematstr
                    for _ in range(4):
                        if gb.get_bits(1):
                            self._warn_once(
                                "remat", "stereo rematrixing not applied")
            chexpstr = [gb.get_bits(2) for _ in range(nfchans)]
            lfeexpstr = gb.get_bits(1) if lfeon else 0
            for ch in range(nfchans):
                if chexpstr[ch] != EXP_REUSE:
                    chbwcod = gb.get_bits(6)
                    endmant[ch] = ((chbwcod + 12) * 3) + 37
                    absexp = gb.get_bits(4)
                    exps[ch][:endmant[ch]] = decode_exponents(
                        gb, chexpstr[ch], absexp, endmant[ch])
                    gb.get_bits(2)  # gainrng
            if lfeon and lfeexpstr:
                absexp = gb.get_bits(4)
                exps[nfchans][:7] = decode_exponents(
                    gb, EXP_D15, absexp, 7)
            if gb.get_bits(1):      # baie
                ba_params = dict(sdcycod=gb.get_bits(2),
                                 fdcycod=gb.get_bits(2),
                                 sgaincod=gb.get_bits(2),
                                 dbpbcod=gb.get_bits(2),
                                 floorcod=gb.get_bits(3))
            if gb.get_bits(1):      # snroffste
                cs = gb.get_bits(6)
                for ch in range(nrows):
                    snr[ch] = dict(csnroffst=cs, fsnroffst=gb.get_bits(4),
                                   fgaincod=gb.get_bits(3))
            if gb.get_bits(1):      # deltbaie
                raise AVError(INVALIDDATA, "delta bit allocation unsupported")
            if gb.get_bits(1):      # skiple
                skipl = gb.get_bits(9)
                gb.skip_bits(skipl * 8)

            # bit allocation + mantissas
            st = _MantState()
            for ch in range(nrows):
                bap[ch][:] = 0
                bap[ch][:endmant[ch]] = bitalloc.run_bit_alloc(
                    exps[ch], 0, endmant[ch], fscod,
                    fgaincod=snr[ch]["fgaincod"],
                    csnroffst=snr[ch]["csnroffst"],
                    fsnroffst=snr[ch]["fsnroffst"], **ba_params)
                spectra[blk, ch] = decode_mantissas(
                    gb, bap[ch], exps[ch], endmant[ch], st)

        pcm = self._imdct_frame(spectra, nrows)
        # AC-3 channel order -> ffmpeg default layout order
        if acmod == 7:
            order = [0, 2, 1] + ([nfchans] if lfeon else []) + [3, 4]
        elif lfeon:
            order = list(range(nfchans)) + [nfchans]
        else:
            order = list(range(nfchans))
        frame = Frame(nb_samples=1536, sample_rate=sample_rate,
                      format="fltp", channels=nrows,
                      channel_layout=default_channel_layout(nrows))
        frame.planes = [pcm[c].astype(np.float32) for c in order]
        return frame, frame_bytes

    # ------------------------------------------------------------------ #

    def _imdct_frame(self, spectra: np.ndarray, nch: int) -> np.ndarray:
        """Batched device IMDCT + window + overlap-add for 6 blocks."""
        from libav_tpu.ops import fftmdct as F
        win = F.kbd_window(512, alpha=5.0)
        # undo the encoder-side 2/N fraction normalization (A/52 §7.9)
        spec = (spectra * 256.0).reshape(6 * nch, 256).astype(np.float32)
        frames = np.asarray(F.imdct(spec)).reshape(6, nch, 512) * win
        # ops/fftmdct's (mdct, imdct*window, OLA) triple is exactly TDAC
        # perfect-reconstruction (tested) — no extra scale needed
        out = np.zeros((nch, 1536), dtype=np.float64)
        if self._overlap is None or self._overlap.shape[0] != nch:
            self._overlap = np.zeros((nch, 256), dtype=np.float64)
        prev = self._overlap
        for blk in range(6):
            cur = frames[blk]                    # (nch, 512)
            out[:, blk * 256:(blk + 1) * 256] = prev + cur[:, :256]
            prev = cur[:, 256:]
        self._overlap = np.asarray(prev)
        return out
