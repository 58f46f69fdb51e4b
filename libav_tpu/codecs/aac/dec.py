"""AAC-LC decoder (reference: aacdec.c aac_decode_frame :2967 ->
decode_ics :1861 -> imdct_and_windowing :2409)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from libav_tpu.avutil import log
from libav_tpu.avutil.error import AVError, INVALIDDATA
from libav_tpu.avutil.frame import Frame, Packet
from libav_tpu.avutil.samplefmt import default_channel_layout
from libav_tpu.bitstream import GetBits
from libav_tpu.codecs.api import Decoder, MediaType, register_codec
from libav_tpu.codecs.aac import tables as T

# syntax element ids
SCE, CPE, CCE, LFE, DSE, PCE, FIL, END = range(8)

ONLY_LONG, LONG_START, EIGHT_SHORT, LONG_STOP = range(4)
SF_OFFSET = 100


def parse_adts_header(data: bytes):
    """Returns (sample_rate, channels, frame_len, header_len) or None."""
    if len(data) < 7 or data[0] != 0xFF or (data[1] & 0xF0) != 0xF0:
        return None
    gb = GetBits(data)
    gb.skip_bits(12)
    gb.get_bits(1)           # id
    gb.get_bits(2)           # layer
    protection_absent = gb.get_bits(1)
    gb.get_bits(2)           # profile
    sr_index = gb.get_bits(4)
    gb.get_bits(1)           # private
    ch_config = gb.get_bits(3)
    gb.get_bits(4)           # orig/home/copyright x2
    frame_len = gb.get_bits(13)
    gb.get_bits(11)          # buffer fullness
    gb.get_bits(2)           # num raw blocks - 1
    hdr = 7 if protection_absent else 9
    if sr_index >= len(T.SAMPLE_RATES):
        return None
    return (T.SAMPLE_RATES[sr_index], ch_config, frame_len, hdr)


def decode_ics(gb: GetBits, sample_rate: int):
    """One individual_channel_stream -> (spec coefficients (1024,) float)."""
    global_gain = gb.get_bits(8)

    # ics_info
    gb.get_bits(1)           # ics_reserved
    window_sequence = gb.get_bits(2)
    gb.get_bits(1)           # window_shape (dec: both OK, we mirror enc)
    if window_sequence == EIGHT_SHORT:
        raise AVError(INVALIDDATA, "short windows not supported yet")
    max_sfb = gb.get_bits(6)
    if gb.get_bits(1):       # predictor_data_present
        raise AVError(INVALIDDATA, "main-profile prediction unsupported")

    offsets = T.swb_offsets_long(sample_rate)
    if max_sfb > len(offsets) - 1:
        raise AVError(INVALIDDATA, "max_sfb too large")

    # section_data
    band_cb = np.zeros(max_sfb, dtype=np.int32)
    k = 0
    while k < max_sfb:
        cb = gb.get_bits(4)
        sect_len = 0
        while True:
            incr = gb.get_bits(5)
            sect_len += incr
            if incr != 31:
                break
        if k + sect_len > max_sfb:
            raise AVError(INVALIDDATA, "section overflow")
        band_cb[k:k + sect_len] = cb
        k += sect_len

    # scale_factor_data
    sf = np.zeros(max_sfb, dtype=np.int32)
    sf_vlc = T.scalefactor_vlc()
    cur = global_gain
    for g in range(max_sfb):
        cb = band_cb[g]
        if cb == T.ZERO_HCB:
            continue
        if cb in (T.NOISE_HCB, T.INTENSITY_HCB, T.INTENSITY_HCB2):
            raise AVError(INVALIDDATA, "PNS/IS not supported yet")
        cur += sf_vlc.read(gb) - 60
        sf[g] = cur

    # pulse / tns / gain control
    if gb.get_bits(1):
        raise AVError(INVALIDDATA, "pulse data not supported")
    if gb.get_bits(1):
        raise AVError(INVALIDDATA, "TNS not supported yet")
    if gb.get_bits(1):
        raise AVError(INVALIDDATA, "gain control not supported")

    # spectral_data
    quant = np.zeros(1024, dtype=np.int32)
    for g in range(max_sfb):
        cb = int(band_cb[g])
        if cb == T.ZERO_HCB:
            continue
        vlc = T.spectral_vlc(cb)
        unpack = T.unpack_index(cb)
        dim, signed, maxa = T.CB_INFO[cb]
        start, end = int(offsets[g]), int(offsets[g + 1])
        k = start
        while k < end:
            idx = vlc.read(gb)
            vals = list(unpack(idx))
            if not signed:
                for i, v in enumerate(vals):
                    if v != 0 and gb.get_bits(1):
                        vals[i] = -v
            if cb == T.ESC_HCB:
                for i, v in enumerate(vals):
                    if abs(v) == 16:
                        n = 4
                        while gb.get_bits(1):
                            n += 1
                        esc = gb.get_bits(n)
                        mag = (1 << n) + esc
                        vals[i] = mag if v > 0 else -mag
            quant[k:k + dim] = vals
            k += dim

    # inverse quantization: x = sign(q)*|q|^(4/3) * 2^(0.25*(sf-offset))
    spec = np.zeros(1024, dtype=np.float64)
    q = quant.astype(np.float64)
    mag = np.abs(q) ** (4.0 / 3.0)
    gains = np.zeros(1024)
    for g in range(max_sfb):
        if band_cb[g] != T.ZERO_HCB:
            gains[offsets[g]:offsets[g + 1]] = \
                2.0 ** (0.25 * (sf[g] - SF_OFFSET))
    spec = np.sign(q) * mag * gains
    return spec


@register_codec
class AACDecoder(Decoder):
    NAME = "aac"
    TYPE = MediaType.AUDIO
    LONG_NAME = "AAC-LC (TPU IMDCT)"

    def _init(self):
        self._overlap = None

    def _flush(self):
        self._overlap = None

    def _decode(self, pkt: Packet) -> List[Frame]:
        data = pkt.data
        hdr = parse_adts_header(data)
        if hdr is not None:
            sample_rate, ch_config, frame_len, hlen = hdr
            body = data[hlen:frame_len]
        else:
            sample_rate = self.sample_rate or 44100
            body = data
        gb = GetBits(body)
        specs = []
        while True:
            ele = gb.get_bits(3)
            if ele == END:
                break
            tag_bits = gb.get_bits(4)  # element_instance_tag
            if ele == SCE:
                specs.append(decode_ics(gb, sample_rate))
            elif ele == CPE:
                common = gb.get_bits(1)
                if common:
                    raise AVError(INVALIDDATA, "common_window CPE "
                                               "not supported yet")
                specs.append(decode_ics(gb, sample_rate))
                specs.append(decode_ics(gb, sample_rate))
            elif ele == FIL:
                cnt = tag_bits
                if cnt == 15:
                    cnt += gb.get_bits(8) - 1
                gb.skip_bits(8 * cnt)
            elif ele == DSE:
                gb.get_bits(1)
                cnt = gb.get_bits(8)
                if cnt == 255:
                    cnt += gb.get_bits(8)
                gb.skip_bits(8 * cnt)
            else:
                raise AVError(INVALIDDATA, f"element {ele} not supported")
            if gb.bits_left() < 3:
                break
        if not specs:
            return []
        pcm = self._imdct(np.stack(specs))
        nch = len(specs)
        f = Frame(nb_samples=1024, sample_rate=sample_rate, format="fltp",
                  channels=nch, channel_layout=default_channel_layout(nch))
        f.planes = [pcm[c].astype(np.float32) for c in range(nch)]
        f.pts = pkt.pts
        f.time_base = pkt.time_base
        return [f]

    def _imdct(self, specs: np.ndarray) -> np.ndarray:
        from libav_tpu.ops import fftmdct as F
        nch = specs.shape[0]
        win = F.sine_window(2048)
        # undo the encoder-side 2/N fraction normalization
        frames = np.asarray(F.imdct((specs * 1024.0).astype(np.float32))) * win
        if self._overlap is None or self._overlap.shape[0] != nch:
            self._overlap = np.zeros((nch, 1024), dtype=np.float64)
        out = self._overlap + frames[:, :1024]
        self._overlap = np.asarray(frames[:, 1024:], dtype=np.float64)
        return out
