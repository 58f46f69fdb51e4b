"""AVI demuxer + muxer (reference: libavformat/avidec.c / avienc.c)."""

from __future__ import annotations

import struct
from typing import List, Optional

from libav_tpu.avutil.error import AVError, EOF_, INVALIDDATA
from libav_tpu.avutil.frame import Packet, PKT_FLAG_KEY
from libav_tpu.avutil.rational import Rational
from libav_tpu.codecs.api import CodecParameters, MediaType
from libav_tpu.formats.api import (InputFormat, OutputFormat, Stream,
                                   register_input, register_output)

_FOURCC_TO_CODEC = {
    b"MJPG": "mjpeg", b"mjpg": "mjpeg", b"jpeg": "mjpeg",
    b"FMP4": "mpeg4", b"XVID": "mpeg4", b"DIVX": "mpeg4", b"MP4V": "mpeg4",
    b"mp4v": "mpeg4", b"DX50": "mpeg4",
    b"H264": "h264", b"h264": "h264", b"X264": "h264", b"avc1": "h264",
    b"mpg1": "mpeg1video", b"mpg2": "mpeg2video", b"MPEG": "mpeg1video",
    b"MP43": "msmpeg4v3", b"mp43": "msmpeg4v3", b"DIV3": "msmpeg4v3",
    b"MP42": "msmpeg4v2", b"mp42": "msmpeg4v2", b"DIV2": "msmpeg4v2",
    b"WMV1": "wmv1", b"wmv1": "wmv1",
    b"div3": "msmpeg4v3", b"MPG3": "msmpeg4v3", b"DIV4": "msmpeg4v3",
    b"FLV1": "flv1", b"flv1": "flv1",
    b"H263": "h263", b"h263": "h263", b"U263": "h263",
    b"FFV1": "ffv1", b"ffv1": "ffv1",
}
_CODEC_TO_FOURCC = {"mjpeg": b"MJPG", "mpeg4": b"FMP4", "h264": b"H264",
                    "mpeg1video": b"mpg1", "mpeg2video": b"mpg2",
                    "msmpeg4v3": b"MP43", "msmpeg4v2": b"MP42", "wmv1": b"WMV1",
                    "flv1": b"FLV1",
                    "h263": b"H263", "ffv1": b"FFV1",
                    "rawvideo": b"\x00\x00\x00\x00"}
_WFMT_TO_CODEC = {1: "pcm_s16le", 3: "pcm_f32le", 0x2000: "ac3",
                  0xFF: "aac", 0x55: "mp3", 0x50: "mp2"}
_CODEC_TO_WFMT = {"pcm_s16le": 1, "pcm_f32le": 3, "ac3": 0x2000,
                  "aac": 0xFF, "mp3": 0x55, "mp2": 0x50, "mp1": 0x50}


from libav_tpu.formats.api import sniff_key as _sniff_key


@register_input
class AviDemuxer(InputFormat):
    NAME = "avi"
    EXTENSIONS = ("avi",)

    @classmethod
    def probe(cls, data: bytes, url: str = "") -> int:
        if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
            return 95
        return 0

    def read_header(self, pb):
        self.pb = pb
        data = pb.read_all()
        self._data = data
        if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
            raise AVError(INVALIDDATA, "not an AVI")
        self.streams = []
        self._movi = None
        self._pts = []
        pos = 12
        while pos + 8 <= len(data):
            tag = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            if tag == b"LIST":
                ltype = data[pos + 8:pos + 12]
                if ltype == b"hdrl":
                    self._parse_hdrl(data, pos + 12, pos + 8 + size)
                elif ltype == b"movi":
                    self._movi = (pos + 12, pos + 8 + size)
                pos += 8 + size + (size & 1)
            else:
                pos += 8 + size + (size & 1)
        if self._movi is None:
            raise AVError(INVALIDDATA, "no movi list")
        self._cursor = self._movi[0]
        self._pts = [0] * len(self.streams)
        # chunk index for seeking: [(abs_pos, sidx, key)] in file order
        # (reference: avidec.c idx1 parse -> AVIndexEntry); built from the
        # idx1 chunk when present, else by scanning movi with codec-aware
        # keyframe sniffing
        self._index = self._parse_idx1(data) or self._scan_index(data)
        self._keys = {pos: key for pos, _, key in self._index}

    def _parse_idx1(self, data):
        pos = 12
        while pos + 8 <= len(data):
            tag = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            if tag == b"idx1":
                out = []
                body = data[pos + 8:pos + 8 + size]
                base = self._movi[0] - 4        # offset of 'movi' fourcc
                # some writers store absolute file offsets in idx1; the
                # reference (avidec.c guess_ni_flag / check_stream_max_drift
                # area) disambiguates by probing whether the first entry's
                # offset points at its own chunk id — mirror that heuristic
                for off in range(0, len(body) - 15, 16):
                    ckid0, _f0, coff0, _l0 = struct.unpack(
                        "<4sIII", body[off:off + 16])
                    if not ckid0[:2].isdigit():
                        continue
                    if data[coff0:coff0 + 4] == ckid0 and \
                            data[base + coff0:base + coff0 + 4] != ckid0:
                        base = 0
                    break
                for off in range(0, len(body) - 15, 16):
                    ckid, fl, coff, _clen = struct.unpack(
                        "<4sIII", body[off:off + 16])
                    if not ckid[:2].isdigit():
                        continue
                    sidx = int(ckid[:2])
                    if sidx >= len(self.streams):
                        continue
                    out.append((base + coff, sidx, bool(fl & 0x10)))
                return out
            pos += 8 + size + (size & 1)
        return None

    def _scan_index(self, data):
        out = []
        pos, end = self._movi
        while pos + 8 <= end:
            tag = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            if tag == b"LIST":
                pos += 12
                continue
            if tag[:2].isdigit():
                sidx = int(tag[:2])
                if sidx < len(self.streams):
                    payload = data[pos + 8:pos + 8 + min(size, 16)]
                    st = self.streams[sidx]
                    out.append((pos, sidx,
                                _sniff_key(st.codecpar.codec_id, payload)))
            pos += 8 + size + (size & 1)
        return out

    def read_seek(self, stream_index: int, timestamp: int, flags: int = 0):
        """Seek to the last keyframe at/before timestamp (stream
        timebase = frame count; reference: avidec.c avi_read_seek via
        av_index_search_timestamp)."""
        counts = [0] * len(self.streams)
        best = None              # (pos, counts snapshot)
        for pos, sidx, key in self._index:
            if sidx == stream_index:
                if counts[sidx] > timestamp and best is not None:
                    break
                if key and counts[sidx] <= timestamp:
                    best = (pos, list(counts))
            counts[sidx] += 1
        if best is None:
            best = (self._movi[0], [0] * len(self.streams))
        self._cursor, self._pts = best[0], best[1]

    def _parse_hdrl(self, data, s, e):
        pos = s
        while pos + 8 <= e:
            tag = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            if tag == b"LIST" and data[pos + 8:pos + 12] == b"strl":
                self._parse_strl(data, pos + 12, pos + 8 + size)
            pos += 8 + size + (size & 1)

    def _parse_strl(self, data, s, e):
        fcc_type = fcc_handler = b""
        rate = scale = 0
        strf = b""
        pos = s
        while pos + 8 <= e:
            tag = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body = data[pos + 8:pos + 8 + size]
            if tag == b"strh":
                fcc_type = body[0:4]
                fcc_handler = body[4:8]
                scale, rate = struct.unpack("<II", body[20:28])
            elif tag == b"strf":
                strf = body
            pos += 8 + size + (size & 1)

        if fcc_type == b"vids":
            w, h = struct.unpack("<ii", strf[4:12])
            fourcc = strf[16:20]
            codec = _FOURCC_TO_CODEC.get(fourcc) or \
                _FOURCC_TO_CODEC.get(fcc_handler, "rawvideo")
            par = CodecParameters(codec_type=MediaType.VIDEO, codec_id=codec,
                                  width=w, height=abs(h),
                                  pix_fmt="yuv420p")
            tb = Rational(scale or 1, rate or 25)
            st = Stream(index=len(self.streams), codecpar=par, time_base=tb,
                        avg_frame_rate=tb.inv())
            self.streams.append(st)
        elif fcc_type == b"auds":
            wfmt, ch, srate = struct.unpack("<HHI", strf[0:8])
            codec = _WFMT_TO_CODEC.get(wfmt, f"wfmt{wfmt}")
            par = CodecParameters(codec_type=MediaType.AUDIO, codec_id=codec,
                                  sample_rate=srate, channels=ch,
                                  sample_fmt="s16" if wfmt == 1 else "fltp")
            st = Stream(index=len(self.streams), codecpar=par,
                        time_base=Rational(1, srate))
            self.streams.append(st)

    def read_packet(self) -> Packet:
        data = self._data
        end = self._movi[1]
        while self._cursor + 8 <= end:
            tag = data[self._cursor:self._cursor + 4]
            size = struct.unpack("<I",
                                 data[self._cursor + 4:self._cursor + 8])[0]
            body_at = self._cursor + 8
            self._cursor = body_at + size + (size & 1)
            if tag[:2].isdigit():
                sidx = int(tag[:2])
                kind = tag[2:4]
                if sidx < len(self.streams) and kind in (b"dc", b"db", b"wb"):
                    key = self._keys.get(body_at - 8, True)
                    pkt = Packet(data=data[body_at:body_at + size],
                                 pts=self._pts[sidx], dts=self._pts[sidx],
                                 duration=1, stream_index=sidx,
                                 flags=PKT_FLAG_KEY if key else 0)
                    self._pts[sidx] += 1
                    return pkt
            elif tag == b"LIST":
                self._cursor = body_at + 4   # descend into rec lists
        raise AVError(EOF_)


@register_output
class AviMuxer(OutputFormat):
    NAME = "avi"
    EXTENSIONS = ("avi",)
    VIDEO_CODEC = "mpeg4"
    AUDIO_CODEC = "pcm_s16le"

    def write_header(self, pb):
        self.pb = pb
        self._chunks: List[bytes] = []
        self._counts = [0] * len(self.streams)
        self._idx1: List[tuple] = []    # (tag, flags, offset, size)
        self._movi_off = 4              # after the 'movi' fourcc

    def write_packet(self, pkt: Packet):
        si = pkt.stream_index
        st = self.streams[si]
        kind = b"dc" if st.codecpar.codec_type == MediaType.VIDEO else b"wb"
        tag = b"%02d" % si + kind
        body = pkt.data
        chunk = tag + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunk += b"\x00"
        self._idx1.append((tag, 0x10 if pkt.is_key else 0,
                           self._movi_off, len(body)))
        self._movi_off += len(chunk)
        self._chunks.append(chunk)
        self._counts[si] += 1

    def write_trailer(self):
        pb = self.pb
        strls = b""
        for si, st in enumerate(self.streams):
            par = st.codecpar
            if par.codec_type == MediaType.VIDEO:
                fr = st.avg_frame_rate or st.time_base.inv()
                strh = (b"vids" + _CODEC_TO_FOURCC.get(par.codec_id, b"    ")
                        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
                                      fr.den, fr.num, 0,
                                      self._counts[si], 0, 0, 0, 0)
                        + struct.pack("<4H", 0, 0, par.width, par.height))
                strf = struct.pack("<IiiHH4sIiiII", 40, par.width,
                                   par.height, 1, 24,
                                   _CODEC_TO_FOURCC.get(par.codec_id, b"    "),
                                   par.width * par.height * 3, 0, 0, 0, 0)
            else:
                strh = (b"auds" + b"\x00" * 4
                        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
                                      1, par.sample_rate, 0,
                                      self._counts[si], 0, 0, 0, 0)
                        + struct.pack("<4H", 0, 0, 0, 0))
                wfmt = _CODEC_TO_WFMT.get(par.codec_id, 1)
                ba = par.channels * 2
                strf = struct.pack("<HHIIHH", wfmt, par.channels,
                                   par.sample_rate, par.sample_rate * ba,
                                   ba, 16)
            strl = (b"strh" + struct.pack("<I", len(strh)) + strh +
                    b"strf" + struct.pack("<I", len(strf)) + strf)
            strls += (b"LIST" + struct.pack("<I", len(strl) + 4) +
                      b"strl" + strl)

        vpar = next((s.codecpar for s in self.streams
                     if s.codecpar.codec_type == MediaType.VIDEO), None)
        vst = next((s for s in self.streams
                    if s.codecpar.codec_type == MediaType.VIDEO), None)
        us_per_frame = 40000
        if vst is not None and vst.avg_frame_rate:
            us_per_frame = int(1000000 / float(vst.avg_frame_rate))
        avih = struct.pack("<14I", us_per_frame, 0, 0, 0x10,
                           max(self._counts) if self._counts else 0, 0,
                           len(self.streams), 0,
                           vpar.width if vpar else 0,
                           vpar.height if vpar else 0, 0, 0, 0, 0)
        hdrl = (b"avih" + struct.pack("<I", len(avih)) + avih + strls)
        hdrl_list = b"LIST" + struct.pack("<I", len(hdrl) + 4) + b"hdrl" + hdrl

        movi_body = b"".join(self._chunks)
        movi = b"LIST" + struct.pack("<I", len(movi_body) + 4) + b"movi" + \
            movi_body
        idx_body = b"".join(struct.pack("<4sIII", t, fl, off, sz)
                            for t, fl, off, sz in self._idx1)
        idx1 = b"idx1" + struct.pack("<I", len(idx_body)) + idx_body
        riff_body = b"AVI " + hdrl_list + movi + idx1
        pb.write(b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body)
