"""avprobe-semantics inspector (reference: avtools/avprobe.c:
-show_format / -show_streams / -show_packets / -show_frames output
sections)."""

from __future__ import annotations

import sys
from typing import List, Optional

from libav_tpu.avutil.error import AVError
from libav_tpu.avutil.rational import NOPTS_VALUE
from libav_tpu.codecs.api import MediaType
from libav_tpu.formats import FormatContext


def _fmt_ts(v, tb):
    if v == NOPTS_VALUE:
        return "N/A"
    return f"{v * tb.num / tb.den:.6f}"


_PICT = {0: "?", 1: "I", 2: "P", 3: "B", 4: "S", 5: "i", 6: "p", 7: "b"}


def _show_frames(ic, out):
    """Decode every packet and print per-frame fields (reference:
    avtools/avprobe.c show_frame / read_packets decode loop)."""
    from libav_tpu.codecs import find_decoder

    decs = {}
    for st in ic.streams:
        try:
            decs[st.index] = find_decoder(st.codecpar.codec_id)(
                st.codecpar).open()
        except Exception:
            pass

    def emit(frame, st):
        out.write("[frames.frame]\n")
        out.write(f"stream_index={st.index}\n")
        if frame.is_video:
            out.write("media_type=video\n")
            out.write(f"key_frame={1 if frame.key_frame else 0}\n")
            out.write(f"pkt_pts={frame.pts}\n")
            out.write(f"pkt_pts_time={_fmt_ts(frame.pts, st.time_base)}\n")
            out.write(f"width={frame.width}\nheight={frame.height}\n")
            out.write(f"pix_fmt={frame.format}\n")
            out.write(f"pict_type={_PICT.get(frame.pict_type, '?')}\n")
            out.write(
                f"interlaced_frame={1 if frame.interlaced_frame else 0}\n")
            out.write(
                f"top_field_first={1 if frame.top_field_first else 0}\n")
        else:
            out.write("media_type=audio\n")
            out.write(f"key_frame=1\n")
            out.write(f"pkt_pts={frame.pts}\n")
            out.write(f"pkt_pts_time={_fmt_ts(frame.pts, st.time_base)}\n")
            out.write(f"sample_fmt={frame.format}\n")
            out.write(f"nb_samples={frame.nb_samples}\n")
            out.write(f"channels={frame.channels}\n")

    for pkt in ic.packets():
        dec = decs.get(pkt.stream_index)
        if dec is None:
            continue
        st = ic.streams[pkt.stream_index]
        try:
            dec.send_packet(pkt)
            for f in dec._pump():
                emit(f, st)
        except AVError:
            continue
    for idx, dec in decs.items():
        try:
            dec.send_packet(None)
            for f in dec._pump(drain=True):
                emit(f, ic.streams[idx])
        except AVError:
            pass


def probe(url: str, show_format=True, show_streams=True, show_packets=False,
          fmt_name: Optional[str] = None, out=None,
          show_frames=False) -> int:
    out = out if out is not None else sys.stdout
    ic = FormatContext.open_input(url, fmt_name)
    # complete missing codec parameters by bounded trial decode
    # (reference: utils.c:2200 avformat_find_stream_info)
    try:
        ic.find_stream_info()
    except Exception:
        pass

    if show_frames:
        _show_frames(ic, out)
        ic.close()
        ic = FormatContext.open_input(url, fmt_name)

    if show_packets:
        out.write("[packets]\n")
        for pkt in ic.packets():
            st = ic.streams[pkt.stream_index]
            out.write(f"stream={pkt.stream_index} dts={pkt.dts} "
                      f"pts={pkt.pts} duration={pkt.duration} "
                      f"size={pkt.size} flags={'K' if pkt.is_key else '_'}\n")

    if show_streams:
        for st in ic.streams:
            p = st.codecpar
            out.write("[streams.stream]\n")
            out.write(f"index={st.index}\n")
            out.write(f"codec_type={p.codec_type}\n")
            out.write(f"codec_name={p.codec_id}\n")
            if p.codec_type == MediaType.VIDEO:
                out.write(f"width={p.width}\nheight={p.height}\n")
                out.write(f"pix_fmt={p.pix_fmt}\n")
                if st.avg_frame_rate:
                    out.write(f"avg_frame_rate={st.avg_frame_rate.num}"
                              f"/{st.avg_frame_rate.den}\n")
            elif p.codec_type == MediaType.AUDIO:
                out.write(f"sample_rate={p.sample_rate}\n")
                out.write(f"channels={p.channels}\n")
                out.write(f"sample_fmt={p.sample_fmt}\n")
            out.write(f"time_base={st.time_base.num}/{st.time_base.den}\n")

    if show_format:
        out.write("[format]\n")
        out.write(f"filename={url}\n")
        out.write(f"format_name={ic.iformat.NAME.split(',')[0]}\n")
        out.write(f"nb_streams={len(ic.streams)}\n")
    ic.close()
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    show_format = show_streams = True
    show_packets = show_frames = False
    fmt_name = None
    url = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-show_packets":
            show_packets = True
        elif a == "-show_frames":
            show_frames = True
        elif a == "-show_format":
            show_format = True
        elif a == "-show_streams":
            show_streams = True
        elif a == "-f":
            i += 1
            fmt_name = argv[i]
        elif not a.startswith("-"):
            url = a
        i += 1
    if url is None:
        sys.stderr.write("usage: avprobe [-show_packets] [-show_frames] "
                         "[-f fmt] input\n")
        return 1
    try:
        return probe(url, show_format, show_streams, show_packets, fmt_name,
                     show_frames=show_frames)
    except AVError as e:
        sys.stderr.write(f"avprobe: {e}\n")
        return 1


if __name__ == "__main__":
    sys.exit(main())
