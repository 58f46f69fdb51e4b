"""avprobe-semantics inspector (reference: avtools/avprobe.c:
-show_format / -show_streams / -show_packets output sections)."""

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


def probe(url: str, show_format=True, show_streams=True, show_packets=False,
          fmt_name: Optional[str] = None, out=None) -> int:
    out = out if out is not None else sys.stdout
    ic = FormatContext.open_input(url, fmt_name)
    # complete missing codec parameters by bounded trial decode
    # (reference: utils.c:2200 avformat_find_stream_info)
    try:
        ic.find_stream_info()
    except Exception:
        pass

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
    show_packets = False
    fmt_name = None
    url = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-show_packets":
            show_packets = True
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
        sys.stderr.write("usage: avprobe [-show_packets] [-f fmt] input\n")
        return 1
    try:
        return probe(url, show_format, show_streams, show_packets, fmt_name)
    except AVError as e:
        sys.stderr.write(f"avprobe: {e}\n")
        return 1


if __name__ == "__main__":
    sys.exit(main())
