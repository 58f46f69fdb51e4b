"""avplay-semantics player (reference: avtools/avplay.c:50-94 — SDL1
demux/decode/refresh thread design).

No display server exists in this environment, so the default output is a
terminal renderer (half-block cells over 24-bit ANSI color) with realtime
pacing and the same A/V-sync clock structure avplay uses; `-vo null`
decodes with pacing only (benchmark-style playback).
"""

from __future__ import annotations

import sys
import time
from typing import Optional

import numpy as np

from libav_tpu.avutil.error import AVError
from libav_tpu.avutil.rational import NOPTS_VALUE
from libav_tpu.codecs import find_decoder
from libav_tpu.codecs.api import MediaType
from libav_tpu.formats import FormatContext


def _term_render(frame, cols=96):
    """Render a frame as ANSI half-blocks (2 pixels per cell)."""
    from libav_tpu.swscale import SwsContext
    w = cols
    h = max(2, int(frame.height * w / max(frame.width, 1) / 2) * 2)
    sws = SwsContext.get(frame.width, frame.height, frame.format,
                         w, h, frame.format)
    small = sws.scale_frame(frame.to_host())
    rgbc = SwsContext.get(w, h, small.format, w, h, "rgb24")
    rgb = np.asarray(rgbc.scale_frame(small).planes[0]).reshape(h, w, 3)
    lines = []
    for y in range(0, h - 1, 2):
        row = []
        for x in range(w):
            t = rgb[y, x]
            b = rgb[y + 1, x]
            row.append(f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m"
                       f"\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀")
        lines.append("".join(row) + "\x1b[0m")
    sys.stdout.write("\x1b[H" + "\n".join(lines) + "\n")
    sys.stdout.flush()


def play(url: str, vo: str = "term", max_frames: Optional[int] = None) -> int:
    ic = FormatContext.open_input(url)
    vst = next((s for s in ic.streams
                if s.codecpar.codec_type == MediaType.VIDEO), None)
    if vst is None:
        sys.stderr.write("avplay: no video stream\n")
        return 1
    dec = find_decoder(vst.codecpar.codec_id)(vst.codecpar).open()
    fr = vst.avg_frame_rate
    frame_dur = float(fr.inv()) if fr else 0.04

    if vo == "term":
        sys.stdout.write("\x1b[2J")
    t0 = time.perf_counter()
    shown = 0
    for pkt in ic.packets():
        if pkt.stream_index != vst.index:
            continue
        dec.send_packet(pkt)
        while True:
            try:
                frame = dec.receive_frame()
            except AVError:
                break
            # master clock: video pts vs wall clock (avplay's video-clock
            # mode; no audio device here)
            due = t0 + shown * frame_dur
            delay = due - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            if vo == "term":
                _term_render(frame)
            shown += 1
            if max_frames and shown >= max_frames:
                return 0
    return 0


def main(argv: Optional[list] = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    vo = "term"
    url = None
    max_frames = None
    i = 0
    while i < len(argv):
        if argv[i] == "-vo":
            i += 1
            vo = argv[i]
        elif argv[i] == "-frames":
            i += 1
            max_frames = int(argv[i])
        elif not argv[i].startswith("-"):
            url = argv[i]
        i += 1
    if url is None:
        sys.stderr.write("usage: avplay [-vo term|null] [-frames N] input\n")
        return 1
    try:
        return play(url, vo, max_frames)
    except AVError as e:
        sys.stderr.write(f"avplay: {e}\n")
        return 1


if __name__ == "__main__":
    sys.exit(main())
