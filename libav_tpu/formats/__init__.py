"""Container & I/O layer (reference: libavformat/ — SURVEY.md §2.3).

  io.py        <- avio.h / aviobuf.c / url.h (byte I/O + protocols)
  api.py       <- avformat.h (FormatContext open/read/seek/write)
  registry.py  <- allformats.c
  per-format modules: image2, rawvideo, yuv4mpeg, framecrc/framemd5 (FATE
  oracles), wav, mov/mp4, avi, mpegts, matroska...
"""

from libav_tpu.formats.api import (FormatContext, InputFormat, OutputFormat,
                                   Stream, open_input, guess_format)

# registration side effects
from libav_tpu.formats import (image2, rawvideo, yuv4mpeg, framecrc,  # noqa: F401
                               wav, mpegvideo_raw, m4v, h264raw, ac3raw,  # noqa: F401
                               aacraw, mov, avi, mpegts,  # noqa: F401
                               matroska, pcmraw, hls, rtp,  # noqa: F401
                               mp3raw, flacfmt, h263raw, flv)  # noqa: F401
from libav_tpu import devices  # noqa: F401,E402  (libavdevice analogue)
