"""Core utilities layer (reference: libavutil/).

Bottom layer of the framework: everything else depends on it, it depends on
nothing but numpy/jax. Mirrors libavutil's roles (SURVEY.md §2.1) with
Python-idiomatic equivalents:

  - error.py     <- error.h (AVERROR codes as an exception + errno space)
  - rational.py  <- rational.h / mathematics.h (exact timestamp math)
  - pixfmt.py    <- pixfmt.h / pixdesc.h (pixel format descriptor table)
  - samplefmt.py <- samplefmt.h / channel_layout.h
  - frame.py     <- frame.h (AVFrame) and packet (avcodec.h AVPacket)
  - opt.py       <- opt.h (AVOption introspectable option tables)
  - log.py       <- log.h (leveled per-object logging)
  - crc.py       <- adler32.c / md5 (FATE framecrc/framemd5 oracles)
  - eval.py      <- eval.c (expression parser; rate-control rc_eq)
  - hwdevice.py  <- hwcontext.h (host<->HBM residency for jax arrays)
  - imgutils.py  <- imgutils.c (plane size/copy/fill helpers)
"""

from libav_tpu.avutil.error import AVError, EAGAIN, EOF_, EINVAL, ENOMEM
from libav_tpu.avutil.rational import Rational, rescale_q
from libav_tpu.avutil.pixfmt import PixelFormat, pixdesc
from libav_tpu.avutil.samplefmt import SampleFormat
from libav_tpu.avutil.frame import Frame, Packet
