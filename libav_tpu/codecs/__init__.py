"""Codec engine (reference: libavcodec/ — SURVEY.md §2.2).

The send/receive API, codec registry, parsers and bitstream filters live
here; per-codec packages (mjpeg/, mpeg12/, mpeg4/, h264/, aac/, ac3/) each
split into a host side (entropy decode -> coefficient/MV/mode tensors) and
a device side (jitted reconstruction pipelines built from libav_tpu.ops).
"""

from libav_tpu.codecs.api import (CodecContext, Decoder, Encoder,
                                  CodecParameters, find_decoder, find_encoder,
                                  register_codec)

# import for registration side effects
from libav_tpu.codecs import (mjpeg, mpeg12, mpeg4, h264, ac3,  # noqa: F401
                              aac, mpegaudio, rawvideo,  # noqa: F401
                              flac, h263dec, msmpeg4dec, ffv1,  # noqa: F401
                              prores)  # noqa: F401
