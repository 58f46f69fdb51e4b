"""MPEG-4 part 2 (ASP) video codec (reference: libavcodec/mpeg4videoenc.c
(1381) + mpeg4videodec.c (2642) on the shared mpegvideo framework —
SURVEY.md §2.2/§3.3; this is north-star config 3).

Same split as mpeg12: device ME/pred/FDCT/quant + decoder-identical recon
(codecs/mpegvideo.py 'h263' quant kind); host VOL/VOP header and MB-layer
VLC coding (MCBPC/CBPY/3D run-level tables, gradient DC prediction).
"""

from libav_tpu.codecs.mpeg4.enc import MPEG4Encoder
from libav_tpu.codecs.mpeg4.dec import MPEG4Decoder
