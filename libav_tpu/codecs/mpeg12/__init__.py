"""MPEG-1/2 video codec (reference: libavcodec/mpeg12dec.c (2639) decode,
mpeg12enc.c encode, shared mpegvideo framework — SURVEY.md §2.2/§3).

Decode split: host parses start codes + per-slice entropy (MB address/type
VLCs, motion codes, DCT run-level VLCs) into whole-frame tensors
(coeffs (nmb, 6, 64), mv/mode arrays); device runs dequant -> IDCT ->
half-pel MC -> add -> clamp as one jitted program per frame geometry.
"""

from libav_tpu.codecs.mpeg12.dec import MPEG1Decoder, MPEG2Decoder
from libav_tpu.codecs.mpeg12.enc import MPEG1Encoder
