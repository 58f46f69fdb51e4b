"""AAC-LC codec (reference: libavcodec/aacdec.c (3359) — SURVEY.md §3.4;
the second half of north-star config 5).

Host: ADTS/raw-data-block parse, section/scalefactor/spectral Huffman
decode (serial); device: batched inverse quantization (|q|^(4/3) power on
VPU), IMDCT-1024 on MXU, windowed overlap-add.

Round-1 subset: LC profile, long windows (ONLY_LONG_SEQUENCE), SCE/CPE
with per-channel ICS, sine or KBD windows, no TNS/PNS/IS/M-S/SBR/PS
(parsed errors where applicable). The encoder emits this subset.
"""

from libav_tpu.codecs.aac.dec import AACDecoder
from libav_tpu.codecs.aac.enc import AACEncoder
