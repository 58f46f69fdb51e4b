"""H.264/AVC codec (reference: libavcodec/h264dec.c + 20 support files,
~21K LoC — SURVEY.md §3.2; north-star config 4).

The architecture IS the hwaccel split the reference defines
(avcodec.h:3062-3086): host does NAL/SPS/PPS/slice-header parsing and
CAVLC entropy decode into whole-frame tensors; the device runs intra
prediction (wavefront-scanned), quarter-pel MC, 4x4 transforms and
deblocking as batched kernels (libav_tpu/ops/h264*).

Round-1 coverage: constrained-baseline-style subset — I slices with
I_16x16 macroblocks, P slices with P_16x16/P_Skip, CAVLC, one reference
frame; the matching encoder emits exactly this subset for round-trip
validation. CABAC, I_4x4/I_8x8, B slices, MBAFF, multi-ref follow.
"""

from libav_tpu.codecs.h264.dec import H264Decoder
from libav_tpu.codecs.h264.enc import H264Encoder
