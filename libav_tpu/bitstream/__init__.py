"""Host bitstream kit (reference: libavcodec/get_bits.h, put_bits.h,
bitstream.c VLC tables, golomb.h, cabac.c).

This is the serial part of every codec — it stays on the host by design
(SURVEY.md §3.2: entropy decode is bit-serial with per-symbol state).
Header-rate parsing uses the Python classes here; frame-rate entropy loops
(MJPEG/MPEG scan decode, H.264 CAVLC/CABAC) live in libav_tpu/native as C
compiled via cffi, emitting whole-frame coefficient/MV/mode tensors that the
TPU kernels consume.
"""

from libav_tpu.bitstream.getbits import GetBits
from libav_tpu.bitstream.putbits import PutBits
from libav_tpu.bitstream.vlc import VLC
