"""MJPEG / baseline JPEG codec (reference: libavcodec/mjpegdec.c (1759),
mjpegenc.c, jpegtables.c).

Decode split (SURVEY.md §7 step 3):
  host:   marker parse -> Huffman scan decode -> (blocks, 64) coefficient
          tensors per component in raster block order
  device: dequant -> dezigzag -> exact int 8x8 IDCT -> clamp -> plane
          reshape, one jitted call per frame batch
"""

from libav_tpu.codecs.mjpeg.dec import MJPEGDecoder
from libav_tpu.codecs.mjpeg.enc import MJPEGEncoder
