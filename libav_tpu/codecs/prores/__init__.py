"""Apple ProRes intra codec (reference: libavcodec/proresdec.c,
proresenc.c, proresdata.c).  Imported for codec-registration side
effects."""

from libav_tpu.codecs.prores import dec, enc  # noqa: F401
