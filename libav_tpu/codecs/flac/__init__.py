from libav_tpu.codecs.flac.dec import FLACDecoder     # noqa: F401
from libav_tpu.codecs.flac.enc import FLACEncoder     # noqa: F401
