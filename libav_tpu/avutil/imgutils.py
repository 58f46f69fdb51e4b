"""Image plane helpers (reference: libavutil/imgutils.c av_image_copy,
av_image_get_buffer_size, av_image_fill_arrays)."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from libav_tpu.avutil.frame import Frame
from libav_tpu.avutil.pixfmt import pixdesc, plane_dims


def image_get_buffer_size(fmt: str, width: int, height: int) -> int:
    """reference: imgutils.c av_image_get_buffer_size (align=1)"""
    d = pixdesc(fmt)
    total = 0
    for i, (w, h) in enumerate(plane_dims(fmt, width, height)):
        step = d.comp[0].step if d.nb_planes == 1 and d.nb_components > 1 else 1
        if max(c.depth for c in d.comp) > 8:
            step = max(step, 2)
        if fmt in ("nv12", "nv21") and i == 1:
            step = 2
        total += w * h * step
    return total


def frame_to_bytes(frame: Frame) -> bytes:
    """Serialize planes in plane order, row-major, no padding — the layout
    rawvideo and framecrc consume (reference: avpicture/imgutils copy)."""
    out = bytearray()
    for p in frame.planes:
        out += np.ascontiguousarray(np.asarray(p)).tobytes()
    return bytes(out)


def bytes_to_frame(data: bytes, fmt: str, width: int, height: int) -> Frame:
    """Inverse of frame_to_bytes (reference: av_image_fill_arrays)."""
    f = Frame.alloc_video(width, height, fmt)
    off = 0
    planes = []
    for p in f.planes:
        n = p.size * p.itemsize
        arr = np.frombuffer(data[off:off + n], dtype=p.dtype).reshape(p.shape)
        planes.append(arr.copy())
        off += n
    f.planes = planes
    return f
