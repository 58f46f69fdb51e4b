"""Video filters (reference: libavfilter/vf_*.c — scale wraps swscale
vf_scale.c:240,291; crop, pad, transpose, hflip/vflip, fps, format,
yadif)."""

from __future__ import annotations

from typing import List

import numpy as np

from libav_tpu.avutil.error import AVError, EINVAL
from libav_tpu.avutil.frame import Frame
from libav_tpu.avutil.opt import Option
from libav_tpu.avutil.pixfmt import chroma_sub, plane_dims
from libav_tpu.avutil.rational import NOPTS_VALUE, Rational
from libav_tpu.filters.graph import Filter, register_filter


@register_filter
class NullFilter(Filter):
    """reference: vf_null.c"""
    NAME = "null"


@register_filter
class FormatFilter(Filter):
    """reference: vf_format.c — pixel format conversion."""
    NAME = "format"
    OPTIONS = [Option("pix_fmt", "target pixel format", "string", "yuv420p")]

    def filter_frame(self, frame: Frame) -> List[Frame]:
        if frame.format == self.pix_fmt:
            return [frame]
        from libav_tpu.swscale import SwsContext
        sws = SwsContext.get(frame.width, frame.height, frame.format,
                             frame.width, frame.height, self.pix_fmt)
        return [sws.scale_frame(frame)]


@register_filter
class ScaleFilter(Filter):
    """reference: vf_scale.c (wraps the swscale context)."""
    NAME = "scale"
    OPTIONS = [
        Option("w", "output width (0=keep, -1=keep aspect)", "int", 0, -16, 1 << 14),
        Option("h", "output height", "int", 0, -16, 1 << 14),
        Option("flags", "scaler flags", "string", "bicubic"),
    ]

    def filter_frame(self, frame: Frame) -> List[Frame]:
        w, h = self.w, self.h
        if w <= 0 and h <= 0:
            return [frame]
        if w <= 0:
            w = frame.width * h // frame.height
        if h <= 0:
            h = frame.height * w // frame.width
        if (w, h) == (frame.width, frame.height):
            return [frame]
        from libav_tpu import swscale as S
        flags = {"bilinear": S.BILINEAR, "bicubic": S.BICUBIC,
                 "neighbor": S.POINT, "lanczos": S.LANCZOS,
                 "area": S.AREA}.get(self.flags, S.BICUBIC)
        sws = S.SwsContext.get(frame.width, frame.height, frame.format,
                               w, h, frame.format, flags)
        return [sws.scale_frame(frame)]


@register_filter
class CropFilter(Filter):
    """reference: vf_crop.c"""
    NAME = "crop"
    OPTIONS = [
        Option("w", "crop width", "int", 0, 0, 1 << 14),
        Option("h", "crop height", "int", 0, 0, 1 << 14),
        Option("x", "left offset (-1 = center)", "int", -1, -1, 1 << 14),
        Option("y", "top offset (-1 = center)", "int", -1, -1, 1 << 14),
    ]

    def filter_frame(self, frame: Frame) -> List[Frame]:
        w = self.w or frame.width
        h = self.h or frame.height
        x = (frame.width - w) // 2 if self.x < 0 else self.x
        y = (frame.height - h) // 2 if self.y < 0 else self.y
        lw, lh = chroma_sub(frame.format)
        # keep chroma alignment
        x &= ~((1 << lw) - 1)
        y &= ~((1 << lh) - 1)
        out = frame.clone_props()
        out.width, out.height = w, h
        planes = []
        for i, p in enumerate(frame.planes):
            if i in (1, 2):
                planes.append(p[y >> lh:(y + h) >> lh, x >> lw:(x + w) >> lw])
            else:
                planes.append(p[y:y + h, x:x + w])
        out.planes = planes
        return [out]


@register_filter
class PadFilter(Filter):
    """reference: vf_pad.c"""
    NAME = "pad"
    OPTIONS = [
        Option("w", "padded width", "int", 0, 0, 1 << 14),
        Option("h", "padded height", "int", 0, 0, 1 << 14),
        Option("x", "left offset", "int", 0, 0, 1 << 14),
        Option("y", "top offset", "int", 0, 0, 1 << 14),
        Option("color", "fill luma value", "int", 0, 0, 255),
    ]

    def filter_frame(self, frame: Frame) -> List[Frame]:
        w = self.w or frame.width
        h = self.h or frame.height
        lw, lh = chroma_sub(frame.format)
        out = frame.clone_props()
        out.width, out.height = w, h
        planes = []
        for i, p in enumerate(frame.planes):
            arr = np.asarray(p)
            if i in (1, 2):
                big = np.full(((h + (1 << lh) - 1) >> lh,
                               (w + (1 << lw) - 1) >> lw), 128, arr.dtype)
                big[self.y >> lh:(self.y >> lh) + arr.shape[0],
                    self.x >> lw:(self.x >> lw) + arr.shape[1]] = arr
            else:
                big = np.full((h, w), self.color, arr.dtype)
                big[self.y:self.y + arr.shape[0],
                    self.x:self.x + arr.shape[1]] = arr
            planes.append(big)
        out.planes = planes
        return [out]


@register_filter
class TransposeFilter(Filter):
    """reference: vf_transpose.c (dir: 0=ccw+vflip 1=cw 2=ccw 3=cw+vflip)"""
    NAME = "transpose"
    OPTIONS = [Option("dir", "direction", "int", 1, 0, 3)]

    def filter_frame(self, frame: Frame) -> List[Frame]:
        out = frame.clone_props()
        out.width, out.height = frame.height, frame.width
        planes = []
        for p in frame.planes:
            a = np.asarray(p).T
            if self.dir == 1:      # clockwise
                a = a[:, ::-1]
            elif self.dir == 2:    # counterclockwise
                a = a[::-1, :]
            elif self.dir == 3:
                a = a[::-1, ::-1]
            planes.append(np.ascontiguousarray(a))
        out.planes = planes
        return [out]


@register_filter
class HFlipFilter(Filter):
    """reference: vf_hflip.c"""
    NAME = "hflip"

    def filter_frame(self, frame: Frame) -> List[Frame]:
        out = frame.clone_props()
        out.planes = [np.ascontiguousarray(np.asarray(p)[:, ::-1])
                      for p in frame.planes]
        return [out]


@register_filter
class VFlipFilter(Filter):
    """reference: vf_vflip.c"""
    NAME = "vflip"

    def filter_frame(self, frame: Frame) -> List[Frame]:
        out = frame.clone_props()
        out.planes = [np.ascontiguousarray(np.asarray(p)[::-1])
                      for p in frame.planes]
        return [out]


@register_filter
class FpsFilter(Filter):
    """reference: vf_fps.c — duplicate/drop to constant output rate."""
    NAME = "fps"
    OPTIONS = [Option("fps", "target rate", "rational", Rational(25, 1))]

    def configure(self, frame: Frame):
        self._next_pts = None
        self._last = None
        self._out_idx = 0

    def filter_frame(self, frame: Frame) -> List[Frame]:
        if frame.pts == NOPTS_VALUE or not frame.time_base:
            return [frame]
        out_tb = self.fps.inv()
        t = frame.pts * frame.time_base.num / frame.time_base.den
        out = []
        if self._last is None:
            self._last = frame
            self._t0 = t
            return []
        # emit frames for every output tick in [last_t, t)
        while True:
            tick = self._t0 + self._out_idx * out_tb.num / out_tb.den
            if tick >= t - 1e-9:
                break
            f = self._last.clone_props()
            f.planes = list(self._last.planes)
            f.pts = self._out_idx
            f.time_base = out_tb
            out.append(f)
            self._out_idx += 1
        self._last = frame
        self._last_t = t
        return out

    def flush(self) -> List[Frame]:
        if self._last is None:
            return []
        f = self._last.clone_props()
        f.planes = list(self._last.planes)
        f.pts = self._out_idx
        f.time_base = self.fps.inv()
        return [f]


@register_filter
class YadifFilter(Filter):
    """Yadif deinterlacer (reference: vf_yadif.c) — the full
    edge-directed kernel on device (ops/yadif.py), with the reference's
    prev/cur/next frame window, mode 0-3 (frame/field rate, with/without
    the spatial interlacing check), parity detection (return_frame
    vf_yadif.c:277-283), pts doubling, and the EOF extrapolated-next
    flush (request_frame vf_yadif.c:383-389)."""
    NAME = "yadif"
    OPTIONS = [
        Option("mode", "0=frame 1=field 2/3=no spatial check", "int", 0, 0, 3),
        Option("parity", "-1=auto 0=tff 1=bff", "int", -1, -1, 1),
        Option("auto", "only deinterlace frames marked interlaced", "int", 0, 0, 1),
    ]

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._prev = self._cur = self._next = None

    def _filter_out(self, is_second: bool) -> Frame:
        from libav_tpu.ops.yadif import yadif_plane
        cur = self._cur
        if self.parity == -1:
            tff = int(cur.top_field_first) if cur.interlaced_frame else 1
        else:
            tff = self.parity ^ 1
        parity = tff ^ (not is_second)
        out = cur.clone_props()
        out.interlaced_frame = False
        out.planes = [
            yadif_plane(np.asarray(p), np.asarray(c), np.asarray(n),
                        parity, tff, int(self.mode))
            for p, c, n in zip(self._prev.planes, cur.planes,
                               self._next.planes)]
        if is_second:
            cp, npts = cur.pts, self._next.pts
            out.pts = (cp + npts) if (cp is not None and npts is not None) \
                else None
        elif out.pts is not None:
            out.pts = out.pts * 2
        return out

    def _advance(self, frame: Frame) -> List[Frame]:
        self._prev, self._cur, self._next = self._cur, self._next, frame
        if self._cur is None:
            return []
        if self.auto and not self._cur.interlaced_frame:
            out = self._cur.clone_props()
            out.planes = list(self._cur.planes)
            self._prev = None
            if out.pts is not None:
                out.pts *= 2
            return [out]
        if self._prev is None:
            self._prev = self._cur
        outs = [self._filter_out(False)]
        if self.mode & 1:
            outs.append(self._filter_out(True))
        return outs

    def filter_frame(self, frame: Frame) -> List[Frame]:
        return self._advance(frame)

    def flush(self) -> List[Frame]:
        if self._next is None:
            return []
        last = self._next
        tail = last.clone_props()
        tail.planes = list(last.planes)
        if last.pts is not None and self._cur is not None \
                and self._cur.pts is not None:
            tail.pts = last.pts * 2 - self._cur.pts
        return self._advance(tail)


@register_filter
class OverlayFilter(Filter):
    """Two-input overlay (reference: vf_overlay.c). The secondary input
    feeds `push_secondary`; each main frame is composited with the
    latest overlay frame whose pts <= the main pts (framesync
    eof_action=repeat semantics). Offsets are snapped to even for
    4:2:0 chroma alignment."""
    NAME = "overlay"
    N_INPUTS = 2
    OPTIONS = [Option("x", "left offset", "int", 0, -32768, 32768),
               Option("y", "top offset", "int", 0, -32768, 32768)]

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._queue: List[Frame] = []
        self._last = None

    def push_secondary(self, frame: Frame):
        self._queue.append(frame)

    def _pick(self, pts):
        while self._queue and (pts is None or self._queue[0].pts is None or
                               self._queue[0].pts <= pts):
            self._last = self._queue.pop(0)
        return self._last

    def filter_frame(self, frame: Frame) -> List[Frame]:
        ov = self._pick(frame.pts)
        if ov is None:
            return [frame]
        out = frame.clone_props()
        x0, y0 = int(self.x) & ~1, int(self.y) & ~1
        planes = []
        for pi, (mp, op) in enumerate(zip(frame.planes, ov.planes)):
            a = np.asarray(mp).copy()
            o = np.asarray(op)
            sub = 1 if pi else 0                  # 4:2:0 chroma halved
            px, py = x0 >> sub, y0 >> sub
            h = min(o.shape[0], a.shape[0] - py)
            w = min(o.shape[1], a.shape[1] - px)
            if h > 0 and w > 0 and px >= 0 and py >= 0:
                a[py:py + h, px:px + w] = o[:h, :w]
            planes.append(a)
        out.planes = planes
        return [out]


@register_filter
class SetPtsFilter(Filter):
    """reference: vf_setpts.c (expression subset: PTS, N, constants)"""
    NAME = "setpts"
    OPTIONS = [Option("expr", "pts expression", "string", "PTS")]

    def configure(self, frame):
        self._n = 0

    def filter_frame(self, frame: Frame) -> List[Frame]:
        from libav_tpu.avutil.eval import expr_eval
        out = frame.clone_props()
        out.planes = list(frame.planes)
        v = expr_eval(self.expr, {"PTS": float(frame.pts), "N": float(self._n)})
        out.pts = int(v)
        self._n += 1
        return [out]
