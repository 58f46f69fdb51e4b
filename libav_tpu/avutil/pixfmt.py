"""Pixel formats + descriptor table (reference: libavutil/pixfmt.h (425
lines, ~200 formats) and pixdesc.h:345 AVPixFmtDescriptor / pixdesc.c).

The descriptor drives all generic plane math (sizes, subsampling, bit depth)
exactly like av_pix_fmt_desc_get() does in the reference. We carry the subset
of formats the five north-star configs plus the common filter paths need, and
keep the enum open-ended (string-keyed) so new formats are one table row.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass(frozen=True)
class ComponentDesc:
    """reference: pixdesc.h:34 AVComponentDescriptor"""
    plane: int
    step: int       # bytes (or bits for bitstream fmts) between 2 horiz samples
    offset: int     # byte offset of component in its step
    depth: int      # bits per component


@dataclass(frozen=True)
class PixFmtDescriptor:
    """reference: pixdesc.h:55 AVPixFmtDescriptor"""
    name: str
    nb_components: int
    log2_chroma_w: int
    log2_chroma_h: int
    flags: int
    comp: Tuple[ComponentDesc, ...]
    alias: Tuple[str, ...] = ()

    @property
    def nb_planes(self) -> int:
        return 1 + max(c.plane for c in self.comp) if self.comp else 0

    @property
    def bits_per_pixel(self) -> float:
        # reference: pixdesc.c av_get_bits_per_pixel — chroma components
        # contribute at their subsampled rate
        total = 0.0
        for i, c in enumerate(self.comp):
            if i in (1, 2) and not (self.flags & FLAG_RGB):
                total += c.depth / (1 << (self.log2_chroma_w + self.log2_chroma_h))
            else:
                total += c.depth
        return total


# flags (reference: pixdesc.h AV_PIX_FMT_FLAG_*)
FLAG_BE = 1 << 0
FLAG_PAL = 1 << 1
FLAG_BITSTREAM = 1 << 2
FLAG_HWACCEL = 1 << 3
FLAG_PLANAR = 1 << 4
FLAG_RGB = 1 << 5
FLAG_ALPHA = 1 << 7


class PixelFormat:
    """String-keyed pixel format ids (reference: pixfmt.h:66 AVPixelFormat).

    Values are the names themselves; comparisons are string comparisons.
    """
    NONE = "none"
    YUV420P = "yuv420p"
    YUV422P = "yuv422p"
    YUV444P = "yuv444p"
    YUV410P = "yuv410p"
    YUV411P = "yuv411p"
    YUVJ420P = "yuvj420p"   # JPEG full-range variants (pixfmt.h)
    YUVJ422P = "yuvj422p"
    YUVJ444P = "yuvj444p"
    YUV420P10 = "yuv420p10le"
    YUV422P10 = "yuv422p10le"
    YUV444P10 = "yuv444p10le"
    GRAY8 = "gray"
    GRAY16 = "gray16le"
    RGB24 = "rgb24"
    BGR24 = "bgr24"
    RGBA = "rgba"
    BGRA = "bgra"
    ARGB = "argb"
    ABGR = "abgr"
    RGB565 = "rgb565le"
    RGB555 = "rgb555le"
    NV12 = "nv12"
    NV21 = "nv21"
    YUYV422 = "yuyv422"
    UYVY422 = "uyvy422"
    PAL8 = "pal8"
    MONOWHITE = "monow"
    MONOBLACK = "monob"


def _planar_yuv(name, lw, lh, depth=8, alpha=False):
    nb = 4 if alpha else 3
    step = 1 if depth <= 8 else 2
    comps = [ComponentDesc(0, step, 0, depth),
             ComponentDesc(1, step, 0, depth),
             ComponentDesc(2, step, 0, depth)]
    if alpha:
        comps.append(ComponentDesc(3, step, 0, depth))
    return PixFmtDescriptor(name, nb, lw, lh,
                            FLAG_PLANAR | (FLAG_ALPHA if alpha else 0),
                            tuple(comps))


_DESCRIPTORS: Dict[str, PixFmtDescriptor] = {}


def _reg(d: PixFmtDescriptor):
    _DESCRIPTORS[d.name] = d
    for a in d.alias:
        _DESCRIPTORS[a] = d


for _name, _lw, _lh in [("yuv420p", 1, 1), ("yuv422p", 1, 0), ("yuv444p", 0, 0),
                        ("yuv410p", 2, 2), ("yuv411p", 2, 0),
                        ("yuvj420p", 1, 1), ("yuvj422p", 1, 0), ("yuvj444p", 0, 0)]:
    _reg(_planar_yuv(_name, _lw, _lh))
for _name, _lw, _lh in [("yuv420p10le", 1, 1), ("yuv422p10le", 1, 0),
                        ("yuv444p10le", 0, 0)]:
    _reg(_planar_yuv(_name, _lw, _lh, depth=10))

_reg(PixFmtDescriptor("gray", 1, 0, 0, 0, (ComponentDesc(0, 1, 0, 8),)))
_reg(PixFmtDescriptor("gray16le", 1, 0, 0, 0, (ComponentDesc(0, 2, 0, 16),)))
_reg(PixFmtDescriptor("rgb24", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 3, 0, 8), ComponentDesc(0, 3, 1, 8), ComponentDesc(0, 3, 2, 8))))
_reg(PixFmtDescriptor("bgr24", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 3, 2, 8), ComponentDesc(0, 3, 1, 8), ComponentDesc(0, 3, 0, 8))))
_reg(PixFmtDescriptor("rgba", 4, 0, 0, FLAG_RGB | FLAG_ALPHA, (
    ComponentDesc(0, 4, 0, 8), ComponentDesc(0, 4, 1, 8),
    ComponentDesc(0, 4, 2, 8), ComponentDesc(0, 4, 3, 8))))
_reg(PixFmtDescriptor("bgra", 4, 0, 0, FLAG_RGB | FLAG_ALPHA, (
    ComponentDesc(0, 4, 2, 8), ComponentDesc(0, 4, 1, 8),
    ComponentDesc(0, 4, 0, 8), ComponentDesc(0, 4, 3, 8))))
_reg(PixFmtDescriptor("argb", 4, 0, 0, FLAG_RGB | FLAG_ALPHA, (
    ComponentDesc(0, 4, 1, 8), ComponentDesc(0, 4, 2, 8),
    ComponentDesc(0, 4, 3, 8), ComponentDesc(0, 4, 0, 8))))
_reg(PixFmtDescriptor("abgr", 4, 0, 0, FLAG_RGB | FLAG_ALPHA, (
    ComponentDesc(0, 4, 3, 8), ComponentDesc(0, 4, 2, 8),
    ComponentDesc(0, 4, 1, 8), ComponentDesc(0, 4, 0, 8))))
_reg(PixFmtDescriptor("nv12", 3, 1, 1, FLAG_PLANAR, (
    ComponentDesc(0, 1, 0, 8), ComponentDesc(1, 2, 0, 8), ComponentDesc(1, 2, 1, 8))))
_reg(PixFmtDescriptor("nv21", 3, 1, 1, FLAG_PLANAR, (
    ComponentDesc(0, 1, 0, 8), ComponentDesc(1, 2, 1, 8), ComponentDesc(1, 2, 0, 8))))
_reg(PixFmtDescriptor("yuyv422", 3, 1, 0, 0, (
    ComponentDesc(0, 2, 0, 8), ComponentDesc(0, 4, 1, 8), ComponentDesc(0, 4, 3, 8))))
_reg(PixFmtDescriptor("uyvy422", 3, 1, 0, 0, (
    ComponentDesc(0, 2, 1, 8), ComponentDesc(0, 4, 0, 8), ComponentDesc(0, 4, 2, 8))))
_reg(PixFmtDescriptor("pal8", 1, 0, 0, FLAG_PAL, (ComponentDesc(0, 1, 0, 8),)))
_reg(PixFmtDescriptor("monow", 1, 0, 0, FLAG_BITSTREAM, (ComponentDesc(0, 1, 0, 1),)))
_reg(PixFmtDescriptor("monob", 1, 0, 0, FLAG_BITSTREAM, (ComponentDesc(0, 1, 0, 1),)))
_reg(PixFmtDescriptor("rgb565le", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 2, 0, 5), ComponentDesc(0, 2, 0, 6), ComponentDesc(0, 2, 0, 5))))
_reg(PixFmtDescriptor("rgb555le", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 2, 0, 5), ComponentDesc(0, 2, 0, 5), ComponentDesc(0, 2, 0, 5))))

# -- breadth batch (reference pixfmt.h rows; descriptor-driven like
# pixdesc.c, so every generic plane-math path picks these up) ----------

# planar YUV bit-depth matrix (le/be) incl. 440 and alpha variants
for _nm, _lw, _lh in [("yuv420p", 1, 1), ("yuv422p", 1, 0),
                      ("yuv444p", 0, 0), ("yuv440p", 0, 1)]:
    for _d in (9, 10, 12, 14, 16):
        for _e in ("le", "be"):
            _fl = FLAG_PLANAR | (FLAG_BE if _e == "be" else 0)
            _reg(PixFmtDescriptor(
                f"{_nm}{_d}{_e}", 3, _lw, _lh, _fl,
                tuple(ComponentDesc(_p, 2, 0, _d) for _p in range(3))))
_reg(_planar_yuv("yuv440p", 0, 1))
for _nm, _lw, _lh in [("yuva420p", 1, 1), ("yuva422p", 1, 0),
                      ("yuva444p", 0, 0)]:
    _reg(_planar_yuv(_nm, _lw, _lh, alpha=True))

# planar GBR (gbrp family, reference pixfmt.h AV_PIX_FMT_GBRP*)
for _d in (8, 9, 10, 12, 14, 16):
    for _e in (("",) if _d == 8 else ("le", "be")):
        _nm = "gbrp" if _d == 8 else f"gbrp{_d}{_e}"
        _st = 1 if _d == 8 else 2
        _fl = FLAG_PLANAR | FLAG_RGB | (FLAG_BE if _e == "be" else 0)
        _reg(PixFmtDescriptor(_nm, 3, 0, 0, _fl, (
            ComponentDesc(2, _st, 0, _d), ComponentDesc(0, _st, 0, _d),
            ComponentDesc(1, _st, 0, _d))))
_reg(PixFmtDescriptor("gbrap", 4, 0, 0,
                      FLAG_PLANAR | FLAG_RGB | FLAG_ALPHA, (
    ComponentDesc(2, 1, 0, 8), ComponentDesc(0, 1, 0, 8),
    ComponentDesc(1, 1, 0, 8), ComponentDesc(3, 1, 0, 8))))

# gray depths
for _d in (9, 10, 12, 14):
    for _e in ("le", "be"):
        _reg(PixFmtDescriptor(f"gray{_d}{_e}", 1, 0, 0,
                              FLAG_BE if _e == "be" else 0,
                              (ComponentDesc(0, 2, 0, _d),)))
_reg(PixFmtDescriptor("gray16be", 1, 0, 0, FLAG_BE,
                      (ComponentDesc(0, 2, 0, 16),)))
_reg(PixFmtDescriptor("ya8", 2, 0, 0, FLAG_ALPHA, (
    ComponentDesc(0, 2, 0, 8), ComponentDesc(0, 2, 1, 8))))

# packed RGB extras
_reg(PixFmtDescriptor("rgb48le", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 6, 0, 16), ComponentDesc(0, 6, 2, 16),
    ComponentDesc(0, 6, 4, 16))))
_reg(PixFmtDescriptor("rgb48be", 3, 0, 0, FLAG_RGB | FLAG_BE, (
    ComponentDesc(0, 6, 0, 16), ComponentDesc(0, 6, 2, 16),
    ComponentDesc(0, 6, 4, 16))))
_reg(PixFmtDescriptor("bgr48le", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 6, 4, 16), ComponentDesc(0, 6, 2, 16),
    ComponentDesc(0, 6, 0, 16))))
_reg(PixFmtDescriptor("rgba64le", 4, 0, 0, FLAG_RGB | FLAG_ALPHA, (
    ComponentDesc(0, 8, 0, 16), ComponentDesc(0, 8, 2, 16),
    ComponentDesc(0, 8, 4, 16), ComponentDesc(0, 8, 6, 16))))
_reg(PixFmtDescriptor("bgr565le", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 2, 0, 5), ComponentDesc(0, 2, 0, 6),
    ComponentDesc(0, 2, 0, 5))))
_reg(PixFmtDescriptor("bgr555le", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 2, 0, 5), ComponentDesc(0, 2, 0, 5),
    ComponentDesc(0, 2, 0, 5))))
_reg(PixFmtDescriptor("rgb8", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 1, 0, 3), ComponentDesc(0, 1, 0, 3),
    ComponentDesc(0, 1, 0, 2))))
_reg(PixFmtDescriptor("bgr8", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 1, 0, 2), ComponentDesc(0, 1, 0, 3),
    ComponentDesc(0, 1, 0, 3))))
_reg(PixFmtDescriptor("0rgb", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 4, 1, 8), ComponentDesc(0, 4, 2, 8),
    ComponentDesc(0, 4, 3, 8))))
_reg(PixFmtDescriptor("rgb0", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 4, 0, 8), ComponentDesc(0, 4, 1, 8),
    ComponentDesc(0, 4, 2, 8))))
_reg(PixFmtDescriptor("0bgr", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 4, 3, 8), ComponentDesc(0, 4, 2, 8),
    ComponentDesc(0, 4, 1, 8))))
_reg(PixFmtDescriptor("bgr0", 3, 0, 0, FLAG_RGB, (
    ComponentDesc(0, 4, 2, 8), ComponentDesc(0, 4, 1, 8),
    ComponentDesc(0, 4, 0, 8))))

# semi-planar extras
_reg(PixFmtDescriptor("nv16", 3, 1, 0, FLAG_PLANAR, (
    ComponentDesc(0, 1, 0, 8), ComponentDesc(1, 2, 0, 8),
    ComponentDesc(1, 2, 1, 8))))


def pixdesc(fmt: str) -> PixFmtDescriptor:
    """reference: pixdesc.c av_pix_fmt_desc_get"""
    d = _DESCRIPTORS.get(fmt)
    if d is None:
        raise KeyError(f"unknown pixel format: {fmt}")
    return d


def pix_fmt_count_planes(fmt: str) -> int:
    return pixdesc(fmt).nb_planes


def chroma_sub(fmt: str) -> Tuple[int, int]:
    d = pixdesc(fmt)
    return d.log2_chroma_w, d.log2_chroma_h


def plane_dims(fmt: str, width: int, height: int) -> List[Tuple[int, int]]:
    """(w, h) of each plane. reference: imgutils.c av_image_fill_plane_sizes"""
    d = pixdesc(fmt)
    dims = []
    for p in range(d.nb_planes):
        if p in (1, 2) and not (d.flags & FLAG_RGB):
            w = (width + (1 << d.log2_chroma_w) - 1) >> d.log2_chroma_w
            h = (height + (1 << d.log2_chroma_h) - 1) >> d.log2_chroma_h
        else:
            w, h = width, height
        # nv12 chroma plane is interleaved u+v: double width in bytes handled by step
        dims.append((w, h))
    return dims
