"""Vector float primitives (reference: libavutil/float_dsp.c
AVFloatDSPContext — vector_fmul, vector_fmac_scalar, scalarproduct,
butterflies; and libavcodec/audiodsp.* vector_clip).

On TPU these are one-liners the XLA fuser handles; they exist as named
entry points so codec code reads like the reference's dsp calls, and the
golden/jit pairing keeps the checkasm-style test coverage uniform.
"""

from __future__ import annotations

import numpy as np


def vector_fmul(a, b):
    """reference: float_dsp.h vector_fmul"""
    return a * b


def vector_fmac_scalar(dst, src, mul):
    """dst += src * mul"""
    return dst + src * mul


def vector_fmul_scalar(src, mul):
    return src * mul


def vector_fmul_add(a, b, c):
    return a * b + c


def vector_fmul_reverse(a, b):
    """reference: vector_fmul_reverse (window application)"""
    return a * b[..., ::-1]


def vector_fmul_window(src0, src1, win):
    """Windowed overlap butterfly (reference: vector_fmul_window):
    dst[i] = src0[i]*win[len-1-i] - src1[len-1-i]*win[i] and mirror."""
    import jax.numpy as jnp
    n = win.shape[-1] // 2
    w0 = win[..., :n]
    w1 = win[..., n:]
    s0 = src0
    s1r = src1[..., ::-1]
    left = s0 * w1[..., ::-1] - s1r * w0
    right = (s0 * w0[..., ::-1] + s1r * w1)[..., ::-1]
    return jnp.concatenate([left, right], axis=-1) if hasattr(left, "device") \
        else np.concatenate([left, right], axis=-1)


def scalarproduct(a, b):
    """reference: scalarproduct_float / audiodsp scalarproduct_int16"""
    return (a * b).sum(axis=-1)


def butterflies(a, b):
    """reference: butterflies_float: (a+b, a-b)"""
    return a + b, a - b


def vector_clip(x, lo, hi):
    """reference: audiodsp.h vector_clip_int32 / vector_clipf"""
    import numpy as _np
    if isinstance(x, _np.ndarray):
        return _np.clip(x, lo, hi)
    import jax.numpy as jnp
    return jnp.clip(x, lo, hi)
