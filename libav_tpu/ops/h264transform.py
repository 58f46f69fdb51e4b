"""H.264 4x4 integer transforms + quantization (reference:
libavcodec/h264dsp.h:80-105 idct_add family, h264idct_template.c,
h264_mb.c dequant path; spec ISO 14496-10 §8.5).

All exact int32, batched over (B, 4, 4) blocks — same design as ops/idct.
"""

from __future__ import annotations

import functools

import numpy as np

# LevelScale V matrix (14496-10 table 8-15): rows qp%6, columns the three
# position classes (0: (0,0),(0,2),(2,0),(2,2); 1: (1,1),(1,3),(3,1),(3,3);
# 2: others)
_V = np.array([
    [10, 16, 13],
    [11, 18, 14],
    [13, 20, 16],
    [14, 23, 18],
    [16, 25, 20],
    [18, 29, 23],
], dtype=np.int32)

# Encoder MF multipliers (table derived from V: MF = 2^15 * 2^qbits... the
# standard values, spec §8.5.9 inverse relation)
_MF = np.array([
    [13107, 5243, 8066],
    [11916, 4660, 7490],
    [10082, 4194, 6554],
    [9362, 3647, 5825],
    [8192, 3355, 5243],
    [7282, 2893, 4559],
], dtype=np.int32)


@functools.lru_cache(maxsize=None)
def _pos_class() -> np.ndarray:
    cls = np.full((4, 4), 2, dtype=np.int32)
    for (i, j) in [(0, 0), (0, 2), (2, 0), (2, 2)]:
        cls[i, j] = 0
    for (i, j) in [(1, 1), (1, 3), (3, 1), (3, 3)]:
        cls[i, j] = 1
    return cls


@functools.lru_cache(maxsize=None)
def dequant_scale(qp: int) -> np.ndarray:
    """(4,4) dequant multiplier for AC path: V[qp%6, class] << (qp//6)."""
    return (_V[qp % 6][_pos_class()] << (qp // 6)).astype(np.int32)


@functools.lru_cache(maxsize=None)
def quant_mf(qp: int) -> np.ndarray:
    """(4,4) encoder multiplier MF[qp%6, class]; qbits = 15 + qp//6."""
    return _MF[qp % 6][_pos_class()].astype(np.int32)


def idct4x4_ref(blocks: np.ndarray) -> np.ndarray:
    """Golden inverse 4x4 transform (8.5.12.2), input = dequantized
    coefficients d, output = residual r (before +32>>6 is INCLUDED here)."""
    d = blocks.astype(np.int64)
    # horizontal (rows)
    e0 = d[..., :, 0] + d[..., :, 2]
    e1 = d[..., :, 0] - d[..., :, 2]
    e2 = (d[..., :, 1] >> 1) - d[..., :, 3]
    e3 = d[..., :, 1] + (d[..., :, 3] >> 1)
    f = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    # vertical (cols)
    g0 = f[..., 0, :] + f[..., 2, :]
    g1 = f[..., 0, :] - f[..., 2, :]
    g2 = (f[..., 1, :] >> 1) - f[..., 3, :]
    g3 = f[..., 1, :] + (f[..., 3, :] >> 1)
    h = np.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)
    return ((h + 32) >> 6).astype(np.int32)


def idct4x4(blocks):
    """Batched exact inverse transform. (B, 4, 4) int32 -> (B, 4, 4)."""
    import jax.numpy as jnp
    d = blocks.astype(jnp.int32)
    e0 = d[:, :, 0] + d[:, :, 2]
    e1 = d[:, :, 0] - d[:, :, 2]
    e2 = (d[:, :, 1] >> 1) - d[:, :, 3]
    e3 = d[:, :, 1] + (d[:, :, 3] >> 1)
    f = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    g0 = f[:, 0, :] + f[:, 2, :]
    g1 = f[:, 0, :] - f[:, 2, :]
    g2 = (f[:, 1, :] >> 1) - f[:, 3, :]
    g3 = f[:, 1, :] + (f[:, 3, :] >> 1)
    h = jnp.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)
    return (h + 32) >> 6


def fdct4x4_ref(blocks: np.ndarray) -> np.ndarray:
    """Golden forward core transform Cf X Cf^T (no scaling)."""
    Cf = np.array([[1, 1, 1, 1], [2, 1, -1, -2],
                   [1, -1, -1, 1], [1, -2, 2, -1]], dtype=np.int64)
    x = blocks.astype(np.int64)
    return (Cf @ x @ Cf.T).astype(np.int32)


def fdct4x4(blocks):
    import jax.numpy as jnp
    Cf = jnp.asarray([[1, 1, 1, 1], [2, 1, -1, -2],
                      [1, -1, -1, 1], [1, -2, 2, -1]], dtype=jnp.int32)
    x = blocks.astype(jnp.int32)
    return jnp.einsum("ki,bij,lj->bkl", Cf, x, Cf,
                      preferred_element_type=jnp.int32)


def quant4x4_ref(w: np.ndarray, qp: int, intra: bool) -> np.ndarray:
    """Golden scalar quant: level = (|W|*MF + f) >> qbits (spec §8.5.9
    informative encoder relation)."""
    mf = quant_mf(qp).astype(np.int64)
    qbits = 15 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    ww = w.astype(np.int64)
    lv = (np.abs(ww) * mf + f) >> qbits
    return (np.sign(ww) * lv).astype(np.int32)


def quant4x4(w, qp: int, intra: bool):
    import jax.numpy as jnp
    mf = jnp.asarray(quant_mf(qp))
    qbits = 15 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    ww = w.astype(jnp.int32)
    lv = (jnp.abs(ww) * mf + f) >> qbits
    return jnp.sign(ww) * lv


def dequant4x4_ref(levels: np.ndarray, qp: int) -> np.ndarray:
    return (levels.astype(np.int64) * dequant_scale(qp)).astype(np.int32)


def dequant4x4(levels, qp: int):
    import jax.numpy as jnp
    return levels.astype(jnp.int32) * jnp.asarray(dequant_scale(qp))


# ---- luma DC (I_16x16) 4x4 Hadamard (spec 8.5.10) -------------------- #

def hadamard4x4_ref(dc: np.ndarray) -> np.ndarray:
    H = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                  [1, -1, -1, 1], [1, -1, 1, -1]], dtype=np.int64)
    x = dc.astype(np.int64)
    return (H @ x @ H.T).astype(np.int32)


def luma_dc_dequant_ref(dc_t: np.ndarray, qp: int) -> np.ndarray:
    """Inverse Hadamard then scale (spec 8.5.10): for qp//6 >= 2 the DC is
    (f*V0) << (qp//6 - 2), else rounded right shift by (2 - qp//6)."""
    f = hadamard4x4_ref(dc_t).astype(np.int64)
    v = int(_V[qp % 6, 0])
    shift = 2 - qp // 6
    if shift > 0:
        out = (f * v + (1 << (shift - 1))) >> shift
    else:
        out = (f * v) << (-shift)
    return out.astype(np.int32)


def luma_dc_transform(dc, qp: int):
    """Batched: (B, 4, 4) raw DC levels -> dequantized DC for the 16
    sub-blocks."""
    import jax.numpy as jnp
    H = jnp.asarray([[1, 1, 1, 1], [1, 1, -1, -1],
                     [1, -1, -1, 1], [1, -1, 1, -1]], dtype=jnp.int32)
    f = jnp.einsum("ki,bij,lj->bkl", H, dc.astype(jnp.int32), H,
                   preferred_element_type=jnp.int32)
    v = int(_V[qp % 6, 0])
    shift = 2 - qp // 6
    if shift > 0:
        return (f * v + (1 << (shift - 1))) >> shift
    return (f * v) << (-shift)


# ---- chroma DC 2x2 (spec 8.5.11) -------------------------------------- #

def chroma_dc_transform_ref(dc: np.ndarray, qp: int) -> np.ndarray:
    """(B, 2, 2) levels -> dequantized chroma DC."""
    x = dc.astype(np.int64)
    f = np.empty_like(x)
    f[..., 0, 0] = x[..., 0, 0] + x[..., 0, 1] + x[..., 1, 0] + x[..., 1, 1]
    f[..., 0, 1] = x[..., 0, 0] - x[..., 0, 1] + x[..., 1, 0] - x[..., 1, 1]
    f[..., 1, 0] = x[..., 0, 0] + x[..., 0, 1] - x[..., 1, 0] - x[..., 1, 1]
    f[..., 1, 1] = x[..., 0, 0] - x[..., 0, 1] - x[..., 1, 0] + x[..., 1, 1]
    v = int(_V[qp % 6, 0])
    # (f * V << qp/6) >> 1 — equal to the reference's
    # (f * dequant4_coeff) >> 7 with its <<(qp/6+6)-scaled tables
    return (((f * v) << (qp // 6)) >> 1).astype(np.int32)


def chroma_dc_transform(dc, qp: int):
    import jax.numpy as jnp
    x = dc.astype(jnp.int32)
    a = x[:, 0, 0]
    b = x[:, 0, 1]
    c = x[:, 1, 0]
    d = x[:, 1, 1]
    f = jnp.stack([jnp.stack([a + b + c + d, a - b + c - d], axis=-1),
                   jnp.stack([a + b - c - d, a - b - c + d], axis=-1)],
                  axis=-2)
    v = int(_V[qp % 6, 0])
    return ((f * v) << (qp // 6)) >> 1
