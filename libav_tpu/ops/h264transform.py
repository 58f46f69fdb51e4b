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


# ---- 8x8 transform (High profile, spec 8.5.12.2/8.5.13) -------------- #

# normAdjust8x8 class values (spec Table in 8.5.13; same ISO constants as
# reference h264data.c ff_h264_dequant8_coeff_init), class index per
# (i%4, j%4) position
_V8_CLS = np.array([0, 3, 4, 3, 3, 1, 5, 1, 4, 5, 2, 5, 3, 1, 5, 1],
                   dtype=np.int32).reshape(4, 4)
_V8 = np.array([
    [20, 18, 32, 19, 25, 24],
    [22, 19, 35, 21, 28, 26],
    [26, 23, 42, 24, 33, 31],
    [28, 25, 45, 26, 35, 33],
    [32, 28, 51, 30, 40, 38],
    [36, 32, 58, 34, 46, 43],
], dtype=np.int32)


@functools.lru_cache(maxsize=None)
def _pos_class8() -> np.ndarray:
    """(8,8) normAdjust8x8 class per position."""
    ii, jj = np.mgrid[0:8, 0:8]
    return _V8_CLS[ii % 4, jj % 4]


def dequant8x8_tab(qp: int, w=None) -> np.ndarray:
    """(8,8) exact dequant of level -> d (spec 8.5.13): with
    LS8 = W * normAdjust8x8, d = (c*LS8) << (qp/6-6) for qp/6 >= 6 else
    (c*LS8 + 2^(5-qp/6)) >> (6-qp/6).  Returned as a (mult, add, shift)
    triple folded for tensor use is overkill — this returns the LS8
    table; callers apply the shift branch."""
    v = _V8[qp % 6][_pos_class8()]
    if w is None:
        w = np.full((8, 8), 16, np.int32)
    return (v * w.reshape(8, 8)).astype(np.int32)


def dequant8x8_ref(levels: np.ndarray, qp: int, w=None) -> np.ndarray:
    """Golden scalar 8x8 dequant (spec 8.5.13)."""
    ls = dequant8x8_tab(qp, w).astype(np.int64)
    c = levels.astype(np.int64)
    q6 = qp // 6
    if q6 >= 6:
        return ((c * ls) << (q6 - 6)).astype(np.int32)
    return ((c * ls + (1 << (5 - q6))) >> (6 - q6)).astype(np.int32)


def _idct8_1d(d, axis_first):
    """One 8-point inverse pass (spec 8.5.12.2 butterflies) over numpy
    int64 arrays indexed d[k] (list of 8 slices)."""
    a0 = d[0] + d[4]
    a2 = d[0] - d[4]
    a4 = (d[2] >> 1) - d[6]
    a6 = (d[6] >> 1) + d[2]
    b0 = a0 + a6
    b2 = a2 + a4
    b4 = a2 - a4
    b6 = a0 - a6
    a1 = -d[3] + d[5] - d[7] - (d[7] >> 1)
    a3 = d[1] + d[7] - d[3] - (d[3] >> 1)
    a5 = -d[1] + d[7] + d[5] + (d[5] >> 1)
    a7 = d[3] + d[5] + d[1] + (d[1] >> 1)
    b1 = (a7 >> 2) + a1
    b3 = a3 + (a5 >> 2)
    b5 = (a3 >> 2) - a5
    b7 = a7 - (a1 >> 2)
    return [b0 + b7, b2 + b5, b4 + b3, b6 + b1,
            b6 - b1, b4 - b3, b2 - b5, b0 - b7]


def idct8x8_h264_ref(blocks: np.ndarray) -> np.ndarray:
    """Golden exact inverse 8x8 transform (spec 8.5.12.2): d -> r with
    the (f + 32) >> 6 output normalization (DC pre-add like the
    reference's block[0] += 32, which is equivalent).

    Pass order is normative: HORIZONTAL (within each row) first, then
    vertical — the floor shifts (>>1, >>2) make the passes
    non-commutative, so the order changes outputs by +-1 (the reference
    implements the same order through transposed block storage,
    h264_slice.c init_scan_tables T() + h264idct_template.c)."""
    d = blocks.astype(np.int64)
    cols = _idct8_1d([d[..., :, k] for k in range(8)], True)
    f = np.stack(cols, axis=-1)
    rows = _idct8_1d([f[..., k, :] for k in range(8)], False)
    h = np.stack(rows, axis=-2)
    return ((h + 32) >> 6).astype(np.int32)


def idct8x8_h264(blocks):
    """Batched exact inverse 8x8 transform. (B, 8, 8) int32 -> same."""
    import jax.numpy as jnp
    d = blocks.astype(jnp.int32)
    cols = _idct8_1d([d[:, :, k] for k in range(8)], True)
    f = jnp.stack(cols, axis=-1)
    rows = _idct8_1d([f[:, k, :] for k in range(8)], False)
    h = jnp.stack(rows, axis=-2)
    return (h + 32) >> 6


# forward 8x8 transform (encoder side; the standard companion butterfly
# design — JM/mpegvideo-style — any forward works, decode is normative)
def fdct8x8_h264_ref(x: np.ndarray) -> np.ndarray:
    b = x.astype(np.float64)
    M = _fdct8_matrix()
    return (M @ b @ M.T)


@functools.lru_cache(maxsize=None)
def _idct8_matrix() -> np.ndarray:
    """T: the exact linear part of one idct8 pass (shifts treated as
    exact halving, which they are in the float model)."""
    T = np.zeros((8, 8))
    for k in range(8):
        dd = [np.array([1.0 if i == k else 0.0]) for i in range(8)]
        a0 = dd[0] + dd[4]
        a2 = dd[0] - dd[4]
        a4 = dd[2] / 2 - dd[6]
        a6 = dd[6] / 2 + dd[2]
        b0 = a0 + a6
        b2 = a2 + a4
        b4 = a2 - a4
        b6 = a0 - a6
        a1 = -dd[3] + dd[5] - dd[7] - dd[7] / 2
        a3 = dd[1] + dd[7] - dd[3] - dd[3] / 2
        a5 = -dd[1] + dd[7] + dd[5] + dd[5] / 2
        a7 = dd[3] + dd[5] + dd[1] + dd[1] / 2
        b1 = a7 / 4 + a1
        b3 = a3 + a5 / 4
        b5 = a3 / 4 - a5
        b7 = a7 - a1 / 4
        T[:, k] = [v[0] for v in (b0 + b7, b2 + b5, b4 + b3, b6 + b1,
                                  b6 - b1, b4 - b3, b2 - b5, b0 - b7)]
    return T


@functools.lru_cache(maxsize=None)
def _fdct8_matrix() -> np.ndarray:
    """F = 8 * T^-1, so the encoder target d* = (F X F^T) / 64 feeds the
    normative inverse with r = (T d T^T)/64 ~= X."""
    return np.linalg.inv(_idct8_matrix()) * 8.0


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
