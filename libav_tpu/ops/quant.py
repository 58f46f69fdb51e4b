"""Batched quantization / dequantization + scan patterns (reference:
libavcodec/mpegvideo.c dct_unquantize_* family, mpegvideo_enc.c
dct_quantize, mjpegdec.c dequant, and the zigzag tables in
libavcodec/mathtables/zigzag — ff_zigzag_direct).

Quant/dequant are pure elementwise integer ops over the (B, 64) coefficient
tensor — ideal VPU work, fused by XLA into the DCT matmuls around them.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def zigzag_scan() -> np.ndarray:
    """Zigzag scan order: zigzag_scan()[i] = raster index of i-th scanned
    coeff (reference: ff_zigzag_direct). Generated, not tabulated."""
    order = []
    for s in range(15):
        idxs = [(s - j, j) for j in range(s + 1) if 0 <= s - j < 8 and 0 <= j < 8]
        if s % 2 == 1:
            idxs.reverse()  # odd diagonals run top-right -> bottom-left
        order += [r * 8 + c for r, c in idxs]
    return np.array(order, dtype=np.int32)


@functools.lru_cache(maxsize=None)
def alternate_horizontal_scan() -> np.ndarray:
    """MPEG-4 alternate horizontal scan, used for intra blocks whose AC
    prediction came from the block above (ISO 14496-2 Table 12-2 /
    disclosed spec-constant extraction from the reference's
    ff_alternate_horizontal_scan, mpegvideodata.c:82)."""
    t = [
        0,  1,  2,  3,  8,  9, 16, 17, 10, 11,  4,  5,  6,  7, 15, 14,
        13, 12, 19, 18, 24, 25, 32, 33, 26, 27, 20, 21, 22, 23, 28, 29,
        30, 31, 34, 35, 40, 41, 48, 49, 42, 43, 36, 37, 38, 39, 44, 45,
        46, 47, 50, 51, 56, 57, 58, 59, 52, 53, 54, 55, 60, 61, 62, 63,
    ]
    return np.array(t, dtype=np.int32)


@functools.lru_cache(maxsize=None)
def alternate_scan() -> np.ndarray:
    """MPEG-2 alternate (vertical) scan for interlaced content
    (reference: ff_alternate_vertical_scan)."""
    t = [
        0,  8, 16, 24,  1,  9,  2, 10, 17, 25, 32, 40, 48, 56, 57, 49,
        41, 33, 26, 18,  3, 11,  4, 12, 19, 27, 34, 42, 50, 58, 35, 43,
        51, 59, 20, 28,  5, 13,  6, 14, 21, 29, 36, 44, 52, 60, 37, 45,
        53, 61, 22, 30,  7, 15, 23, 31, 38, 46, 54, 62, 39, 47, 55, 63,
    ]
    return np.array(t, dtype=np.int32)


@functools.lru_cache(maxsize=None)
def inverse_scan(name: str = "zigzag") -> np.ndarray:
    """inverse_scan()[raster] = scan position."""
    s = zigzag_scan() if name == "zigzag" else alternate_scan()
    inv = np.empty(64, dtype=np.int32)
    inv[s] = np.arange(64, dtype=np.int32)
    return inv


def dezigzag(coeffs_scan_order, scan: np.ndarray = None):
    """(B, 64) scan-order coeffs -> (B, 8, 8) raster blocks. Works for both
    numpy and jax inputs (static gather)."""
    if scan is None:
        scan = zigzag_scan()
    # raster[r] = scanned[pos[r]] where pos[scan[k]] = k
    s = np.asarray(scan)
    pos = np.empty(64, dtype=np.int64)
    pos[s] = np.arange(64)
    return coeffs_scan_order[..., pos].reshape(*coeffs_scan_order.shape[:-1], 8, 8)


# ---------------------------------------------------------------------- #
# JPEG-style quantization (uniform, no dead zone on dequant)
# ---------------------------------------------------------------------- #

def jpeg_dequant(coeffs, qmat):
    """(B, 64) int x (64,) or (B, 64) qmat -> (B, 64) int32
    (reference: mjpegdec.c decode_block: level * quant_matrix[i])."""
    return coeffs.astype(np.int32) * qmat.astype(np.int32) if isinstance(coeffs, np.ndarray) \
        else _jax_mul(coeffs, qmat)


def _jax_mul(coeffs, qmat):
    import jax.numpy as jnp
    return coeffs.astype(jnp.int32) * jnp.asarray(qmat, dtype=jnp.int32)


def jpeg_quant_ref(coeffs: np.ndarray, qmat: np.ndarray) -> np.ndarray:
    """Golden: round-half-away division (JPEG Annex encoder convention)."""
    c = coeffs.astype(np.int64)
    q = qmat.astype(np.int64)
    return (np.sign(c) * ((np.abs(c) + q // 2) // q)).astype(np.int32)


def jpeg_quant(coeffs, qmat):
    import jax.numpy as jnp
    c = coeffs.astype(jnp.int32)
    q = jnp.asarray(qmat, dtype=jnp.int32)
    return jnp.sign(c) * ((jnp.abs(c) + q // 2) // q)


# ---------------------------------------------------------------------- #
# MPEG-1/2/4 style (reference: mpegvideo.c dct_unquantize_mpeg1_intra etc.)
# ---------------------------------------------------------------------- #

def mpeg1_dequant_intra_ref(coeffs: np.ndarray, qscale: np.ndarray,
                            qmat: np.ndarray) -> np.ndarray:
    """MPEG-1 intra (reference: mpegvideo.c dct_unquantize_mpeg1_intra_c):
    the shift is applied to the MAGNITUDE (the C negates, shifts, negates
    back — truncation toward zero, not floor), then oddification
    ((mag-1)|1) per ISO 11172-2 §2.4.4.2. No saturation (the C stores to
    int16_t; the IDCT input wrap reproduces that). DC = c * 8
    (y/c_dc_scale)."""
    c = coeffs.astype(np.int64)
    q = (qscale if np.ndim(qscale) else np.asarray(qscale)).astype(np.int64)
    while q.ndim < c.ndim:
        q = q[..., None]
    mag = (np.abs(c) * q * qmat.astype(np.int64)) >> 3
    mag = (mag - 1) | 1
    lvl = np.where(c != 0, np.sign(c) * mag, 0)
    dc_mask = np.zeros(64, dtype=bool)
    dc_mask[0] = True
    lvl = np.where(dc_mask, c * 8, lvl)
    return lvl.astype(np.int32)


def mpeg1_dequant_intra(coeffs, qscale, qmat):
    import jax.numpy as jnp
    c = coeffs.astype(jnp.int32)
    q = jnp.asarray(qscale, dtype=jnp.int32)
    while q.ndim < c.ndim:
        q = q[..., None]
    mag = (jnp.abs(c) * q * jnp.asarray(qmat, dtype=jnp.int32)) >> 3
    mag = (mag - 1) | 1
    lvl = jnp.where(c != 0, jnp.sign(c) * mag, 0)
    dc_mask = jnp.zeros((64,), dtype=bool).at[0].set(True)
    lvl = jnp.where(dc_mask, c * 8, lvl)
    return lvl


def mpeg1_dequant_inter_ref(coeffs: np.ndarray, qscale,
                            qmat: np.ndarray) -> np.ndarray:
    """MPEG-1 inter: level = ((2*c + sign(c)) * qscale * qmat) >> 4,
    oddified (ISO 11172-2 §2.4.4.3)."""
    c = coeffs.astype(np.int64)
    q = np.asarray(qscale).astype(np.int64)
    while q.ndim < c.ndim:
        q = q[..., None]
    mag = ((2 * np.abs(c) + 1) * q * qmat.astype(np.int64)) >> 4
    mag = (mag - 1) | 1
    lvl = np.where(c != 0, np.sign(c) * mag, 0)
    return lvl.astype(np.int32)


def mpeg1_dequant_inter(coeffs, qscale, qmat):
    import jax.numpy as jnp
    c = coeffs.astype(jnp.int32)
    q = jnp.asarray(qscale, dtype=jnp.int32)
    while q.ndim < c.ndim:
        q = q[..., None]
    mag = ((2 * jnp.abs(c) + 1) * q * jnp.asarray(qmat, dtype=jnp.int32)) >> 4
    mag = (mag - 1) | 1
    lvl = jnp.where(c != 0, jnp.sign(c) * mag, 0)
    return lvl


def mpeg2_dequant_intra(coeffs, qscale, qmat):
    """MPEG-2 intra: no oddification; mismatch control is the LSB toggle on
    coeff 63 (applied by the caller over the summed parity, ISO 13818-2
    §7.4.4)."""
    import jax.numpy as jnp
    c = coeffs.astype(jnp.int32)
    q = jnp.asarray(qscale, dtype=jnp.int32)
    while q.ndim < c.ndim:
        q = q[..., None]
    mag = (jnp.abs(c) * q * jnp.asarray(qmat, dtype=jnp.int32)) >> 4
    lvl = jnp.sign(c) * mag
    dc_mask = jnp.zeros((64,), dtype=bool).at[0].set(True)
    lvl = jnp.where(dc_mask, c, lvl)
    return lvl


def mpeg2_dequant_inter(coeffs, qscale, qmat):
    import jax.numpy as jnp
    c = coeffs.astype(jnp.int32)
    q = jnp.asarray(qscale, dtype=jnp.int32)
    while q.ndim < c.ndim:
        q = q[..., None]
    mag = ((2 * jnp.abs(c) + 1) * q * jnp.asarray(qmat, dtype=jnp.int32)) >> 5
    lvl = jnp.where(c != 0, jnp.sign(c) * mag, 0)
    return lvl


def mpeg2_mismatch_control(blocks):
    """Toggle LSB of coeff [7,7] if the block sum is even
    (ISO 13818-2 §7.4.4; reference: mpeg12dec.c mismatch accumulation)."""
    import jax.numpy as jnp
    s = jnp.sum(blocks.reshape(blocks.shape[0], 64), axis=-1)
    even = (s & 1) == 0
    toggle = jnp.where(even, blocks[:, 7, 7] ^ 1, blocks[:, 7, 7])
    return blocks.at[:, 7, 7].set(toggle)


def h263_dequant(coeffs, qscale, dc_scaler, intra: bool):
    """H.263 / MPEG-4 short-header dequant (reference: mpegvideo.c
    dct_unquantize_h263_intra/inter): |rec| = qscale*(2|L|+1) - (qscale
    even ? 1 : 0); intra DC = L * dc_scaler.
    coeffs (B, 64); qscale, dc_scaler broadcastable (B,) or scalars."""
    import jax.numpy as jnp
    c = coeffs.astype(jnp.int32)
    q = jnp.asarray(qscale, dtype=jnp.int32)
    while q.ndim < c.ndim:
        q = q[..., None]
    even = 1 - (q & 1)
    mag = q * (2 * jnp.abs(c) + 1) - even
    lvl = jnp.sign(c) * mag
    if intra:
        d = jnp.asarray(dc_scaler, dtype=jnp.int32)
        while d.ndim < c.ndim:
            d = d[..., None]
        dc_mask = jnp.zeros((64,), dtype=bool).at[0].set(True)
        lvl = jnp.where(dc_mask, c * d, lvl)
    return jnp.clip(lvl, -2048, 2047)


def h263_dequant_ref(coeffs: np.ndarray, qscale, dc_scaler,
                     intra: bool) -> np.ndarray:
    c = coeffs.astype(np.int64)
    q = np.asarray(qscale, dtype=np.int64)
    while q.ndim < c.ndim:
        q = q[..., None]
    even = 1 - (q & 1)
    lvl = np.sign(c) * (q * (2 * np.abs(c) + 1) - even)
    if intra:
        d = np.asarray(dc_scaler, dtype=np.int64)
        while d.ndim < c.ndim:
            d = d[..., None]
        mask = np.zeros(64, dtype=bool)
        mask[0] = True
        lvl = np.where(mask, c * d, lvl)
    return np.clip(lvl, -2048, 2047).astype(np.int32)


def mpeg4_dc_scaler(qscale, luma: bool):
    """ISO 14496-2 §7.4.1 table 7-2 DC scaler (works on ints or arrays)."""
    import numpy as _np
    q = _np.asarray(qscale)
    if luma:
        s = _np.where(q < 5, 8,
                      _np.where(q < 9, 2 * q,
                                _np.where(q < 25, q + 8, 2 * q - 16)))
    else:
        s = _np.where(q < 5, 8,
                      _np.where(q < 25, (q + 13) // 2, q - 6))
    return s.astype(_np.int32) if s.ndim else int(s)


# ---------------------------------------------------------------------- #
# Encoder-side quantization (reference: mpegvideo_enc.c dct_quantize)
# ---------------------------------------------------------------------- #

def mpeg_quant_ref(coeffs: np.ndarray, qscale: int, qmat: np.ndarray,
                   intra: bool, fdct_scale: int = 8) -> np.ndarray:
    """Golden: uniform quant with dead zone for inter.
    coeffs are fdct output (x fdct_scale). Returns quantized levels.
      intra: level = round(c / (2*qscale*qmat/16) / fdct_scale)
      inter: level = trunc-with-deadzone
    We fold everything into integers: div = (2*qscale*qmat[i]*fdct_scale)/16.
    """
    c = coeffs.astype(np.int64)
    div = (2 * qscale * qmat.astype(np.int64) * fdct_scale) // 16
    div = np.maximum(div, 1)
    if intra:
        lvl = np.sign(c) * ((np.abs(c) + div // 2) // div)
    else:
        # dead zone: bias 3/8
        lvl = np.sign(c) * ((np.abs(c) + 3 * div // 8) // div)
    return np.clip(lvl, -2047, 2047).astype(np.int32)


def mpeg_quant(coeffs, qscale, qmat, intra: bool, fdct_scale: int = 8):
    import jax.numpy as jnp
    c = coeffs.astype(jnp.int32)
    q = jnp.asarray(qscale, dtype=jnp.int32)
    while q.ndim < c.ndim:
        q = q[..., None]
    div = jnp.maximum((2 * q * jnp.asarray(qmat, dtype=jnp.int32) * fdct_scale) // 16, 1)
    bias = div // 2 if intra else 3 * div // 8
    return jnp.clip(jnp.sign(c) * ((jnp.abs(c) + bias) // div), -2047, 2047)


def mpeg4_mq_dequant_intra(coeffs, qs, qmat, dcs):
    """MPEG-4 quant_type=1 intra dequant, bitexact variant (reference
    mpegvideo.c:142 dct_unquantize_mpeg2_intra_bitexact as wired for
    MPEG-4): AC = sign*((|l|*qscale*M)>>3), DC = l*dc_scaler, then the
    parity fix block[63] ^= (sum_AC - 1) & 1. coeffs/qmat in the same
    scan order; slot 63 is raster 63 in every scan."""
    import jax.numpy as jnp
    c = coeffs.astype(jnp.int32)
    a = jnp.abs(c)
    deq = jnp.sign(c) * ((a * qs[:, None] * qmat[None, :]) >> 3)
    deq = deq.at[:, 0].set(c[:, 0] * dcs)
    s = deq[:, 1:].sum(axis=1) - 1
    return deq.at[:, 63].set(deq[:, 63] ^ (s & 1))


def mpeg4_mq_dequant_inter(coeffs, qs, qmat):
    """MPEG-4 quant_type=1 inter dequant (reference mpegvideo.c:175
    dct_unquantize_mpeg2_inter_c): sign*(((2|l|+1)*qscale*M)>>4) for
    nonzero l, then block[63] ^= (sum - 1) & 1."""
    import jax.numpy as jnp
    c = coeffs.astype(jnp.int32)
    a = jnp.abs(c)
    deq = jnp.sign(c) * (((2 * a + 1) * qs[:, None] * qmat[None, :]) >> 4)
    s = deq.sum(axis=1) - 1
    return deq.at[:, 63].set(deq[:, 63] ^ (s & 1))
