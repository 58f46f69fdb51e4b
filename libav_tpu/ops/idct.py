"""Batched 8x8 inverse DCT (reference: libavcodec/idctdsp.c:191,
simple_idct.c:235 — the `-idct simple` IEEE-1180-compliant integer IDCT that
FATE pins for bit-exact tests, and faanidct/jrevdct float variants).

TPU-first design: the reference runs one 8x8 block at a time through a
hand-scheduled butterfly; we batch B blocks and express each 1D IDCT pass as
an 8x8 constant integer matrix applied to all blocks at once:

    rows:  y = (x  @ Mt + 2^(ROW_SHIFT-1))  >> ROW_SHIFT
    cols:  z = (M @ y  + bias)              >> COL_SHIFT

All arithmetic is int32, so results are bit-identical for every batch size
and on every backend — the property FATE enforces across thread counts
(SURVEY.md §4).  int32 dot products over an 8-length axis lower to unrolled
VPU multiply-adds on TPU; the float variant uses the MXU.

Fixed-point scheme (same class as the reference's simple_idct):
  W[k] = round(2^14 * sqrt(2) * cos(k*pi/16)), ROW_SHIFT=11, COL_SHIFT=20,
  with a DC bias that also implements round-half-up. Passes IEEE 1180
  accuracy bounds (tested in tests/test_ops_idct.py).
"""

from __future__ import annotations

import functools
import math

import numpy as np

ROW_SHIFT = 11
COL_SHIFT = 20


def _w(k: int) -> int:
    return round((2 ** 14) * math.sqrt(2) * math.cos(k * math.pi / 16))


@functools.lru_cache(maxsize=None)
def idct_matrix_int() -> np.ndarray:
    """8x8 integer IDCT-III matrix in fixed point: pixels = M @ freq.

    M[x, u] = floor(2^14 * sqrt(2) * c_u * cos((2x+1)u*pi/16) + 0.5) with
    c_0 = 1/sqrt(2), c_u = 1 — i.e. the true orthonormal IDCT matrix scaled
    by s = 2^15.5, so two passes plus the 31-bit total shift restore unit
    scale (s^2 = 2^31). The u=0 column is exactly 2^14, the others are the
    classic W1..W7 cosine constants with their sign pattern.
    """
    M = np.zeros((8, 8), dtype=np.int64)
    for x in range(8):
        for u in range(8):
            cu = 1.0 / math.sqrt(2) if u == 0 else 1.0
            v = (2 ** 14) * math.sqrt(2) * cu * math.cos((2 * x + 1) * u * math.pi / 16)
            M[x, u] = math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)
    return M


@functools.lru_cache(maxsize=None)
def idct_matrix_float() -> np.ndarray:
    """Orthonormal IDCT-III matrix: x = C^T @ X @ C with this C below."""
    C = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        for x in range(8):
            cu = math.sqrt(0.5) if u == 0 else 1.0
            C[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return C


# ---------------------------------------------------------------------- #
# NumPy golden references (the checkasm "call_ref" side)
# ---------------------------------------------------------------------- #

def idct8x8_int_ref(blocks: np.ndarray) -> np.ndarray:
    """Golden reference, int32 exact. blocks: (..., 8, 8) int."""
    M = idct_matrix_int()
    x = blocks.astype(np.int64)
    # row pass: transform along the last (frequency-column) axis
    y = np.einsum("...ij,kj->...ik", x, M) + (1 << (ROW_SHIFT - 1))
    y >>= ROW_SHIFT
    # col pass
    z = np.einsum("ki,...ij->...kj", M, y) + (1 << (COL_SHIFT - 1))
    z >>= COL_SHIFT
    return z.astype(np.int32)


def idct8x8_float_ref(blocks: np.ndarray) -> np.ndarray:
    C = idct_matrix_float()
    return C.T @ blocks.astype(np.float64) @ C


# ---------------------------------------------------------------------- #
# JAX kernels
# ---------------------------------------------------------------------- #

def _jnp():
    import jax.numpy as jnp
    return jnp


def idct8x8_int(blocks):
    """Batched exact integer IDCT. blocks: (B, 8, 8) int32 -> (B, 8, 8) int32.

    Jit-safe, shape-static; used by MJPEG/MPEG-1/2/4 reconstruction.
    """
    jnp = _jnp()
    M = jnp.asarray(idct_matrix_int(), dtype=jnp.int32)
    x = blocks.astype(jnp.int32)
    # rows: y[b, i, k] = sum_j x[b, i, j] * M[k, j]
    y = jnp.einsum("bij,kj->bik", x, M, preferred_element_type=jnp.int32)
    y = (y + (1 << (ROW_SHIFT - 1))) >> ROW_SHIFT
    # cols: z[b, k, j] = sum_i M[k, i] * y[b, i, j]
    z = jnp.einsum("ki,bij->bkj", M, y, preferred_element_type=jnp.int32)
    z = (z + (1 << (COL_SHIFT - 1))) >> COL_SHIFT
    return z


def idct8x8_float(blocks):
    """Float IDCT on the MXU for non-bitexact fast paths."""
    jnp = _jnp()
    C = jnp.asarray(idct_matrix_float(), dtype=jnp.float32)
    x = blocks.astype(jnp.float32)
    return jnp.einsum("ui,buv,vj->bij", C, x, C,
                      preferred_element_type=jnp.float32)


def idct_put(blocks, bias: int = 128):
    """IDCT then clamp to uint8 with +128 level shift
    (reference: idctdsp.c put_pixels_clamped / idct_put)."""
    jnp = _jnp()
    z = idct8x8_int(blocks) + bias
    return jnp.clip(z, 0, 255).astype(jnp.uint8)


def idct_add(blocks, pred):
    """IDCT residual added to prediction, clamped
    (reference: idctdsp.c add_pixels_clamped / idct_add)."""
    jnp = _jnp()
    z = idct8x8_int(blocks) + pred.astype(jnp.int32)
    return jnp.clip(z, 0, 255).astype(jnp.uint8)
