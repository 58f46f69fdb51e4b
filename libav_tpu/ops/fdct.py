"""Batched 8x8 forward DCT (reference: libavcodec/fdctdsp.c,
jfdctint_template.c:398 — the `-dct fastint` integer FDCT FATE pins for
reproducible encodes — and faandct.c float variant).

Same TPU-first shape as ops/idct.py: one constant 8x8 integer matrix applied
to a batch of blocks as two matmul passes, exact int32 arithmetic.

Output convention matches jfdctint's: coefficients are scaled x8 relative to
the orthonormal DCT-II (3 extra fractional bits), which the quantizer
(ops/quant.py) folds into its reciprocal tables — same contract as
mpegvideo_enc's dct_quantize over jfdctint output.

Fixed point: D[u,x] = round(2^14*sqrt(2)*c_u*cos((2x+1)u*pi/16)) (the
transpose of the IDCT matrix), passes shifted 14+14 so the total scale is
2^31 / 2^28 = 8.
"""

from __future__ import annotations

import numpy as np

from libav_tpu.ops.idct import idct_matrix_int, idct_matrix_float

FDCT_ROW_SHIFT = 14
FDCT_COL_SHIFT = 14
FDCT_OUT_SCALE = 8  # output = 8 x orthonormal DCT-II


def fdct_matrix_int() -> np.ndarray:
    return idct_matrix_int().T.copy()


def fdct8x8_int_ref(blocks: np.ndarray) -> np.ndarray:
    """Golden reference. blocks: (..., 8, 8) int (pixel-domain, signed)."""
    D = fdct_matrix_int().astype(np.int64)
    x = blocks.astype(np.int64)
    y = np.einsum("ki,...ij->...kj", D, x) + (1 << (FDCT_ROW_SHIFT - 1))
    y >>= FDCT_ROW_SHIFT
    z = np.einsum("...ij,kj->...ik", y, D) + (1 << (FDCT_COL_SHIFT - 1))
    z >>= FDCT_COL_SHIFT
    return z.astype(np.int32)


def fdct8x8_float_ref(blocks: np.ndarray) -> np.ndarray:
    """Orthonormal float DCT-II (x8 scale), for accuracy comparisons."""
    C = idct_matrix_float()
    return FDCT_OUT_SCALE * (C @ blocks.astype(np.float64) @ C.T)


def fdct8x8_int(blocks):
    """Batched exact integer FDCT. blocks: (B, 8, 8) int -> (B, 8, 8) int32."""
    import jax.numpy as jnp
    D = jnp.asarray(fdct_matrix_int(), dtype=jnp.int32)
    x = blocks.astype(jnp.int32)
    y = jnp.einsum("ki,bij->bkj", D, x, preferred_element_type=jnp.int32)
    y = (y + (1 << (FDCT_ROW_SHIFT - 1))) >> FDCT_ROW_SHIFT
    z = jnp.einsum("bij,kj->bik", y, D, preferred_element_type=jnp.int32)
    z = (z + (1 << (FDCT_COL_SHIFT - 1))) >> FDCT_COL_SHIFT
    return z
