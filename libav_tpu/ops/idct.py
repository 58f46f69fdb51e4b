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

@functools.lru_cache(maxsize=None)
def simple_idct_matrix() -> np.ndarray:
    """The `-idct simple` effective 8x8 matrix: identical cosine table to
    idct_matrix_int but with |16384| entries (the u=0 and u=4 columns)
    replaced by the reference's W4=16383 constant
    (simple_idct_template.c:53 '#define W4 16383')."""
    M = idct_matrix_int().copy()
    M = np.where(M == 16384, 16383, np.where(M == -16384, -16383, M))
    return M


_COL_BIAS = 16383 * ((1 << (COL_SHIFT - 1)) // 16383)   # W4*((1<<19)/W4)


def _wrap16_np(x):
    return ((x.astype(np.int64) + 0x8000) & 0xFFFF) - 0x8000


def _wrap32_np(x):
    # the C accumulates in (wrapping) int32; mod-2^32 of the exact sum
    # is identical regardless of association order
    return ((x.astype(np.int64) + 0x80000000) & 0xFFFFFFFF) - 0x80000000


def idct8x8_int_ref(blocks: np.ndarray) -> np.ndarray:
    """Golden reference, bit-exact to the reference decoder's
    `-idct simple` (simple_idct_template.c, BIT_DEPTH 8): W4=16383 table,
    row pass +1024>>11 with per-row DC-only shortcut (dc<<3) and int16
    wraparound (the C stores rows back into int16_t), column pass with
    bias W4*((1<<19)/W4) and >>20. blocks: (..., 8, 8) int."""
    M = simple_idct_matrix()
    x = _wrap16_np(np.asarray(blocks))
    y = _wrap32_np(np.einsum("...ij,kj->...ik", x, M)
                   + (1 << (ROW_SHIFT - 1))) >> ROW_SHIFT
    dc_only = (x[..., 1:] == 0).all(axis=-1)
    dc_row = _wrap16_np(x[..., 0] << 3)
    y = np.where(dc_only[..., None], dc_row[..., None], y)
    y = _wrap16_np(y)
    z = _wrap32_np(np.einsum("ki,...ij->...kj", M, y)
                   + _COL_BIAS) >> COL_SHIFT
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
    """Batched integer IDCT, bit-exact to the reference's `-idct simple`
    (see idct8x8_int_ref). blocks: (B, 8, 8) int32 -> (B, 8, 8) int32.

    Jit-safe, shape-static; used by MJPEG/MPEG-1/2/4 reconstruction.
    FATE pins this IDCT for bit-exact decode parity, so framecrc
    cross-validation against the reference decoder requires these exact
    rounding/wraparound semantics (including the per-row DC shortcut and
    the int16 row storage the C version has implicitly).

    On TPU at frame-scale batches the coefficient-major Pallas kernel
    is selected (1.4-1.6x vs the einsum — see BASELINE.md round-3
    measurement); results are bit-identical either way.
    """
    import jax
    B = blocks.shape[0]
    if jax.default_backend() == "tpu" and B >= 3072:
        return _idct8x8_int_pallas(blocks)
    jnp = _jnp()

    def wrap16(v):
        return ((v + 0x8000) & 0xFFFF) - 0x8000

    M = jnp.asarray(simple_idct_matrix(), dtype=jnp.int32)
    x = wrap16(blocks.astype(jnp.int32))
    # rows: y[b, i, k] = sum_j x[b, i, j] * M[k, j]
    y = jnp.einsum("bij,kj->bik", x, M, preferred_element_type=jnp.int32)
    y = (y + (1 << (ROW_SHIFT - 1))) >> ROW_SHIFT
    dc_only = (x[..., 1:] == 0).all(axis=-1)          # (B, 8) per row
    dc_row = wrap16(x[..., 0] << 3)
    y = jnp.where(dc_only[..., None], dc_row[..., None], y)
    y = wrap16(y)
    # cols: z[b, k, j] = sum_i M[k, i] * y[b, i, j]
    z = jnp.einsum("ki,bij->bkj", M, y, preferred_element_type=jnp.int32)
    z = (z + _COL_BIAS) >> COL_SHIFT
    return z


def _idct8x8_int_pallas(blocks):
    """Coefficient-major Pallas IDCT: sublanes = 64 coefficient slots,
    lanes = blocks, so each butterfly step is one full-width VPU MAC
    (measured 1.4-1.6x vs XLA einsum at >=3k-block batches)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = np.asarray(simple_idct_matrix(), np.int64)
    LANES = 128
    B = blocks.shape[0]
    Bp = (B + LANES - 1) // LANES * LANES

    def wrap16(v):
        return ((v + 0x8000) & 0xFFFF) - 0x8000

    def kernel(x_ref, o_ref):
        x = wrap16(x_ref[:])                       # (64, LANES) int32
        rows = []
        for r in range(8):
            seg = x[8 * r:8 * r + 8, :]
            outs = []
            dc_only = ((seg[1, :] == 0) & (seg[2, :] == 0) &
                       (seg[3, :] == 0) & (seg[4, :] == 0) &
                       (seg[5, :] == 0) & (seg[6, :] == 0) &
                       (seg[7, :] == 0))
            dc_row = wrap16(seg[0, :] << 3)
            for k in range(8):
                a = jnp.full((LANES,), 1 << (ROW_SHIFT - 1), jnp.int32)
                for j in range(8):
                    w = int(M[k, j])
                    if w:
                        a = a + seg[j, :] * w
                outs.append(wrap16(jnp.where(dc_only, dc_row,
                                             a >> ROW_SHIFT)))
            rows.append(jnp.stack(outs))
        y = jnp.concatenate(rows, axis=0)          # (64, LANES)
        outs = []
        for k in range(8):
            accs = [jnp.full((LANES,), _COL_BIAS, jnp.int32)
                    for _ in range(8)]
            for i in range(8):
                w = int(M[k, i])
                if w:
                    for c in range(8):
                        accs[c] = accs[c] + y[8 * i + c, :] * w
            outs.extend(a >> COL_SHIFT for a in accs)
        o_ref[:] = jnp.stack(outs)

    x = blocks.astype(jnp.int32).reshape(B, 64)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    zT = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, Bp), jnp.int32),
        grid=(Bp // LANES,),
        in_specs=[pl.BlockSpec((64, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(x.T)
    return zT.T[:B].reshape(B, 8, 8)


def idct8x8_float(blocks):
    """Float IDCT on the MXU for non-bitexact fast paths."""
    jnp = _jnp()
    C = jnp.asarray(idct_matrix_float(), dtype=jnp.float32)
    x = blocks.astype(jnp.float32)
    return jnp.einsum("ui,buv,vj->bij", C, x, C,
                      preferred_element_type=jnp.float32)


def idct_put(blocks, bias: int = 0):
    """IDCT then clamp to uint8 (reference: simple_idct idctSparseColPut /
    idctdsp.c idct_put). Intra codecs carry the +128 level shift inside
    the DC coefficient (e.g. mjpegdec.c last_dc = 1024), matching the
    reference's rounding exactly; `bias` exists only for synthetic
    tests."""
    jnp = _jnp()
    z = idct8x8_int(blocks) + bias
    return jnp.clip(z, 0, 255).astype(jnp.uint8)


def idct_add(blocks, pred):
    """IDCT residual added to prediction, clamped
    (reference: idctdsp.c add_pixels_clamped / idct_add)."""
    jnp = _jnp()
    z = idct8x8_int(blocks) + pred.astype(jnp.int32)
    return jnp.clip(z, 0, 255).astype(jnp.uint8)
