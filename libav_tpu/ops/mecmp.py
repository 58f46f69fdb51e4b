"""Motion-estimation / mode-decision cost metrics (reference role:
libavcodec/me_cmp.c — sse4/8/16_c, pix_abs16_c (SAD), and the
hadamard8_diff8x8_c SATD butterfly network).

TPU-first shapes: every metric is batched over (N, h, w) block tensors
and jit-compiled; the 8x8 Hadamard runs as two einsum contractions on
the MXU (H @ D @ H^T) — the butterfly network in the reference computes
exactly this transform, and the |coeff| sum is invariant to its output
ordering.
"""

from __future__ import annotations

import functools

import numpy as np


def hadamard_matrix(n: int) -> np.ndarray:
    """Sylvester-construction Hadamard (entries +-1)."""
    h = np.array([[1]], dtype=np.int32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


@functools.lru_cache(maxsize=None)
def _jits():
    import jax
    import jax.numpy as jnp

    h8 = jnp.asarray(hadamard_matrix(8))

    @jax.jit
    def sad(a, b):
        return jnp.abs(a.astype(jnp.int32) -
                       b.astype(jnp.int32)).sum(axis=(-1, -2))

    @jax.jit
    def sse(a, b):
        d = a.astype(jnp.int32) - b.astype(jnp.int32)
        return (d * d).sum(axis=(-1, -2))

    @jax.jit
    def satd8(a, b):
        """hadamard8_diff8x8_c over (N, 8, 8) blocks: sum |H D H^T|."""
        d = a.astype(jnp.int32) - b.astype(jnp.int32)
        t = jnp.einsum("ij,njk,lk->nil", h8, d, h8)
        return jnp.abs(t).sum(axis=(-1, -2))

    @jax.jit
    def satd16(a, b):
        """hadamard8_diff16_c: an 8x8 SATD per quadrant, summed."""
        d = a.astype(jnp.int32) - b.astype(jnp.int32)
        n = d.shape[0]
        q = (d.reshape(n, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4)
             .reshape(n * 4, 8, 8))
        t = jnp.einsum("ij,njk,lk->nil", h8, q, h8)
        return jnp.abs(t).sum(axis=(-1, -2)).reshape(n, 4).sum(axis=1)

    return {"sad": sad, "sse": sse, "satd8": satd8, "satd16": satd16}


def sad(a, b):
    return _jits()["sad"](a, b)


def sse(a, b):
    return _jits()["sse"](a, b)


def satd8(a, b):
    return _jits()["satd8"](a, b)


def satd16(a, b):
    return _jits()["satd16"](a, b)


def hadamard8_diff_ref(src: np.ndarray, dst: np.ndarray) -> int:
    """Literal transcription of the reference butterfly network
    (me_cmp.c:hadamard8_diff8x8_c) for golden-kernel tests."""
    d = (src.astype(np.int64) - dst.astype(np.int64))
    t = d.copy().reshape(8, 8)
    # rows: 3-stage butterflies
    for i in range(8):
        r = t[i]
        a = np.empty(8, np.int64)
        a[0], a[1] = r[0] + r[1], r[0] - r[1]
        a[2], a[3] = r[2] + r[3], r[2] - r[3]
        a[4], a[5] = r[4] + r[5], r[4] - r[5]
        a[6], a[7] = r[6] + r[7], r[6] - r[7]
        b = np.empty(8, np.int64)
        b[0], b[2] = a[0] + a[2], a[0] - a[2]
        b[1], b[3] = a[1] + a[3], a[1] - a[3]
        b[4], b[6] = a[4] + a[6], a[4] - a[6]
        b[5], b[7] = a[5] + a[7], a[5] - a[7]
        c = np.empty(8, np.int64)
        c[0], c[4] = b[0] + b[4], b[0] - b[4]
        c[1], c[5] = b[1] + b[5], b[1] - b[5]
        c[2], c[6] = b[2] + b[6], b[2] - b[6]
        c[3], c[7] = b[3] + b[7], b[3] - b[7]
        t[i] = c
    total = 0
    for i in range(8):
        col = t[:, i].copy()
        a = np.empty(8, np.int64)
        a[0], a[1] = col[0] + col[1], col[0] - col[1]
        a[2], a[3] = col[2] + col[3], col[2] - col[3]
        a[4], a[5] = col[4] + col[5], col[4] - col[5]
        a[6], a[7] = col[6] + col[7], col[6] - col[7]
        b = np.empty(8, np.int64)
        b[0], b[2] = a[0] + a[2], a[0] - a[2]
        b[1], b[3] = a[1] + a[3], a[1] - a[3]
        b[4], b[6] = a[4] + a[6], a[4] - a[6]
        b[5], b[7] = a[5] + a[7], a[5] - a[7]
        total += (abs(b[0] + b[4]) + abs(b[0] - b[4]) +
                  abs(b[1] + b[5]) + abs(b[1] - b[5]) +
                  abs(b[2] + b[6]) + abs(b[2] - b[6]) +
                  abs(b[3] + b[7]) + abs(b[3] - b[7]))
    return int(total)
