"""FFT / MDCT filterbank ops (reference: libavcodec/fft_template.c (346)
split-radix FFT, mdct_template.c (223) imdct_half — used by AAC
aacdec.c:2425-2427 and AC-3 ac3dec.c:651 — SURVEY.md §2.2).

TPU-first: the reference's split-radix FFT exists because scalar CPUs need
O(N log N) with minimal multiplies. On TPU, transform sizes used by audio
codecs (N = 128..2048) are small enough that a dense cosine-basis matmul on
the MXU is both faster (one fused op over a batch of windows) and exact;
jnp.fft (XLA-native) covers the large-N cases. Both paths are provided;
the matmul path is default for codec blocks.

Conventions (matching ISO 14496-3 §4.6.11.3 for AAC and A/52 §7.9 for
AC-3): imdct(spec (B, N)) -> (B, 2N) time samples including the 2/N
factor; forward mdct(x (B, 2N)) -> (B, N). mdct(imdct) with the TDAC
window overlap-add reconstructs the input exactly (tested).
"""

from __future__ import annotations

import functools
import math

import numpy as np


@functools.lru_cache(maxsize=None)
def _mdct_matrix(N: int) -> np.ndarray:
    """M[k, n] = cos(2*pi/(2N) * ... ) — the (N, 2N) MDCT basis:
    X[k] = sum_n x[n] * cos(pi/N * (n + 0.5 + N/2) * (k + 0.5))."""
    n = np.arange(2 * N)[None, :]
    k = np.arange(N)[:, None]
    return np.cos(math.pi / N * (n + 0.5 + N / 2) * (k + 0.5))


def mdct_ref(x: np.ndarray) -> np.ndarray:
    """Golden forward MDCT. x: (..., 2N) -> (..., N)."""
    N = x.shape[-1] // 2
    M = _mdct_matrix(N)
    return x @ M.T


def imdct_ref(spec: np.ndarray) -> np.ndarray:
    """Golden inverse MDCT with 2/N scale. spec: (..., N) -> (..., 2N)."""
    N = spec.shape[-1]
    M = _mdct_matrix(N)
    return (2.0 / N) * (spec @ M)


def mdct(x):
    """Batched forward MDCT on MXU. x: (B, 2N) float32 -> (B, N).

    Precision HIGHEST: audio filterbanks need true fp32 accumulation —
    the MXU's default bf16 multiply path costs ~3 decimal digits, audible
    after quantizer scaling.
    """
    import jax
    import jax.numpy as jnp
    N = x.shape[-1] // 2
    M = jnp.asarray(_mdct_matrix(N), dtype=jnp.float32)
    return jnp.dot(x.astype(jnp.float32), M.T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def imdct(spec):
    """Batched inverse MDCT (with 2/N) on MXU. (B, N) -> (B, 2N)."""
    import jax
    import jax.numpy as jnp
    N = spec.shape[-1]
    M = jnp.asarray(_mdct_matrix(N), dtype=jnp.float32)
    return (2.0 / N) * jnp.dot(spec.astype(jnp.float32), M,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def imdct_host(spec: np.ndarray) -> np.ndarray:
    """Host (numpy) inverse MDCT with 2/N scale, for latency-bound
    per-block audio transforms (N <= 256): a device round trip per
    256-sample block costs orders of magnitude more than the matmul
    itself, so audio block decode stays on host and only frame-scale
    batches go through `imdct` on the MXU."""
    N = spec.shape[-1]
    M = _mdct_matrix(N)
    return (2.0 / N) * (spec.astype(np.float64) @ M)


# ---------------------------------------------------------------------- #
# Windows (reference: aactab.c KBD windows, sinewin.h; ac3 window ac3tab)
# ---------------------------------------------------------------------- #

@functools.lru_cache(maxsize=None)
def sine_window(L: int) -> np.ndarray:
    """Full MDCT sine window of length L (= 2N for hop N):
    w[n] = sin(pi/L * (n + 0.5)) — symmetric, and w[n]^2 + w[n+L/2]^2 = 1
    (the Princen-Bradley TDAC condition). ISO 14496-3 §4.6.11.3.2."""
    n = np.arange(L)
    return np.sin(math.pi / L * (n + 0.5))


@functools.lru_cache(maxsize=None)
def kbd_window(L: int, alpha: float = 4.0) -> np.ndarray:
    """Kaiser-Bessel-derived window of full length L (ISO 14496-3
    §4.6.11.3.2; AAC uses alpha=4 for long, 6 for short windows).
    Kernel = Kaiser window of length L/2+1 (symmetric about L/4), so the
    cumulative sums satisfy Princen-Bradley w[n]^2 + w[n+L/2]^2 = 1."""
    from libav_tpu.avresample.refexact import _bessel as _bessel_i0
    beta = math.pi * alpha
    half_len = L // 2
    w = np.array([_bessel_i0(beta * math.sqrt(
        max(0.0, 1 - (2.0 * n / half_len - 1) ** 2)))
        for n in range(half_len + 1)])
    c = np.cumsum(w)
    total = c[-1]
    half = np.sqrt(c[:half_len] / total)
    return np.concatenate([half, half[::-1]])


@functools.lru_cache(maxsize=None)
def ac3_window(N: int = 256) -> np.ndarray:
    """A/52 §7.10 Kaiser-Bessel derived window with alpha=5."""
    return kbd_window(N * 2, alpha=5.0)[:N * 2]


def overlap_add_ref(frames: np.ndarray, N: int) -> np.ndarray:
    """TDAC overlap-add of consecutive (B, 2N) windowed IMDCT outputs."""
    B = frames.shape[0]
    out = np.zeros((B + 1) * N)
    for i in range(B):
        out[i * N:(i + 2) * N] += frames[i]
    return out


# ---------------------------------------------------------------------- #
# FFT (XLA-native; for large transforms and spectral tools)
# ---------------------------------------------------------------------- #

def fft(x):
    import jax.numpy as jnp
    return jnp.fft.fft(x)


def rfft(x):
    import jax.numpy as jnp
    return jnp.fft.rfft(x)


def fft_ref(x: np.ndarray) -> np.ndarray:
    return np.fft.fft(x)
