"""Batched motion estimation (reference: libavcodec/motion_est.c (1711)
EPZS/diamond search + me_cmp.c SAD/SATD cost functions — SURVEY.md §3.3).

TPU-first: the reference searches one MB at a time with early-exit
heuristics; that shape is hostile to SIMT/XLA. Here ALL macroblocks search
in lockstep: a fixed-iteration large-diamond-to-small-diamond schedule
(log-step pattern search) where each step evaluates a static candidate set
for every MB at once (vmapped dynamic_slice gather + SAD reduce on VPU).
Fixed iteration count = static shapes = one compiled program; redundant
candidates cost VPU cycles, not latency.

Followed by a half-pel refinement step identical to
mpegvideo_enc's hpel ME stage.
"""

from __future__ import annotations

import functools

import numpy as np

from libav_tpu.ops.mc import EDGE


def sad_ref(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Golden SAD (reference: me_cmp.h:40 pix_abs)."""
    return np.abs(a.astype(np.int32) - b.astype(np.int32)).sum(axis=(-1, -2))


# log-step diamond offsets (dx, dy)
_DIAMOND = np.array([(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
                     (1, 1), (1, -1), (-1, 1), (-1, -1)], dtype=np.int32)


@functools.lru_cache(maxsize=16)
def _search_jit(mb_w: int, mb_h: int, search_range: int,
                bounded: bool = False):
    """bounded=True restricts every candidate so the 16x16 patch stays
    fully inside the picture — MPEG-1/2 forbid motion vectors that
    reference pixels outside the coded area (the reference decoder logs
    'MPEG motion vector out of boundary' and zeroes them); H.263/MPEG-4/
    H.264 allow them via edge emulation."""
    import jax
    import jax.numpy as jnp

    nmb = mb_w * mb_h
    # NOTE: closure constants stay numpy — a jnp array created while some
    # outer jit is tracing would capture that trace's tracer and poison
    # this lru-cached closure for later callers.
    xs = ((np.arange(nmb) % mb_w) * 16).astype(np.int32)
    ys = ((np.arange(nmb) // mb_w) * 16).astype(np.int32)
    min_x, max_x = -xs, (mb_w * 16 - 16) - xs
    min_y, max_y = -ys, (mb_h * 16 - 16) - ys
    steps = []
    s = 1
    while s * 2 <= search_range:
        s *= 2
    while s >= 1:
        steps.append(s)
        s //= 2
    offsets = _DIAMOND

    def gather16(padded, y, x):
        return jax.lax.dynamic_slice(padded, (y, x), (16, 16))

    gather_b = jax.vmap(gather16, in_axes=(None, 0, 0))

    def fn(cur_mbs, padded_ref):
        """cur_mbs: (nmb, 16, 16) int32; padded_ref: (H+2E, W+2E).
        Returns full-pel mvs (nmb, 2) int32 and best SAD (nmb,)."""
        mv = jnp.zeros((nmb, 2), dtype=jnp.int32)
        ref = padded_ref.astype(jnp.int32)

        def eval_cand(mvc):
            # clamp candidates into the padded area
            cx = jnp.clip(xs + mvc[:, 0], -EDGE + 0, None) + EDGE
            cy = jnp.clip(ys + mvc[:, 1], -EDGE + 0, None) + EDGE
            cx = jnp.minimum(cx, padded_ref.shape[1] - 16)
            cy = jnp.minimum(cy, padded_ref.shape[0] - 16)
            patches = gather_b(ref, cy, cx)
            return jnp.abs(cur_mbs - patches).sum(axis=(1, 2))

        best = eval_cand(mv)
        for step in steps:
            for k in range(1, len(_DIAMOND)):
                cand = mv + offsets[k] * step
                cand = jnp.clip(cand, -search_range, search_range)
                if bounded:
                    cand = jnp.stack(
                        [jnp.clip(cand[:, 0], min_x, max_x),
                         jnp.clip(cand[:, 1], min_y, max_y)], axis=1)
                sad = eval_cand(cand)
                better = (sad < best)[:, None]
                mv = jnp.where(better, cand, mv)
                best = jnp.minimum(sad, best)
        return mv, best

    return jax.jit(fn)


@functools.lru_cache(maxsize=16)
def _hpel_refine_jit(mb_w: int, mb_h: int, bounded: bool = False):
    import jax
    import jax.numpy as jnp
    from libav_tpu.ops.mc import mc_hpel

    nmb = mb_w * mb_h
    xs = ((np.arange(nmb) % mb_w) * 16).astype(np.int32)
    ys = ((np.arange(nmb) // mb_w) * 16).astype(np.int32)
    # half-pel bounds: odd values below the (even) max still only read
    # up to the last in-picture sample
    min_x, max_x = -2 * xs, 2 * ((mb_w * 16 - 16) - xs)
    min_y, max_y = -2 * ys, 2 * ((mb_h * 16 - 16) - ys)
    offsets = _DIAMOND

    def fn(cur_mbs, padded_ref, fullpel_mv):
        mv = fullpel_mv * 2      # to half-pel units
        best = jnp.full((nmb,), 1 << 30, dtype=jnp.int32)
        out = mv
        for k in range(len(_DIAMOND)):
            cand = mv + offsets[k]
            if bounded:
                cand = jnp.stack(
                    [jnp.clip(cand[:, 0], min_x, max_x),
                     jnp.clip(cand[:, 1], min_y, max_y)], axis=1)
            pred = mc_hpel(padded_ref, xs, ys, cand[:, 0], cand[:, 1], 16)
            sad = jnp.abs(cur_mbs - pred).sum(axis=(1, 2))
            better = sad < best
            out = jnp.where(better[:, None], cand, out)
            best = jnp.minimum(sad, best)
        return out, best

    return jax.jit(fn)


def motion_search(cur_mbs, padded_ref, mb_w: int, mb_h: int,
                  search_range: int = 15):
    """Full-pel diamond search + half-pel refine.
    cur_mbs: (nmb, 16, 16) int32. Returns (mv_halfpel (nmb,2), sad (nmb,))."""
    mv, _ = _search_jit(mb_w, mb_h, search_range)(cur_mbs, padded_ref)
    return _hpel_refine_jit(mb_w, mb_h)(cur_mbs, padded_ref, mv)


def motion_search_ref(cur_mbs: np.ndarray, padded_ref: np.ndarray,
                      mb_w: int, mb_h: int, search_range: int = 15):
    """Golden (slow) exhaustive full-pel search for small tests."""
    nmb = mb_w * mb_h
    mvs = np.zeros((nmb, 2), dtype=np.int32)
    sads = np.zeros(nmb, dtype=np.int32)
    for i in range(nmb):
        x0 = (i % mb_w) * 16 + EDGE
        y0 = (i // mb_w) * 16 + EDGE
        best, bmv = 1 << 30, (0, 0)
        for dy in range(-search_range, search_range + 1):
            for dx in range(-search_range, search_range + 1):
                p = padded_ref[y0 + dy:y0 + dy + 16, x0 + dx:x0 + dx + 16]
                s = sad_ref(cur_mbs[i], p)
                if s < best:
                    best, bmv = s, (dx, dy)
        mvs[i] = bmv
        sads[i] = best
    return mvs, sads
