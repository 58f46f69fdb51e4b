"""Multi-chip scale-out (SURVEY.md §2.10: the reference is single-node —
its frame/slice threading maps to the device batch axis; scale-out across
chips is data parallelism over independent frames/GOPs/segments on a
jax.sharding.Mesh, with ICI collectives only for global rate-control
statistics).

Components:
  make_mesh()        — device mesh helper ('data' axis over all chips)
  shard_batch()      — place a host batch on the mesh, batch-axis sharded
  sharded_decode_step / sharded_transcode_step — pjit-compiled whole-batch
      device programs (the multi-chip versions of the per-frame programs
      in codecs/*/device)
  BatchScheduler     — packs independent jobs (frames/GOP segments) into
      fixed-size device batches so repeated shapes hit the jit cache
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np


def make_mesh(n_devices: Optional[int] = None, axis: str = "data"):
    """Mesh over the first n devices (all by default)."""
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis,))


def shard_batch(mesh, arr, batch_axis: int = 0):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = [None] * np.ndim(arr)
    spec[batch_axis] = "data"
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def replicate(mesh, arr):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.device_put(arr, NamedSharding(mesh, P()))


@functools.lru_cache(maxsize=16)
def sharded_mjpeg_decode_step(mesh_shape: int, blocks_h: int, blocks_w: int):
    """Multi-chip batched MJPEG device decode: (B, nb, 64) zigzag coeffs
    (B sharded over chips) + qmat -> (B, H, W) planes + a psum'd global
    activity statistic (the cross-chip collective rate control reads)."""
    import jax
    import jax.numpy as jnp
    from libav_tpu.ops import idct, quant

    nb = blocks_h * blocks_w

    def step(coeffs, qmat):
        B = coeffs.shape[0]
        deq = coeffs.reshape(B * nb, 64).astype(jnp.int32) * qmat.astype(jnp.int32)
        blocks = quant.dezigzag(deq)
        pix = idct.idct_put(blocks, bias=128)
        planes = (pix.reshape(B, blocks_h, blocks_w, 8, 8)
                  .transpose(0, 1, 3, 2, 4)
                  .reshape(B, blocks_h * 8, blocks_w * 8))
        activity = jnp.sum(jnp.abs(deq).astype(jnp.int64))
        return planes, activity

    return jax.jit(step)


@functools.lru_cache(maxsize=16)
def sharded_transcode_step(blocks_h: int, blocks_w: int):
    """Decode -> re-encode device core over a sharded frame batch
    (the multi-chip flagship step used by __graft_entry__)."""
    import jax
    import jax.numpy as jnp
    from libav_tpu.ops import fdct, idct, quant

    nb = blocks_h * blocks_w

    def step(coeffs, dec_qmat, enc_qmat):
        B = coeffs.shape[0]
        deq = coeffs.reshape(B * nb, 64).astype(jnp.int32) * \
            dec_qmat.astype(jnp.int32)
        blocks = quant.dezigzag(deq)
        pixels = idct.idct_put(blocks, bias=128)
        resid = pixels.astype(jnp.int32) - 128
        recoeff = fdct.fdct8x8_int(resid)
        levels = quant.jpeg_quant(
            recoeff.reshape(B * nb, 64) // fdct.FDCT_OUT_SCALE, enc_qmat)
        bits_proxy = jnp.sum(jnp.abs(levels).astype(jnp.int64))
        return (pixels.reshape(B, nb, 8, 8),
                levels.reshape(B, nb, 64), bits_proxy)

    return jax.jit(step)


class BatchScheduler:
    """Packs independent work items into fixed-size batches (shape
    bucketing keeps the jit cache hot; the reference's analogue is the
    frame-threading packet round-robin, pthread_frame.c:351)."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self._pending: List[Any] = []

    def submit(self, item) -> Optional[List[Any]]:
        self._pending.append(item)
        if len(self._pending) >= self.batch_size:
            batch, self._pending = self._pending[:self.batch_size], \
                self._pending[self.batch_size:]
            return batch
        return None

    def flush(self) -> List[Any]:
        batch, self._pending = self._pending, []
        return batch
