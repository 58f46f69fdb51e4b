"""Multi-chip scale-out (SURVEY.md §2.10: the reference is single-node —
its frame/slice threading maps to the device batch axis; scale-out across
chips is data parallelism over independent frames/GOPs/segments on a
jax.sharding.Mesh, with ICI collectives only for global rate-control
statistics).

Components:
  make_mesh()        — device mesh helper ('data' axis over all chips)
  shard_batch()      — place a host batch on the mesh, batch-axis sharded
  sharded_h264_recon_step — the real H.264 whole-frame reconstruction
      program (codecs/h264/device.py) jit-compiled over a frame batch
      with explicit data-parallel shardings + a psum'd rate statistic
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


def sharded_h264_recon_step(mesh, mb_w: int, mb_h: int):
    """The REAL codec pipeline, sharded: a batch of frames (independent
    GOP segments — the reference's frame-threading axis,
    pthread_frame.c:351, promoted to a device batch axis) run through the
    full H.264 device reconstruction program (codecs/h264/device.py:
    residual dequant/IDCT + qpel/chroma MC + intra wavefront assembly),
    data-parallel over the mesh 'data' axis, plus a psum'd global
    coded-bit statistic (the cross-chip collective rate control reads).

    Returns (step_fn, shard_inputs) where step_fn is jit-compiled with
    explicit in/out shardings and shard_inputs places a host arg tuple
    on the mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from libav_tpu.codecs.h264.device import recon_h264_jit

    recon = recon_h264_jit(mb_w, mb_h, True, 1)

    def step(intra, luma_mode, chroma_mode, mv, qp,
             luma_dc, luma_ac, chroma_dc, chroma_ac, ry, ru, rv):
        planes, _padded = jax.vmap(
            lambda *a: recon(*a))(intra, luma_mode, chroma_mode, mv, qp,
                                  luma_dc, luma_ac, chroma_dc, chroma_ac,
                                  ry, ru, rv)
        # global rate statistic: all-reduced across the sharded batch
        bits = (jnp.sum(jnp.abs(luma_ac).astype(jnp.int64)) +
                jnp.sum(jnp.abs(chroma_ac).astype(jnp.int64)))
        return planes, bits

    def dp(ndim):
        return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))

    arg_ndims = (1, 1, 1, 2, 1, 2, 3, 3, 3, 2, 2, 2)
    in_shardings = tuple(dp(n + 1) for n in arg_ndims)
    out_shardings = ((dp(3), dp(3), dp(3)), NamedSharding(mesh, P()))
    fn = jax.jit(step, in_shardings=in_shardings,
                 out_shardings=out_shardings)

    def shard_inputs(args):
        import jax as _jax
        return tuple(_jax.device_put(a, s)
                     for a, s in zip(args, in_shardings))

    return fn, shard_inputs


