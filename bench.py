#!/usr/bin/env python
"""Headline benchmark: device-side 1080p decode pipeline throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference publishes no absolute numbers; the
north-star target is >=4x realtime 1080p decode per chip = 120 fps at 30 fps
realtime. vs_baseline = achieved_fps / 120.

The measured pipeline is the device half of the batched decoder on a full
1080p frame's worth of macroblocks (dequant -> exact integer 8x8 IDCT ->
clamp), which is the throughput-critical stage shared by MJPEG/MPEG-2/MPEG-4
/H.264 reconstruction. As codec coverage widens this becomes a full
bitstream-in -> frame-out measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from libav_tpu.ops import idct, quant

    # one 1080p yuv420p frame = 1920x1088 luma + 2x 960x544 chroma blocks
    blocks_per_frame = (1920 // 8) * (1088 // 8) + 2 * (960 // 8) * (544 // 8)
    frames_per_batch = 8
    n_blocks = blocks_per_frame * frames_per_batch

    rng = np.random.default_rng(0)
    coeffs = rng.integers(-64, 64, size=(n_blocks, 64)).astype(np.int16)
    qmat = rng.integers(8, 32, size=64).astype(np.int32)

    @jax.jit
    def device_decode(coeffs_scan, qmat):
        deq = quant.jpeg_dequant(coeffs_scan, qmat)
        blocks = quant.dezigzag(deq)
        return idct.idct_put(blocks, bias=128)

    coeffs_d = jax.device_put(coeffs)
    qmat_d = jax.device_put(qmat)

    # warmup/compile
    device_decode(coeffs_d, qmat_d).block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = device_decode(coeffs_d, qmat_d)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    fps = iters * frames_per_batch / dt
    print(json.dumps({
        "metric": "1080p_device_decode_pipeline_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 120.0, 3),
    }))


if __name__ == "__main__":
    main()
