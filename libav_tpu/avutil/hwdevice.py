"""Device context and host<->HBM residency (reference: libavutil/hwcontext.h:
AVHWDeviceContext :56, AVHWFramesContext :119, av_hwframe_transfer_data :388,
av_hwdevice_ctx_create :298).

In libav a hardware device context owns device memory pools and exposes
transfer ops. Here the "hardware" is the TPU reached through jax; a
DeviceContext pins a jax device (or a Mesh for multi-chip) and provides the
frame-pool equivalent: device-resident plane allocation and async
host<->HBM transfer with double buffering handled by jax's dispatch.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence

import numpy as np


@functools.lru_cache(maxsize=None)
def _jax():
    import jax
    return jax


class DeviceType:
    """reference: hwcontext.h:27 AVHWDeviceType (cuda/vaapi/... -> tpu/cpu)"""
    TPU = "tpu"
    CPU = "cpu"


@dataclass
class DeviceContext:
    """reference: hwcontext.h:56 AVHWDeviceContext"""
    device_type: str = DeviceType.TPU
    device: Any = None        # a jax.Device
    mesh: Any = None          # optional jax.sharding.Mesh for multi-chip

    @staticmethod
    def create(device_type: str = DeviceType.TPU, index: int = 0) -> "DeviceContext":
        """reference: hwcontext.h:298 av_hwdevice_ctx_create"""
        jax = _jax()
        devs = jax.devices()
        if device_type == DeviceType.CPU:
            devs = jax.devices("cpu")
        return DeviceContext(device_type=device_type, device=devs[index % len(devs)])

    def upload(self, arr: np.ndarray):
        """Host -> HBM (reference: av_hwframe_transfer_data, dir up)"""
        return _jax().device_put(arr, self.device)

    def download(self, arr) -> np.ndarray:
        """HBM -> host"""
        return np.asarray(arr)


@dataclass
class FramePool:
    """Device frame pool (reference: hwcontext.h:119 AVHWFramesContext).

    XLA donation + jax's buffer reuse make an explicit free-list mostly
    unnecessary; the pool's real job here is shape bucketing so repeated
    transcodes hit the jit cache instead of recompiling.
    """
    ctx: DeviceContext
    width: int = 0
    height: int = 0
    fmt: str = "yuv420p"

    def alloc(self):
        from libav_tpu.avutil.frame import Frame
        f = Frame.alloc_video(self.width, self.height, self.fmt)
        return f.to_device(self.ctx.device)
