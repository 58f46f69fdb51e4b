"""tpu-av: a TPU-native batched multimedia transcoding framework.

Design (see SURVEY.md for the structural analysis of the libav reference):

- The host does everything serial: container demux/mux, bitstream entropy
  coding (VLC/CABAC), header parsing, DPB/reference management, rate control.
- The device (TPU) does everything numeric, batched over macroblocks and
  frames resident in HBM: dequant, 8x8 DCT/IDCT, motion compensation,
  intra prediction, deblocking, MDCT/FFT filterbanks, colorspace
  conversion/scaling, FIR resampling — as Pallas/XLA kernels.

This inverts libav's execution model (per-macroblock function-pointer DSP on
the host CPU, reference: libavcodec/*dsp*.h) into "entropy-decode the whole
frame into coefficient/MV/mode tensors, then run the numeric pipeline as a
handful of fused device kernels" — the split libav itself defines for
hardware acceleration (reference: libavcodec/avcodec.h:3062-3086 AVHWAccel).

Public API parity targets (reference file:line cited in each module):
  - avutil   -> libav_tpu.avutil   (frames, packets, pixfmt, rational, opt)
  - avcodec  -> libav_tpu.codecs   (send_packet/receive_frame state machine)
  - avformat -> libav_tpu.formats  (open_input/read_frame/mux)
  - swscale  -> libav_tpu.swscale
  - avresample -> libav_tpu.avresample
  - avfilter -> libav_tpu.filters
  - avconv/avprobe -> libav_tpu.tools
"""

__version__ = "0.1.0"

import os as _os

# When the caller pins a CPU run via env (JAX_PLATFORM_NAME=cpu or
# JAX_PLATFORMS=cpu), pin it at the jax-config level too: plugin
# platforms (axon) otherwise still get initialized inside
# xla_bridge.backends() and a wedged device tunnel hangs every CLI
# invocation.  Config-level jax_platforms restricts initialization to
# the named platform entirely.  TPU runs (no cpu pin) are untouched.
_plat = _os.environ.get("JAX_PLATFORM_NAME", "") or \
    _os.environ.get("JAX_PLATFORMS", "")
if _plat.split(",")[0] == "cpu":
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

# Large per-frame host buffers (coefficient transports, block-motion
# exports — freed only after the device transport drops its reference)
# default to mmap-backed allocations above glibc's 128KB threshold, so
# every frame pays fresh-page faults on multi-MB np.empty buffers.
# Raising M_MMAP_THRESHOLD keeps them on the heap where warm pages
# recycle across frames (measured ~1.6 ms/frame on the 1080p decode
# bench).  Safe with the async axon upload: buffers are recycled by
# malloc only after the LAST reference (held by jax through the
# upload) is dropped — unlike in-place pooling, which mutates buffers
# still in flight (see dec.py _reconstruct NOTE).
try:
    import ctypes as _ctypes

    _libc = _ctypes.CDLL(None)
    _libc.mallopt(-3, 1 << 30)       # M_MMAP_THRESHOLD
    _libc.mallopt(-1, 1 << 30)       # M_TRIM_THRESHOLD
except Exception:
    pass

from libav_tpu.avutil.error import AVError  # noqa: F401
