"""Native (C) host-side hot loops, compiled on demand via cffi.

Role in the architecture (SURVEY.md §2.10): the reference's 'native'
components split into (a) data-parallel DSP inner loops — those become
Pallas/XLA kernels in libav_tpu.ops — and (b) serial bitstream code
(entropy decode/encode), which must stay on the host and is the CPU-bound
part of the pipeline. This package holds (b): C implementations of the
frame-rate scan/slice entropy loops, each with a pure-Python reference
implementation in its codec package that produces identical tensors.

Build model: sources live here; `build.py` compiles one shared library the
first time a fast path is requested (cached under ~/.cache or repo build/).
Everything degrades gracefully to the Python path when a compiler is
unavailable.
"""
