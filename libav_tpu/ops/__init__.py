"""Device kernel layer (reference: libavcodec's ~46 *dsp* function-pointer
modules + libswscale/libavresample inner loops — SURVEY.md §2.2).

Where libav fills a DSPContext struct with C/SIMD function pointers at init
(ff_*dsp_init with per-arch overrides), this package exposes jitted
JAX/Pallas kernels operating on *batched* tensors: the batch axis is
macroblocks-within-a-frame or frames-within-a-job, resident in HBM.

Conventions:
  - Integer transforms are exact int32 arithmetic => bit-identical results
    on TPU and CPU, across any batch size (the determinism FATE enforces
    across thread counts, SURVEY.md §4).
  - Shapes are static; data-dependent work (which blocks are coded, motion
    vector targets) arrives as dense tensors + masks/gather indices so XLA
    never sees dynamic shapes.
  - Every kernel has a NumPy golden reference in tests (the checkasm
    pattern, reference: tests/checkasm/checkasm.h:76-150).
"""
