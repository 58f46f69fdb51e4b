"""Test configuration.

Tests run on CPU. NOTE this environment pre-sets JAX_PLATFORMS=axon (the
real-TPU tunnel) and the axon plugin ignores later JAX_PLATFORMS
overrides — JAX_PLATFORM_NAME (and jax.config.update) do work, so we use
those. Running the test matrix through the tunnel is 10-50x slower per
compile (and the integer kernels were incidentally validated bit-exact on
the real chip before this was pinned to CPU).

Multi-chip sharding tests spawn a subprocess with
--xla_force_host_platform_device_count=8 (see test_parallel.py) instead of
forcing it globally: 8 virtual devices multiply XLA's thread pools per
compile and can starve single-core machines.
"""

import os
import sys

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Keep zstandard out of jax's persistent-cache path for the suite: full
# single-process runs segfaulted inside the pjit compilation-cache read
# (zstandard.backend_c decompress) after a few hundred cases — round-3
# weak #2.  With zstandard unimportable jax falls back to zlib, which
# has been stable for full runs.  Must happen before jax imports it.
sys.modules["zstandard"] = None

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compile cache: the suite is compile-bound on 1-core
# machines; cached programs cut a full run by tens of minutes.
# separate dir from the CLI/bench cache: those entries are
# zstd-compressed and this process reads zlib only
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_zlib"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
