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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent XLA compile cache for the suite (round-3 weak #2, and
# this round's re-investigation): full single-process runs segfault
# intermittently INSIDE the persistent-cache machinery — round 3 in
# the cache read (get_executable_and_time -> zstd decompress), this
# round in the cache write (`executable.serialize()` at
# compilation_cache.py:265) even with zstandard neutralized.  The
# stored AOT executables also carry machine-feature sets the loader
# warns may SIGILL on other hosts.  The in-process pjit cache still
# dedupes every program within the run; the persistent cache only
# saved time ACROSS runs and is not worth a crashing gate.
