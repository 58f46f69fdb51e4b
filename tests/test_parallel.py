"""Multi-chip sharding dry-run test: __graft_entry__.dryrun_multichip
itself re-execs in a subprocess with JAX_PLATFORMS=cpu and 8 virtual
devices (env must be set before jax import), runs one sharded step of
the REAL H.264 whole-frame reconstruction program over a frame batch,
and cross-checks the sharded planes against single-device recon
bit-exactly. Here we just invoke it under the worst-case env (axon
preset) to prove the driver gate stays green."""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


@pytest.mark.slow
def test_dryrun_multichip_8dev():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
