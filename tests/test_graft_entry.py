"""The driver-facing entry points (__graft_entry__.py) are the one public
surface the round driver actually executes -- test exactly what it calls.

Round-1 postmortem: dryrun_multichip asserted len(jax.devices()) == n and
died on the single-axon-device host (MULTICHIP_r01.json ok=false). It now
self-provisions virtual CPU devices; both the in-process path (enough
devices already, as under this conftest) and the subprocess re-exec path
are covered here.
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


def test_entry_compiles_and_steps():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    carry, f = args
    assert out.u.shape == carry.u.shape
    assert out.status.shape == carry.status.shape


def test_dryrun_multichip_in_process():
    # conftest provisions 8 virtual CPU devices, so this exercises the
    # direct path the driver hits on a real multi-chip slice
    ge.dryrun_multichip(8)


@pytest.mark.slow  # 46 s: the driver itself exercises this re-exec path
# every round via MULTICHIP_r*.json; the in-process variant above keeps
# fast-gate coverage of dryrun_multichip
def test_dryrun_multichip_subprocess_self_provision():
    # more devices than this interpreter has: forces the re-exec path the
    # driver hits on the single-chip host
    ge.dryrun_multichip(16)
