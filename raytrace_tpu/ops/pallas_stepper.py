"""Pallas TPU kernel: fused multi-step integration chunk.

The native performance tier (SURVEY.md section 2, N1: on TPU the idiomatic
"native" layer is a Pallas/Mosaic kernel, since raw C++ custom-calls do not
run on the TPU device). One kernel launch advances the whole ray batch by
`n_steps` attempted DP5/RK4 steps with the full RayCarry resident in VMEM
-- no HBM round-trips between steps, no per-step launch overhead.

The kernel body reuses integrate.solve._step_one verbatim (vmapped): the
exact same step math runs in the XLA path and in the kernel, so parity is
by construction and tested to bitwise-level tolerances.
"""

from functools import partial

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..integrate.solve import RayCarry, _step_one

_N_CARRY = len(RayCarry._fields)


def _chunk_kernel(*refs, rhs_fn, cfg, spec, group_idx, adaptive, n_steps):
    in_refs = refs[: _N_CARRY + 1]
    out_refs = refs[_N_CARRY + 1:]
    carry = RayCarry(*[r[:] for r in in_refs[:_N_CARRY]])
    f = in_refs[_N_CARRY][:]
    step = jax.vmap(
        partial(
            _step_one, rhs_fn, cfg=cfg, spec=spec, group_idx=group_idx,
            adaptive=adaptive,
        )
    )
    carry = jax.lax.fori_loop(
        0, n_steps, lambda _, c: step(c, f), carry, unroll=False
    )
    for ref, val in zip(out_refs, carry):
        ref[:] = val


def make_pallas_chunk(rhs_fn, cfg, spec, group_idx, adaptive, n_steps,
                      interpret=False):
    """(carry, f) -> carry advancing n_steps inside one Pallas kernel.

    The whole batch lives in VMEM for the duration (a 10k-ray carry is
    ~0.6 MB -- far under the ~16 MB VMEM budget). Inputs are aliased to
    outputs so the carry is updated in place.

    NOTE on this environment: the tunneled axon remote-compile service is
    flaky for Mosaic kernels (a compile POST hangs nondeterministically,
    ~50% of attempts, independent of kernel content -- reproduced down to
    trivial one-op kernels). The XLA jit path never exhibits this, so the
    production bench stays on XLA; this kernel is validated in interpret
    mode (tests/test_pallas.py) and usable on hardware with a working
    Mosaic toolchain. Env scalars must be Python floats (compile-time
    constants), and the kernel body avoids atan/acos/pow and 1-bit mask
    reshapes, all of which Mosaic cannot lower."""
    kernel = partial(
        _chunk_kernel, rhs_fn=rhs_fn, cfg=cfg, spec=spec,
        group_idx=group_idx, adaptive=adaptive, n_steps=n_steps,
    )

    def run(carry: RayCarry, f):
        flat = list(carry) + [f]
        out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in carry]
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * _N_CARRY,
            input_output_aliases={i: i for i in range(_N_CARRY)},
            interpret=interpret,
        )(*flat)
        return RayCarry(*out)

    return run
