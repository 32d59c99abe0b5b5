"""Pallas TPU kernel: fused multi-step integration chunk.

The native performance tier (SURVEY.md section 2, N1: on TPU the idiomatic
"native" layer is a Pallas/Mosaic kernel, since raw C++ custom-calls do not
run on the TPU device). One kernel launch advances the whole ray batch by
`n_steps` attempted DP5/RK4 steps with the RayCarry resident in VMEM --
no HBM round-trips between steps, no per-step launch overhead.

The kernel body reuses integrate.solve._step_one verbatim (vmapped): the
exact same step math runs in the XLA path and in the kernel, so parity is
by construction and tested to bitwise-level tolerances.

Layout: rays ride the MINORMOST axis inside the kernel -- state vectors as
(n, B), per-ray scalars as (1, B) -- because Mosaic tiles the last dim in
128-lane packs and refuses sub-tile blocks of 1-D arrays (measured:
"change your kernel block shape to (1024)" on a (256,)-blocked f32[1024]).
The ray axis is tiled by a 1-D grid with `block` rays per program so the
per-step intermediate stack (the inlined fused-RHS temporaries x 7 DP5
stages) stays within Mosaic's scoped-VMEM budget (a whole 1024-lane batch
in one block OOMs it; 256-lane blocks fit). The host-facing wrapper keeps
the standard (B, n)/(B,) layout and transposes outside the kernel.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..integrate.solve import RayCarry, _step_one

_N_CARRY = len(RayCarry._fields)
# kernel-layout axis of each carry field: state vectors are (n, B) ->
# vmap over axis 1; per-ray scalars are read as (B,) rows -> axis 0
_VEC = ("u", "k1", "u_prev", "u_lo")
_AXES = RayCarry(**{n: 1 if n in _VEC else 0 for n in RayCarry._fields})


def _chunk_kernel(*refs, rhs_fn, cfg, spec, group_idx, adaptive, n_steps):
    in_refs = refs[: _N_CARRY + 1]
    out_refs = refs[_N_CARRY + 1:]

    def load(name, ref):
        return ref[:] if name in _VEC else ref[0]

    carry = RayCarry(
        *[load(n, r) for n, r in zip(RayCarry._fields, in_refs[:_N_CARRY])]
    )
    f = in_refs[_N_CARRY][0]
    step = jax.vmap(
        partial(
            _step_one, rhs_fn, cfg=cfg, spec=spec, group_idx=group_idx,
            adaptive=adaptive,
        ),
        in_axes=(_AXES, 0), out_axes=_AXES,
    )
    carry = jax.lax.fori_loop(
        0, n_steps, lambda _, c: step(c, f), carry, unroll=False
    )
    for name, ref, val in zip(RayCarry._fields, out_refs, carry):
        if name in _VEC:
            ref[:] = val
        else:
            ref[:] = val[None, :]


def make_pallas_chunk(rhs_fn, cfg, spec, group_idx, adaptive, n_steps,
                      interpret=False, block=256):
    """(carry, f) -> carry advancing n_steps inside one Pallas kernel.

    Inputs alias outputs so the carry is updated in place. Environment
    notes: the tunneled remote-compile service is flaky for Mosaic
    kernels (compile POSTs hang nondeterministically ~50% of attempts) --
    benchmarks/pallas_on_chip.py wraps this in the subprocess-retry
    harness. Env scalars must be Python floats (compile-time constants),
    and the kernel body avoids atan/acos/pow and 1-bit mask reshapes,
    which Mosaic cannot lower."""
    kernel = partial(
        _chunk_kernel, rhs_fn=rhs_fn, cfg=cfg, spec=spec,
        group_idx=group_idx, adaptive=adaptive, n_steps=n_steps,
    )

    def to_kernel(name, x):
        # (B, n) -> (n, B); (B,) -> (1, B)
        return x.T if name in _VEC else x[None, :]

    def from_kernel(name, x):
        return x.T if name in _VEC else x[0]

    def spec_of(x, nb):
        return pl.BlockSpec(
            (x.shape[0], nb), lambda i: (0, i), memory_space=pltpu.VMEM,
        )

    def run(carry: RayCarry, f):
        b = f.shape[0]
        nb = min(block, b)
        assert b % nb == 0, f"batch {b} not divisible by block {nb}"
        names = list(RayCarry._fields) + ["f"]
        flat = [
            to_kernel(n, x) for n, x in zip(names, list(carry) + [f])
        ]
        out_shape = [
            jax.ShapeDtypeStruct(x.shape, x.dtype) for x in flat[:_N_CARRY]
        ]
        out = pl.pallas_call(
            kernel,
            grid=(b // nb,),
            out_shape=out_shape,
            in_specs=[spec_of(x, nb) for x in flat],
            out_specs=[spec_of(x, nb) for x in flat[:_N_CARRY]],
            input_output_aliases={i: i for i in range(_N_CARRY)},
            interpret=interpret,
        )(*flat)
        return RayCarry(
            *[from_kernel(n, x) for n, x in zip(RayCarry._fields, out)]
        )

    return run
