"""Pallas fused-chunk kernel: logic parity via interpret mode on CPU.

On the real chip the kernel compiles through Mosaic; this suite validates
the kernel BODY (same _step_one as the XLA path, VMEM-resident carry,
int32-broadcast masks) in interpreter mode, which runs everywhere."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec
from raytrace_tpu.integrate.solve import _step_one, init_carry
from raytrace_tpu.models import make_env_lat
from raytrace_tpu.ops import rhs as rhs_mod
from raytrace_tpu.ops import pallas_stepper


@pytest.mark.slow  # 30 s: the Pallas kernel is the documented
# correctness/fallback tier (docs/DESIGN.md); parity stays in the full
# suite and in the on-chip bench (pallas_r03.json)
def test_pallas_chunk_matches_xla_steps():
    env = make_env_lat()
    env = type(env)(
        *[v if isinstance(v, (str, tuple)) else float(v) for v in env]
    )
    rhs_fn = lambda u, ff: rhs_mod.rhs_2d_lat(u, ff, env)
    cfg = SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4)
    spec = StopSpec(r_floor=1.0, t_max=5e8 / RE)

    n = 16
    u0 = jnp.stack(
        [
            jnp.full((n,), (RE + 1e6) / RE),
            jnp.linspace(0.5, 0.9, n),
            jnp.zeros((n,)),
            jnp.zeros((n,)),
        ],
        axis=1,
    )
    f = jnp.full((n,), 1000.0)
    carry0 = jax.vmap(lambda u, ff: init_carry(rhs_fn, u, ff, cfg))(u0, f)

    n_steps = 24
    from functools import partial

    step = jax.vmap(
        partial(_step_one, rhs_fn, cfg=cfg, spec=spec, group_idx=3,
                adaptive=True)
    )
    ref = carry0
    for _ in range(n_steps):
        ref = step(ref, f)

    chunk = pallas_stepper.make_pallas_chunk(
        rhs_fn, cfg, spec, 3, True, n_steps, interpret=True
    )
    got = chunk(carry0, f)
    for name in ref._fields:
        # u_lo holds compensated-summation residuals (~1e-17 in f64);
        # interpret-mode op ordering shifts them at that magnitude
        atol = 1e-12 if name == "u_lo" else 0.0
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            rtol=1e-12, atol=atol, err_msg=name,
        )
