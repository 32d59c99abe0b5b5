"""Landing-sensitivity analysis (adaptive variational flow).

Validation strategy: the tangent flow has no closed form, so it is
pinned three ways -- tolerance convergence, agreement with an
independent discretization (frozen-step RK4 replay of the same
trajectory), and the known macroscopic secant behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end suites; fast gate runs -m 'not slow'

from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
from raytrace_tpu.integrate.steppers import rk4_step
from raytrace_tpu.models import make_env_lat
from raytrace_tpu.ops import rhs
from raytrace_tpu.sensitivity import landing_secant, landing_sensitivity

R0 = (RE + 1.0e6) / RE
U0 = np.array([R0, np.pi / 4, 0.0, 0.0])
SPEC = StopSpec(r_floor=1.0, t_max=5.0e9 / RE)


@pytest.fixture(scope="module")
def env():
    return make_env_lat()


@pytest.fixture(scope="module")
def canonical(env):
    rhs_fn = lambda u, ff: rhs.rhs_2d_lat(u, ff, env)
    out = landing_sensitivity(rhs_fn, U0, 1000.0, spec=SPEC)
    return rhs_fn, out


def test_variational_converged_in_tolerance(canonical):
    """The tangent is a property of the exact flow: tightening the
    tolerance by 100x must not move it (measured stable to 6 digits)."""
    rhs_fn, out = canonical
    assert out["status"] == events.HIT_EARTH
    tight = landing_sensitivity(
        rhs_fn, U0, 1000.0, spec=SPEC,
        cfg=SolverConfig(rtol=1e-11, atol=1e-15),
    )
    np.testing.assert_allclose(
        out["jac"][1:], tight["jac"][1:], rtol=1e-4
    )


def test_variational_matches_frozen_replay(canonical):
    """Independent discretization: replay the adaptive trajectory's step
    sizes through plain RK4 and push tangents by autodiff. Same tangent
    flow, different integrator -- must agree to a few percent."""
    rhs_fn, out = canonical
    res = trace(
        rhs_fn, jnp.asarray(U0)[None], jnp.array([1000.0]),
        cfg=SolverConfig(rtol=1e-9, atol=1e-13), spec=SPEC,
        max_steps=200000, save_every=1,
    )
    t = np.concatenate([[0.0], np.asarray(res.traj["t"])[:, 0]])
    dts = jnp.asarray(np.diff(t))

    def final(u0_):
        def body(u, dt):
            o = rk4_step(lambda uu: rhs_fn(uu, 1000.0), u,
                         rhs_fn(u, 1000.0), dt)
            return o.u_new, None
        u_end, _ = jax.lax.scan(body, u0_, dts)
        return u_end

    phi = jax.jacfwd(final)(jnp.asarray(U0))
    u_end = final(jnp.asarray(U0))
    f_end = rhs_fn(u_end, 1000.0)
    proj = jnp.eye(4) - jnp.outer(f_end, jnp.eye(4)[0]) / f_end[0]
    jac_replay = np.asarray(proj @ phi)
    np.testing.assert_allclose(
        jac_replay[1, 1:3], out["jac"][1, 1:3], rtol=0.05
    )


def test_amplification_explains_landing_scatter(canonical):
    """The headline number: the canonical whistler's landing latitude
    amplifies launch-tangent perturbations by thousands -- the
    quantitative basis of the documented landing-scatter quirk
    (~1e4 x tolerance; memory/BASELINE accuracy notes)."""
    _, out = canonical
    assert out["amplification"] > 1.0e3


def test_batched_sensitivity_matches_single(env, canonical):
    """The batched variational tracer must reproduce the single-ray tool
    (same augmented system, vmapped) for the canonical ray."""
    from raytrace_tpu.sensitivity import landing_sensitivity_batch

    rhs_fn, single = canonical
    u0b = np.stack([U0, U0 * np.array([1.0, 0.96, 1.0, 1.0])])
    out = landing_sensitivity_batch(
        rhs_fn, u0b, np.array([1000.0, 1000.0]), spec=SPEC
    )
    assert out["status"][0] == events.HIT_EARTH
    # batch width changes XLA fusion at the last ulp; the ~7e3 tangent
    # amplification magnifies that to ~1e-6 relative -- still 4+ digits
    np.testing.assert_allclose(
        out["jac"][0][1:], single["jac"][1:], rtol=1e-4
    )
    # the second (different) ray must not be a copy of the first
    assert not np.allclose(out["jac"][1], out["jac"][0], rtol=0.1)


def test_explicit_ray_list_launch():
    """RunConfig.rays (the reference's planned ray_start.dat input) builds
    exactly the requested per-ray states, bypassing the grid."""
    from raytrace_tpu.config import RunConfig
    from raytrace_tpu.run import _build_u0

    cfg = RunConfig(rays=((0.5, -0.1, 1000.0), (0.8, 0.2, 2000.0, 1.3)))
    u0, f = _build_u0(cfg, np.float64)
    np.testing.assert_allclose(u0[0], [cfg.r0, 0.5, -0.1, 0.0])
    np.testing.assert_allclose(u0[1], [1.3, 0.8, 0.2, 0.0])
    np.testing.assert_allclose(f, [1000.0, 2000.0])
    # JSON round-trip preserves the ray list
    cfg2 = RunConfig.from_json(cfg.to_json())
    assert cfg2.rays == cfg.rays


def test_secant_vs_tangent_fold_structure(env):
    """Macroscopic response differs from the tangent by orders of
    magnitude on this folded landing map: the finite-window secant at
    h = 1e-6 is O(1) while the tangent is O(1e3) -- both are real (see
    module docstring); the tool must expose both."""
    rhs_fn = lambda u, ff: rhs.rhs_2d_lat(u, ff, env)
    sec = landing_secant(rhs_fn, U0, 1000.0, index=1, h=1e-6, spec=SPEC)
    assert abs(sec) < 50.0
