"""ROS2 stiff-tier stepper: order, L-stability, stiff-problem efficiency.

The order conditions were derived by hand (see steppers.ros2_step); these
tests verify them numerically rather than trusting the derivation."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
from raytrace_tpu.integrate.steppers import ros2_step
from raytrace_tpu.models import make_env_lat
from raytrace_tpu.ops import rhs


def test_ros2_order_two():
    """y' = -y^2, y(0)=1 (exact 1/(1+t)): halving dt -> error / 4."""
    def f(u):
        return -u * u

    errs = []
    for n in (50, 100):
        dt = 1.0 / n
        u = jnp.array([1.0])
        k1 = f(u)
        for _ in range(n):
            out = ros2_step(f, u, k1, dt, 1e-8, 1e-12)
            u, k1 = out.u_new, out.k_end
        errs.append(abs(float(u[0]) - 0.5))
    assert errs[0] / errs[1] == pytest.approx(4.0, rel=0.15)


def test_ros2_l_stability():
    """y' = lambda y with h*lambda = -1e8: one step must crush the mode
    (|R(z)| -> 0 as z -> -inf); explicit steppers explode here."""
    lam = -1.0e8

    def f(u):
        return lam * u

    u = jnp.array([1.0])
    out = ros2_step(f, u, f(u), 1.0, 1e-6, 1e-12)
    assert abs(float(out.u_new[0])) < 1e-6


def test_ros2_stiff_decay_accuracy():
    """Stiff relaxation y' = -1e5 (y - cos t): ROS2 tracks the slow
    manifold with large steps and finishes in a few hundred steps; DP5 is
    stability-limited to dt ~ 3e-5 and exhausts a 4000-step budget."""
    LAM = 1.0e5

    def f(u, ff):
        return jnp.stack([
            -LAM * (u[0] - jnp.cos(u[3])), jnp.zeros_like(u[0]),
            jnp.zeros_like(u[0]), jnp.ones_like(u[0]),
        ])

    u0 = jnp.array([[0.0, 0.0, 0.0, 0.0]])
    fr = jnp.array([0.0])
    # rtol 1e-4: a 2(1) pair controls the order-1 embedded error, so its
    # dt scales as sqrt(rtol) -- realistic stiff-solver tolerances
    kw = dict(
        cfg=SolverConfig(rtol=1e-4, atol=1e-7, dt0=1e-3, dt_max=10.0),
        spec=StopSpec(r_floor=-10.0, t_max=3.0),
    )
    ros = trace(f, u0, fr, stepper="ros2", max_steps=4000, **kw)
    dp5 = trace(f, u0, fr, stepper="dopri5", max_steps=4000, **kw)
    exact = float(
        (LAM**2 * np.cos(3.0) + LAM * np.sin(3.0)) / (LAM**2 + 1.0)
    )
    assert int(ros.status[0]) == events.MAX_PHASE_TIME
    assert float(ros.u[0, 0]) == pytest.approx(exact, abs=1e-3)
    assert int(ros.n_accept[0]) < 1500
    # DP5 cannot finish: stability limits dt to ~3.3/LAM, needing ~90k
    # steps for t=3 -- it exhausts the 4000-step budget (reported as
    # MAX_STEPS since round 3; a final result never says ACTIVE)
    assert int(dp5.status[0]) == events.MAX_STEPS


def test_ros2_whistler_trace():
    """The canonical whistler leg integrates correctly under ROS2 and
    agrees with DP5 (both at tight tolerance, fixed leg)."""
    env = make_env_lat()
    u0 = jnp.array([[(RE + 1e6) / RE, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])
    kw = dict(
        spec=StopSpec(r_floor=1.0, t_max=2e7 / RE),
        max_steps=100000,
    )
    ros = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f, stepper="ros2",
        cfg=SolverConfig(rtol=1e-8, atol=1e-12, dt0=1e-4), **kw,
    )
    dp5 = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f, stepper="dopri5",
        cfg=SolverConfig(rtol=1e-10, atol=1e-14, dt0=1e-4), **kw,
    )
    assert int(ros.status[0]) == events.MAX_PHASE_TIME
    np.testing.assert_allclose(
        np.asarray(ros.u[0]), np.asarray(dp5.u[0]), rtol=2e-5, atol=1e-9
    )


def test_ros2x_order_three():
    """Extrapolated ROS2: halving dt -> global error / 8."""
    from raytrace_tpu.integrate.steppers import ros2x_step

    def f(u):
        return -u * u

    errs = []
    for n in (40, 80):
        dt = 1.0 / n
        u = jnp.array([1.0])
        k1 = f(u)
        for _ in range(n):
            out = ros2x_step(f, u, k1, dt, 1e-10, 1e-14)
            u, k1 = out.u_new, out.k_end
        errs.append(abs(float(u[0]) - 0.5))
    assert errs[0] / errs[1] == pytest.approx(8.0, rel=0.25)


def test_ros2x_l_stability():
    from raytrace_tpu.integrate.steppers import ros2x_step

    lam = -1.0e8

    def f(u):
        return lam * u

    u = jnp.array([1.0])
    out = ros2x_step(f, u, f(u), 1.0, 1e-6, 1e-12)
    assert abs(float(out.u_new[0])) < 1e-5


def test_ros4x_order_four():
    """Doubly extrapolated ROS2: halving dt -> global error / 16."""
    from raytrace_tpu.integrate.steppers import ros4x_step

    def f(u):
        return -u * u

    errs = []
    for n in (20, 40):
        dt = 1.0 / n
        u = jnp.array([1.0])
        k1 = f(u)
        for _ in range(n):
            out = ros4x_step(f, u, k1, dt, 1e-12, 1e-16)
            u, k1 = out.u_new, out.k_end
        errs.append(abs(float(u[0]) - 0.5))
    assert errs[0] / errs[1] == pytest.approx(16.0, rel=0.3)


def test_ros4x_stiff_stability():
    from raytrace_tpu.integrate.steppers import ros4x_step

    lam = -1.0e8

    def f(u):
        return lam * u

    u = jnp.array([1.0])
    out = ros4x_step(f, u, f(u), 1.0, 1e-6, 1e-12)
    assert abs(float(out.u_new[0])) < 1e-4


def test_ros4x_tight_tolerance_efficiency():
    """At rtol 1e-9 the order-4 pair needs fewer steps than order 3 on the
    stiff relaxation problem, at better accuracy.

    The margin is ~1.3-2x, NOT the asymptotic rtol^(1/3-1/4) = 5.6x: on
    stiff problems both extrapolants suffer order reduction (the W-method
    stage order is 1, and Richardson cancellation only applies to the
    smooth h-expansion terms, not the stiff boundary-layer terms), so
    ros4x earns its keep on accuracy per step, not raw step count -- see
    steppers.ros4x_step."""
    LAM = 1.0e4

    def f(u, ff):
        return jnp.stack([
            -LAM * (u[0] - jnp.cos(u[3])), jnp.zeros_like(u[0]),
            jnp.zeros_like(u[0]), jnp.ones_like(u[0]),
        ])

    u0 = jnp.array([[0.0, 0.0, 0.0, 0.0]])
    fr = jnp.array([0.0])
    kw = dict(
        cfg=SolverConfig(rtol=1e-9, atol=1e-12, dt0=1e-3, dt_max=10.0),
        spec=StopSpec(r_floor=-10.0, t_max=3.0), max_steps=40000,
    )
    r3 = trace(f, u0, fr, stepper="ros2x", **kw)
    r4 = trace(f, u0, fr, stepper="ros4x", **kw)
    exact = float((LAM**2 * np.cos(3.0) + LAM * np.sin(3.0)) / (LAM**2 + 1.0))
    assert int(r4.status[0]) == events.MAX_PHASE_TIME
    assert float(r4.u[0, 0]) == pytest.approx(exact, abs=1e-6)
    assert int(r4.n_accept[0]) * 5 < int(r3.n_accept[0]) * 4


def test_ros4x_whistler_trace():
    """The canonical whistler leg under ros4x agrees with tight DP5."""
    env = make_env_lat()
    u0 = jnp.array([[(RE + 1e6) / RE, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])
    kw = dict(
        spec=StopSpec(r_floor=1.0, t_max=2e7 / RE),
        max_steps=100000,
    )
    r4 = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f, stepper="ros4x",
        cfg=SolverConfig(rtol=1e-8, atol=1e-12, dt0=1e-4), **kw,
    )
    dp5 = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f, stepper="dopri5",
        cfg=SolverConfig(rtol=1e-10, atol=1e-14, dt0=1e-4), **kw,
    )
    assert int(r4.status[0]) == events.MAX_PHASE_TIME
    np.testing.assert_allclose(
        np.asarray(r4.u[0]), np.asarray(dp5.u[0]), rtol=2e-5, atol=1e-9
    )


def test_ros2x_stiff_efficiency_vs_ros2():
    """At tight tolerance the order-3 pair needs far fewer steps than the
    order-2 pair on the stiff relaxation problem."""
    LAM = 1.0e4

    def f(u, ff):
        return jnp.stack([
            -LAM * (u[0] - jnp.cos(u[3])), jnp.zeros_like(u[0]),
            jnp.zeros_like(u[0]), jnp.ones_like(u[0]),
        ])

    u0 = jnp.array([[0.0, 0.0, 0.0, 0.0]])
    fr = jnp.array([0.0])
    kw = dict(
        cfg=SolverConfig(rtol=1e-7, atol=1e-10, dt0=1e-3, dt_max=10.0),
        spec=StopSpec(r_floor=-10.0, t_max=3.0), max_steps=20000,
    )
    r2 = trace(f, u0, fr, stepper="ros2", **kw)
    r3 = trace(f, u0, fr, stepper="ros2x", **kw)
    exact = float((LAM**2 * np.cos(3.0) + LAM * np.sin(3.0)) / (LAM**2 + 1.0))
    assert int(r3.status[0]) == events.MAX_PHASE_TIME
    assert float(r3.u[0, 0]) == pytest.approx(exact, abs=1e-5)
    assert int(r3.n_accept[0]) * 2 < int(r2.n_accept[0])


def test_solve_nopivot_matches_pivoted_lu():
    """The unrolled unpivoted W-solve (7-state stiff tier) against
    numpy's pivoted LU on random near-identity W = I - h*g*J matrices --
    the regime the no-pivoting argument (every pivot ~ 1) covers."""
    import jax

    from raytrace_tpu.integrate.steppers import _solve_nopivot, _solve_w

    rng = np.random.default_rng(7)
    for n in (3, 5, 7):
        for scale in (1e-3, 0.1, 0.4):
            W = np.eye(n) + scale * rng.standard_normal((n, n))
            b = rng.standard_normal(n)
            x = np.asarray(_solve_nopivot(jnp.asarray(W), jnp.asarray(b)))
            np.testing.assert_allclose(
                x, np.linalg.solve(W, b), rtol=1e-9, atol=1e-12
            )
    # _solve_w dispatches: 4 -> adjugate, else -> unpivoted elimination;
    # both batch cleanly under vmap (no pivoted-LU lowering)
    for n in (4, 7):
        W = np.eye(n)[None] + 0.05 * rng.standard_normal((8, n, n))
        b = rng.standard_normal((8, n))
        xb = np.asarray(jax.vmap(_solve_w)(jnp.asarray(W), jnp.asarray(b)))
        np.testing.assert_allclose(
            xb, np.linalg.solve(W, b[..., None])[..., 0],
            rtol=1e-8, atol=1e-11,
        )


def test_ros2x_7state_whistler_trace():
    """ros2x on the 7-state 3D frame: the W-solves go through the
    unpivoted 7x7 elimination (previously a vmapped pivoted-LU fallback
    measured 30-60x slower). The ray must integrate to the surface with
    physics matching DP5."""
    from raytrace_tpu.models import make_env

    env = make_env()
    u0 = jnp.array(
        [[(RE + 1.0e6) / RE, np.pi / 4, 0.0, 1.0, 1.0, 0.0, 0.0]]
    )
    f = jnp.array([1000.0])
    kw = dict(
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE, lat_sign=-1.0,
                      lat_offset=np.pi / 2),
        group_idx=6, max_steps=4096,
    )
    rhs_fn = lambda u, ff: rhs.rhs_3d(u, ff, env)  # noqa: E731
    res_ros = trace(rhs_fn, u0, f, stepper="ros2x", **kw)
    res_dp5 = trace(rhs_fn, u0, f, stepper="dopri5", **kw)
    assert int(res_ros.status[0]) == int(res_dp5.status[0])
    np.testing.assert_allclose(
        np.asarray(res_ros.u)[0, :2], np.asarray(res_dp5.u)[0, :2],
        rtol=5e-3, atol=5e-3,
    )
