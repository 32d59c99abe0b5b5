"""Cross-language parity: JAX production path vs the native C++ float64
oracle (native/src/oracle.cpp -- independent algebra, independent
integrator, the Sundials-role tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu import native
from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
from raytrace_tpu.models import make_env_lat
from raytrace_tpu.ops import gradients, rhs

R0 = (RE + 1.0e6) / RE


@pytest.fixture(scope="module")
def env():
    return make_env_lat()


def test_native_mu_parity(env):
    rng = np.random.default_rng(7)
    r = rng.uniform(R0, 5.0, 200)
    lat = rng.uniform(-1.2, 1.2, 200)
    chi = rng.uniform(-2.0, 2.0, 200)
    f = rng.uniform(500.0, 2.0e4, 200)
    mu_n = native.mu_2d_lat_batch(r, lat, chi, f, env)
    mu_j = np.asarray(
        jax.vmap(lambda a, b, c, d: __import__(
            "raytrace_tpu.ops.dispersion", fromlist=["mu_2d_lat"]
        ).mu_2d_lat(a, b, c, d, env))(
            jnp.asarray(r), jnp.asarray(lat), jnp.asarray(chi), jnp.asarray(f)
        )
    )
    np.testing.assert_allclose(mu_n, mu_j, rtol=1e-10)


def test_native_rhs_parity(env):
    """C++ FD gradients vs JAX autodiff in the assembled RHS."""
    u = np.array([2.3, 0.4, 0.6, 0.0])
    du_n = native.rhs_2d_lat(u, 1500.0, env)
    du_j = np.asarray(rhs.rhs_2d_lat(jnp.asarray(u), 1500.0, env))
    np.testing.assert_allclose(du_n, du_j, rtol=5e-6)


def test_native_rhs_reference_mode_parity(env):
    u = np.array([2.3, 0.4, 0.6, 0.0])
    du_n = native.rhs_2d_lat(u, 1500.0, env, grad_mode=native.GRAD_REFERENCE)
    du_j = np.asarray(
        rhs.rhs_2d_lat(jnp.asarray(u), 1500.0, env,
                       grad_mode=gradients.REFERENCE)
    )
    np.testing.assert_allclose(du_n, du_j, rtol=5e-6)


def test_native_trace_parity(env):
    """Full trajectory: independent integrators converge to the same
    landing state at tight tolerance (the rtol=1e-7 landing spread is
    genuine sensitivity -- verified by a convergence study; at 1e-9 both
    agree to ~1e-5 relative L-shell)."""
    u0 = np.array([R0, np.pi / 4, 0.0, 0.0])
    t_max = 5.0e9 / RE
    res_n = native.trace_2d_lat(
        u0, 1000.0, env, rtol=1e-9, atol=1e-14, t_max=t_max, max_steps=200000
    )
    res_j = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env),
        jnp.asarray(u0)[None], jnp.array([1000.0]),
        cfg=SolverConfig(rtol=1e-9, atol=1e-14, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=t_max),
        max_steps=200000, chunk=256,
    )
    assert res_n["status"] == events.HIT_EARTH
    assert int(res_j.status[0]) == events.HIT_EARTH
    lat_n, lat_j = res_n["u"][1], float(res_j.u[0, 1])
    l_n = res_n["u"][0] / np.cos(lat_n) ** 2
    l_j = float(res_j.u[0, 0]) / np.cos(lat_j) ** 2
    assert abs(l_n / l_j - 1.0) < 1e-4
    assert res_n["u"][3] == pytest.approx(float(res_j.u[0, 3]), rel=1e-5)


def test_native_colat_rhs_parity(env):
    """C++ colatitude-frame RHS vs JAX (the RayMain config frame)."""
    u = np.array([2.3, np.pi / 2 - 0.4, 0.6, 0.0])
    du_n = native.rhs_2d_colat(u, 1500.0, env)
    du_j = np.asarray(rhs.rhs_2d_colat(jnp.asarray(u), 1500.0, env))
    np.testing.assert_allclose(du_n, du_j, rtol=5e-6)


def test_native_colat_trace_parity():
    """RayMain canonical config: native colat trace vs JAX colat trace."""
    from raytrace_tpu.models import make_env_raymain

    env = make_env_raymain()
    u0 = np.array([R0, np.pi / 4, 0.0, 0.0])
    t_max = 5.0e9 / RE
    res_n = native.trace_2d(
        u0, 5000.0, env, frame=native.FRAME_COLAT, rtol=1e-9, atol=1e-14,
        t_max=t_max, max_steps=200000,
    )
    res_j = trace(
        lambda u, ff: rhs.rhs_2d_colat(u, ff, env),
        jnp.asarray(u0)[None], jnp.array([5000.0]),
        cfg=SolverConfig(rtol=1e-9, atol=1e-14, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=t_max),
        max_steps=200000, chunk=256,
    )
    assert res_n["status"] == int(res_j.status[0])
    np.testing.assert_allclose(
        res_n["u"][:2], np.asarray(res_j.u[0, :2]), rtol=1e-3
    )
    assert res_n["u"][3] == pytest.approx(float(res_j.u[0, 3]), rel=1e-4)
