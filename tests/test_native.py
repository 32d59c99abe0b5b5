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
from raytrace_tpu.models import make_env, make_env_lat
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


def test_native_3d_rhs_parity():
    """C++ 7-state FD RHS vs JAX autodiff (the RayTrace_3D config)."""
    from raytrace_tpu.models import make_env

    env3 = make_env()
    u = np.array([R0, np.pi / 4, 0.0, 1.0, 1.0, 0.0, 0.0])
    du_n = native.rhs_3d(u, 1000.0, env3)
    du_j = np.asarray(rhs.rhs_3d(jnp.asarray(u), 1000.0, env3))
    np.testing.assert_allclose(du_n, du_j, rtol=5e-5)


def test_native_3d_trajectory_parity():
    """Config 4 cross-language check: independent 7-state integrators land
    at the same state, including the NEGATIVE group delay inherited from
    the reference's off-shell launch (docs/NOTE_3D_GROUP_DELAY.md)."""
    from raytrace_tpu.models import make_env

    env3 = make_env()
    u0 = np.array([R0, np.pi / 4, 0.0, 1.0, 1.0, 0.0, 0.0])
    t_max = 5.0e9 / RE
    res_n = native.trace_3d(
        u0, 1000.0, env3, rtol=1e-9, atol=1e-12, t_max=t_max,
        max_steps=200000,
    )
    res_j = trace(
        lambda u, ff: rhs.rhs_3d(u, ff, env3),
        jnp.asarray(u0)[None], jnp.array([1000.0]),
        cfg=SolverConfig(rtol=1e-9, atol=1e-12, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=t_max, lat_sign=-1.0,
                      lat_offset=np.pi / 2),
        group_idx=6, max_steps=200000, chunk=256,
    )
    assert res_n["status"] == events.HIT_EARTH
    assert int(res_j.status[0]) == events.HIT_EARTH
    np.testing.assert_allclose(
        res_n["u"][1], float(res_j.u[0, 1]), atol=2e-5
    )
    # both integrators reproduce the negative group delay
    assert res_n["u"][6] < 0.0
    assert float(res_j.u[0, 6]) < 0.0
    assert res_n["u"][6] == pytest.approx(float(res_j.u[0, 6]), rel=1e-3)


def test_consistent_rho0_positive_group_delay():
    """Launching ON the dispersion surface (rho0 = mu * khat) restores the
    physical positive group delay (counterfactual A of the note)."""
    from raytrace_tpu.models import make_env
    from raytrace_tpu.ops import dispersion

    env3 = make_env()
    khat = (1.0 / np.sqrt(2.0), 1.0 / np.sqrt(2.0), 0.0)
    rho0 = dispersion.consistent_rho_3d(R0, np.pi / 4, 0.0, khat, 1000.0, env3)
    assert float(jnp.hypot(rho0[0], rho0[1])) > 100.0  # mu ~ 146, not sqrt(2)
    u0 = np.array([R0, np.pi / 4, 0.0, *[float(x) for x in rho0], 0.0])
    res = trace(
        lambda u, ff: rhs.rhs_3d(u, ff, env3),
        jnp.asarray(u0)[None], jnp.array([1000.0]),
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE, lat_sign=-1.0,
                      lat_offset=np.pi / 2),
        group_idx=6, max_steps=100000, chunk=256,
    )
    assert int(res.status[0]) == events.HIT_EARTH
    assert float(res.u[0, 6]) > 0.0


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


def test_native_trace_parity_duct_multiion():
    """Full-trajectory cross-language check with the extended medium
    (duct + He+/O+ composition): the two independent integrators land the
    same ray through the same extended physics."""
    env_x = make_env(
        b0=3.0696381e-5, duct_amp=0.5, duct_l0=2.6, duct_w=0.25,
        eta_he=0.1, eta_o=0.05,
    )
    u0 = np.array([R0, 0.85, 0.0, 0.0])
    t_max = 2.0e9 / RE
    res_n = native.trace_2d_lat(
        u0, 2000.0, env_x, rtol=1e-9, atol=1e-14, t_max=t_max,
        max_steps=200000,
    )
    res_j = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env_x),
        jnp.asarray(u0)[None], jnp.array([2000.0]),
        cfg=SolverConfig(rtol=1e-9, atol=1e-14, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=t_max),
        max_steps=200000, chunk=256,
    )
    assert res_n["status"] == int(res_j.status[0])
    if res_n["status"] == events.HIT_EARTH:
        l_n = res_n["u"][0] / np.cos(res_n["u"][1]) ** 2
        l_j = float(res_j.u[0, 0]) / np.cos(float(res_j.u[0, 1])) ** 2
        assert abs(l_n / l_j - 1.0) < 1e-4
    assert res_n["u"][3] == pytest.approx(float(res_j.u[0, 3]), rel=1e-4)
    assert res_n["t"] == pytest.approx(float(res_j.t[0]), rel=1e-4)


def _rhs3d_parity_sweep(env_t, n=10, seed=3, rho0=(1.0, 1.0, 0.2),
                        tol=5e-5):
    """Worst relative RHS component error, oracle FD vs fused JAX, over
    random 3D states launched on the dispersion surface."""
    from raytrace_tpu.ops.dispersion import consistent_rho_3d

    rng = np.random.default_rng(seed)
    worst = 0.0
    for _ in range(n):
        r = rng.uniform(1.5, 5.5)
        th = rng.uniform(0.7, 2.1)
        ph = rng.uniform(-3.0, 3.0)
        fq = rng.uniform(800.0, 4000.0)
        rho = consistent_rho_3d(r, th, ph, rho0, fq, env_t)
        u = np.array([r, th, ph, *map(float, rho), 0.0])
        du_n = native.rhs_3d(u, fq, env_t)
        du_j = np.asarray(rhs.rhs_3d(jnp.asarray(u), fq, env_t))
        rel = np.abs(du_n - du_j) / np.maximum(np.abs(du_j), 1e-10)
        worst = max(worst, float(rel.max()))
    assert worst < tol, worst
    return worst


def test_native_3d_rhs_parity_tilted():
    """Oracle env protocol covers the tilted dipole (VERDICT r3 #5): the
    C++ FD chain through its own tilted field + tilted-frame magnetic
    latitude matches the fused JAX RHS, including the dmu/dphi the tilt
    turns on (reference field model: RayTrace_3D.jl:54-66 is the b_sel=0
    limit)."""
    env_t = make_env(b_model="tilted", b_tilt=0.2007, b_tilt_phi=1.0)
    _rhs3d_parity_sweep(env_t, seed=11)


def test_native_3d_rhs_parity_igrf():
    """Degree-3 IGRF field: independent C++ closed-form Schmidt harmonics
    match the JAX b_vec_igrf chain inside the full RHS."""
    env_g = make_env(b_model="igrf")
    _rhs3d_parity_sweep(env_g, seed=12)


def test_native_3d_rhs_parity_gcpm_and_iono_mlt():
    """GCPM plasmasphere + day/night ionosphere blend through the oracle:
    the smooth-knee GCPM medium (the model the reference planned,
    RayMain.jl:99-101) has independent-language RHS parity too."""
    env_g = make_env(ps_model="gcpm", gcpm_bpow=0.5, iono_mlt=True, mlt=6.0)
    # 3e-4: the worst component is the group-delay term (1 + (f/mu)
    # dmu/df)/c near its cancellation point, where the oracle's hf FD
    # step costs ~1e-4 relative; all other components sit below 5e-5
    _rhs3d_parity_sweep(env_g, seed=13, tol=3e-4)


def test_native_2d_refuses_tilted():
    env_t = make_env(b_model="tilted", b_tilt=0.2)
    with pytest.raises(ValueError, match="3D-only"):
        native.rhs_2d_lat(np.array([2.3, 0.4, 0.6, 0.0]), 1500.0, env_t)


def test_native_3d_trajectory_parity_tilted_gcpm():
    """Full-trajectory independent-integrator parity for the extended
    media: a tilted-dipole ray and a GCPM ray, both integrated by the C++
    DP5 oracle and the JAX path at tight tolerance, land together."""
    from raytrace_tpu.ops.dispersion import consistent_rho_3d

    r0 = R0
    th0 = np.pi / 2 - 0.9
    spec = StopSpec(r_floor=1.0, t_max=5e9 / RE, lat_sign=-1.0,
                    lat_offset=np.pi / 2)
    cfg = SolverConfig(rtol=1e-9, atol=1e-13, dt0=1e-4)
    for env_t in (
        make_env(b_model="tilted", b_tilt=0.2007, b_tilt_phi=1.0),
        make_env(ps_model="gcpm", gcpm_bpow=0.5),
    ):
        rho0 = consistent_rho_3d(r0, th0, 0.3, (1.0, 1.0, 0.0), 1000.0,
                                 env_t)
        u0 = np.array([r0, th0, 0.3, *map(float, rho0), 0.0])
        res = trace(lambda u, ff: rhs.rhs_3d(u, ff, env_t),
                    jnp.asarray([u0]), jnp.asarray([1000.0]), cfg=cfg,
                    spec=spec, max_steps=400000, group_idx=6)
        nat = native.trace_3d(u0, 1000.0, env_t, rtol=1e-9, atol=1e-13,
                              t_max=5e9 / RE, max_steps=400000)
        assert int(res.status[0]) == events.HIT_EARTH
        assert nat["status"] == events.HIT_EARTH
        np.testing.assert_allclose(nat["u"][1], float(res.u[0][1]),
                                   atol=5e-7)
        np.testing.assert_allclose(nat["u"][6], float(res.u[0][6]),
                                   rtol=2e-5)
