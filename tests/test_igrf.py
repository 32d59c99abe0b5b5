"""IGRF-truncation field model (models/dipole.py::b_vec_igrf).

Validation chain: the closed-form Schmidt-harmonic field must equal
-autodiff(potential) everywhere (curl-free + correct by construction),
reduce exactly to the axial and tilted dipoles when higher-degree
coefficients vanish, and drive the full 3D ray path through the general
hybrid fused chain (ops/fused.py::mu_and_grads_3d_general; autodiff
parity pinned in tests/test_mlt3d.py).
"""

import jax
import numpy as np
import pytest

from raytrace_tpu.constants import RE
from raytrace_tpu.models import dipole, make_env, medium
from raytrace_tpu.ops import dispersion, rhs

R0 = (RE + 1.0e6) / RE


def _rand_points(n, seed=3):
    rng = np.random.default_rng(seed)
    r = rng.uniform(1.2, 6.0, n)
    theta = rng.uniform(0.3, 2.8, n)
    phi = rng.uniform(-np.pi, np.pi, n)
    return r, theta, phi


def test_igrf_equals_minus_grad_potential():
    coeffs = dipole.IGRF13_2020
    grad_v = jax.grad(dipole.igrf_potential, argnums=(0, 1, 2))
    for r, th, ph in zip(*_rand_points(40)):
        br, bt, bp = (
            float(x) for x in dipole.b_vec_igrf(r, th, ph, coeffs)
        )
        dvr, dvt, dvp = (float(x) for x in grad_v(r, th, ph, coeffs))
        scale = max(abs(br), abs(bt), abs(bp))
        assert br == pytest.approx(-dvr, abs=1e-9 * scale)
        assert bt == pytest.approx(-dvt / r, abs=1e-9 * scale)
        assert bp == pytest.approx(
            -dvp / (r * np.sin(th)), abs=1e-9 * scale
        )


def test_igrf_axial_reduction():
    """Only g10 set: exactly the centered axial dipole."""
    b0 = 3.12e-5
    coeffs = (-b0 * 1.0e9,) + (0.0,) * 14
    for r, th, ph in zip(*_rand_points(25, seed=5)):
        got = dipole.b_vec_igrf(r, th, ph, coeffs)
        want = dipole.b_vec_colat(r, th, ph, b0)
        for g, w in zip(got, want):
            assert float(g) == pytest.approx(float(w), rel=1e-12,
                                             abs=1e-20)


def test_igrf_degree1_is_tilted_dipole():
    """Only degree-1 terms: the tilted centered dipole with the moment
    igrf_dipole extracts."""
    coeffs = dipole.IGRF13_2020[:3] + (0.0,) * 12
    b0, tilt, phi0 = dipole.igrf_dipole(coeffs)
    assert b0 == pytest.approx(2.979e-5, rel=2e-3)   # ~29790 nT epoch 2020
    assert np.degrees(tilt) == pytest.approx(9.41, abs=0.3)
    for r, th, ph in zip(*_rand_points(25, seed=7)):
        got = dipole.b_vec_igrf(r, th, ph, coeffs)
        want = dipole.b_vec_tilted(r, th, ph, b0, tilt, phi0)
        for g, w in zip(got, want):
            assert float(g) == pytest.approx(float(w), rel=1e-9,
                                             abs=1e-14)


def test_igrf_surface_magnitude_sane():
    """Full IGRF-13 truncation: surface field between ~22 and ~67 uT
    (equatorial minimum near the South Atlantic anomaly, polar maximum)."""
    coeffs = dipole.IGRF13_2020
    th = np.linspace(0.05, np.pi - 0.05, 40)
    ph = np.linspace(-np.pi, np.pi, 40)
    tt, pp = np.meshgrid(th, ph)
    br, bt, bp = dipole.b_vec_igrf(1.0, tt.ravel(), pp.ravel(), coeffs)
    bm = np.sqrt(np.asarray(br) ** 2 + np.asarray(bt) ** 2
                 + np.asarray(bp) ** 2)
    assert 1.8e-5 < bm.min() < 3.0e-5
    assert 5.0e-5 < bm.max() < 7.5e-5


def test_igrf_env_and_mu():
    env = make_env(b_model="igrf")
    assert env.b_model == "igrf"
    assert len(env.igrf_coeffs) == 15
    # mu finite and positive at canonical 3D launch states
    for r, th, ph in zip(*_rand_points(10, seed=9)):
        rho = dispersion.consistent_rho_3d(
            r, th, ph, (1.0, 1.0, 0.0), 1000.0, env
        )
        mu = float(dispersion.mu_3d(r, th, ph, *rho, 1000.0, env))
        assert np.isfinite(mu) and mu > 1.0


def test_igrf_rhs_and_short_trace():
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace

    env = make_env(b_model="igrf")
    th0 = np.pi / 4
    rho0 = dispersion.consistent_rho_3d(
        R0, th0, 0.3, (1.0, 1.0, 0.0), 1000.0, env
    )
    u0 = np.array([[R0, th0, 0.3, *map(float, rho0), 0.0]])
    du = np.asarray(rhs.rhs_3d(u0[0], 1000.0, env))
    assert np.all(np.isfinite(du))
    res = trace(
        lambda u, ff: rhs.rhs_3d(u, ff, env), u0, np.array([1000.0]),
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=3.0), group_idx=6,
        max_steps=400,
    )
    assert np.all(np.isfinite(np.asarray(res.u)))
    assert int(res.n_accept[0]) > 10
    # a genuinely non-axisymmetric medium: dmu/dphi != 0
    dmudphi = float(jax.grad(dispersion.mu_3d, argnums=2)(
        2.5, np.pi / 3, 0.7, *map(float, rho0), 1000.0, env
    ))
    assert abs(dmudphi) > 0.0
