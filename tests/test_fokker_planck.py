"""Bounce-averaged pitch-angle Fokker-Planck solver (fokker_planck.py).

The operator and time-stepper are pinned by exact structure (conservation,
self-adjointness in the G inner product, Thomas-vs-dense identity), by the
analytic constant-coefficient slab eigenvalue, by Crank-Nicolson's
second-order convergence, and -- end to end -- by the host-side dense
eigensolve agreeing to roundoff with the jitted inverse-iteration
precipitation lifetime on a real diffusion.bounce_averaged profile."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu import diffusion, fokker_planck as fp
from raytrace_tpu.constants import FCE_E
from raytrace_tpu.diffusion import WaveSpectrum
from raytrace_tpu.models import medium


def test_bounce_time_factor_limits():
    """T(90 deg) = pi sqrt(2)/6 (the equatorial harmonic bounce limit --
    the dipole well curvature gives omega_b^2 = 9 mu B''/m, hence this
    closed form); T monotone decreasing in a_eq; the small-a_eq plateau
    agrees with the classic ~1.38 dipole value via the 1%-accurate fit the
    bounce-average test already validated."""
    aeq = np.radians(np.array([5.0, 20.0, 45.0, 70.0, 89.999]))
    t = fp.bounce_time_factor(aeq)
    assert abs(t[-1] - math.pi * math.sqrt(2.0) / 6.0) < 1e-3
    assert (np.diff(t) < 0.0).all()
    t_fit = 1.3802 - 0.3198 * (np.sin(aeq) + np.sqrt(np.sin(aeq)))
    np.testing.assert_allclose(t, t_fit, rtol=0.015)


def _dipole_g(alpha_lc, n_cells):
    centers, faces, da = fp.make_grid(alpha_lc, n_cells)
    g_c = fp.bounce_time_factor(centers) * np.sin(centers) * np.cos(centers)
    g_f = fp.bounce_time_factor(faces) * np.sin(faces) * np.cos(faces)
    return centers, faces, da, g_c, np.maximum(g_f, 1e-12)


def test_reflecting_walls_conserve_particles():
    """Zero-flux walls on both sides: N = int f G da is conserved to
    roundoff over many CN steps (the flux form is exactly conservative)."""
    centers, faces, da, g_c, g_f = _dipole_g(np.radians(5.0), 96)
    rng = np.random.default_rng(3)
    d_f = 1.0e-3 * (1.0 + 0.5 * np.sin(3.0 * faces))
    tri = fp.build_operator(jnp.asarray(d_f), jnp.asarray(g_c),
                            jnp.asarray(g_f), da,
                            left_bc="reflecting", right_bc="reflecting")
    f0 = jnp.asarray(rng.random(96) + 0.1)
    f1 = fp.evolve_cn(f0, tri, dt=20.0, n_steps=500)
    n0 = float(fp.content(f0, jnp.asarray(g_c), da))
    n1 = float(fp.content(f1, jnp.asarray(g_c), da))
    assert abs(n1 / n0 - 1.0) < 1e-12
    # and the zero-flux steady state is reachable: f flattens. Steps must
    # stay moderate: Crank-Nicolson is A- but not L-stable, so lambda dt >>
    # 1 modes flip sign with |factor| just under 1 instead of dying.
    f_inf = fp.evolve_cn(f0, tri, dt=5.0, n_steps=20000)
    assert float(jnp.std(f_inf) / jnp.mean(f_inf)) < 1e-6


def test_operator_self_adjoint_in_g():
    """G_i A_ij = G_j A_ji: the FV flux form is symmetric under the G
    inner product (what makes the spectrum real and the decay monotone)."""
    centers, faces, da, g_c, g_f = _dipole_g(np.radians(8.0), 64)
    d_f = 1.0e-3 * (1.0 + 0.9 * np.cos(faces))
    lower, diag, upper = fp.build_operator(d_f, g_c, g_f, da)
    a = (np.diag(diag) + np.diag(lower[1:], -1) + np.diag(upper[:-1], 1))
    ga = g_c[:, None] * a
    np.testing.assert_allclose(ga, ga.T, rtol=1e-10, atol=1e-18)


def test_constant_coefficient_slab_eigenvalue():
    """G = 1, D = const, absorbing left / reflecting right on a span of
    length L: lambda_1 = D (pi / 2L)^2 exactly (lowest sin((pi/2)(x/L))
    mode). Dense eigensolve of the assembled operator must match to the
    O(da^2) discretization error."""
    n = 256
    a_lc = 0.3
    centers, faces, da = fp.make_grid(a_lc, n)
    span = 0.5 * math.pi - a_lc
    d0 = 2.5e-3
    ones_c, ones_f = np.ones(n), np.ones(n + 1)
    lower, diag, upper = fp.build_operator(d0 * ones_f, ones_c, ones_f, da)
    a = np.diag(diag) + np.diag(lower[1:], -1) + np.diag(upper[:-1], 1)
    lam1 = np.min(np.linalg.eigvalsh(-(a + a.T) / 2.0))
    lam_exact = d0 * (math.pi / (2.0 * span)) ** 2
    assert abs(lam1 / lam_exact - 1.0) < 2e-4


def test_cn_evolution_matches_exact_mode_decay_second_order():
    """Seed the exact slab eigenmode; CN must decay it as exp(-lambda t)
    with an error that shrinks ~4x when dt is halved (second order)."""
    n = 128
    a_lc = 0.3
    centers, faces, da = fp.make_grid(a_lc, n)
    span = 0.5 * math.pi - a_lc
    d0 = 2.0e-3
    ones_c, ones_f = np.ones(n), np.ones(n + 1)
    tri = tuple(jnp.asarray(v) for v in
                fp.build_operator(d0 * ones_f, ones_c, ones_f, da))
    # discrete lowest mode from the dense operator (exact for this matrix)
    a = np.diag(np.asarray(tri[1])) + np.diag(np.asarray(tri[0])[1:], -1) \
        + np.diag(np.asarray(tri[2])[:-1], 1)
    w, v = np.linalg.eigh(-(a + a.T) / 2.0)
    lam, mode = w[0], np.abs(v[:, 0])
    t_end = 0.5 / lam
    errs = []
    for n_steps in (50, 100):
        f1 = fp.evolve_cn(jnp.asarray(mode), tri, t_end / n_steps, n_steps)
        decay = float(np.mean(np.asarray(f1) / mode))
        errs.append(abs(decay - math.exp(-lam * t_end)))
    assert errs[0] / errs[1] > 3.0, errs


def test_thomas_matches_dense_solve_batched():
    """The scan Thomas sweep equals numpy.linalg.solve on random
    diagonally-dominant batched tridiagonal systems."""
    rng = np.random.default_rng(7)
    n, batch = 40, 3
    lo = rng.standard_normal((batch, n))
    up = rng.standard_normal((batch, n))
    lo[:, 0] = 0.0
    up[:, -1] = 0.0
    dg = 2.0 + np.abs(lo) + np.abs(up) + rng.random((batch, n))
    b = rng.standard_normal((batch, n))
    x = np.asarray(fp.thomas_solve(jnp.asarray(lo), jnp.asarray(dg),
                                   jnp.asarray(up), jnp.asarray(b)))
    for i in range(batch):
        a = (np.diag(dg[i]) + np.diag(lo[i, 1:], -1) + np.diag(up[i, :-1], 1))
        np.testing.assert_allclose(x[i], np.linalg.solve(a, b[i]),
                                   rtol=1e-10, atol=1e-12)


def _real_daa_profile(n_cells=96):
    """<D_aa>(alpha_eq) on the framework's L = 4 medium, hiss-like band."""
    env = medium.make_env_lat()
    l_shell = 4.0
    bm = float(medium.b_mag(l_shell, 0.0, env))
    fce = FCE_E * bm
    spec = WaveSpectrum(bw_t=300e-12, f_m=0.15 * fce, df=0.10 * fce,
                        f_lc=0.05 * fce, f_uc=0.50 * fce)
    rl = 1.0 / l_shell
    a_lc = math.asin(math.sqrt(rl**3 / math.sqrt(4.0 - 3.0 * rl)))
    centers, _, _ = fp.make_grid(a_lc, n_cells)
    ba = diffusion.bounce_averaged(100.0, centers, l_shell, env, spec,
                                   n_lat=32)
    return np.asarray(ba["daa"], np.float64), a_lc


def test_precipitation_lifetime_matches_dense_eigensolve():
    """End to end on a real bounce-averaged profile (D spans ~8 decades):
    the jitted inverse-iteration lifetime equals the host dense
    eigensolve's 1/lambda_1."""
    daa, a_lc = _real_daa_profile(96)
    assert (daa > 0.0).any()
    daa = np.maximum(daa, 1e-8 * daa.max())   # keep the operator connected
    tau_eig = fp.eigen_lifetime(daa, a_lc, n_cells=96)
    tau_ii = float(fp.precipitation_lifetime(jnp.asarray(daa), a_lc,
                                             n_cells=96))
    assert tau_eig > 0.0
    # measured 2.7e-15: inverse iteration at (lam1/lam2)^64 + the
    # variational Rayleigh quotient is exact to roundoff here
    np.testing.assert_allclose(tau_ii, tau_eig, rtol=1e-10)


def test_lifetime_exceeds_weak_diffusion_estimate_scaling():
    """tau scales as 1/Bw^2 exactly (linear operator), matching the
    quasi-linear amplitude scaling of the underlying coefficients."""
    daa, a_lc = _real_daa_profile(64)
    daa = np.maximum(daa, 1e-8 * daa.max())
    t1 = fp.eigen_lifetime(daa, a_lc, n_cells=64)
    t4 = fp.eigen_lifetime(4.0 * daa, a_lc, n_cells=64)
    np.testing.assert_allclose(t1 / t4, 4.0, rtol=1e-9)


def test_precipitation_lifetime_batched():
    """A batch of D profiles evolves in one jitted program; each row equals
    its own scalar run (the vmap-shaped layout energies ride on)."""
    daa, a_lc = _real_daa_profile(64)
    daa = np.maximum(daa, 1e-8 * daa.max())
    batch = np.stack([daa, 2.0 * daa])
    tau_b = np.asarray(fp.precipitation_lifetime(jnp.asarray(batch), a_lc,
                                         n_cells=64))
    tau_0 = float(fp.precipitation_lifetime(jnp.asarray(daa), a_lc, n_cells=64))
    assert tau_b.shape == (2,)
    np.testing.assert_allclose(tau_b[0], tau_0, rtol=1e-8)
    np.testing.assert_allclose(tau_b[0] / tau_b[1], 2.0, rtol=1e-3)
