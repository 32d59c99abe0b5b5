"""Gradient-layer tests: autodiff vs the reference's analytic and FD forms
(SURVEY.md build plan step 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reference_oracle as oracle
from raytrace_tpu.constants import RE
from raytrace_tpu.models import dipole, medium
from raytrace_tpu.ops import analytic, dispersion, gradients

R0 = (RE + 1.0e6) / RE


def test_autodiff_chi_grad_is_true_dmudpsi():
    """d(mu)/d(chi) from jax.grad == FD of the traced mu (psi = pi/2 + dip
    + chi, so it is the true dmu/dpsi). The reference's closed form
    (RayMain.jl:246-254) is NOT that derivative in the abs-guarded regime
    -- see ops/analytic.py -- so it is checked separately in
    test_reference_mode_uses_reference_dmudpsi."""
    env = medium.make_env_lat()
    rng = np.random.default_rng(1)
    for _ in range(20):
        r = float(rng.uniform(R0, 5.0))
        lat = float(rng.uniform(-1.0, 1.0))
        chi = float(rng.uniform(-1.5, 1.5))
        f = float(rng.uniform(800.0, 10000.0))
        _, _, _, dmudchi, _ = gradients.mu_grads_2d_lat(r, lat, chi, f, env)
        fd = analytic.fd_grad(
            lambda x: dispersion.mu_2d_lat(r, lat, x, f, env), chi, 1e-7
        )
        assert float(dmudchi) == pytest.approx(float(fd), rel=1e-5)


def test_reference_mode_uses_reference_dmudpsi():
    """grad_mode='reference' swaps in the reference closed form exactly."""
    env = medium.make_env_lat()
    r, lat, chi, f = 2.0, 0.5, 0.3, 1500.0
    _, _, _, dmudchi_ref, _ = gradients.mu_grads_2d_lat(
        r, lat, chi, f, env, grad_mode=gradients.REFERENCE
    )
    ne = float(medium.ne_total_m3(r, lat, env))
    b = float(medium.b_mag(r, lat, env))
    psi = float(dispersion.psi_lat(lat, chi))
    _, expect = oracle.mu_dmudpsi(ne, b, f, psi)
    assert float(dmudchi_ref) == pytest.approx(expect, rel=1e-9)


def test_analytic_dmudpsi_matches_oracle():
    env = medium.make_env_raymain()
    for (r, lat, chi, f) in [(R0, np.pi / 4, 0.0, 5000.0), (2.0, 0.5, 0.7, 1200.0)]:
        _, got = analytic.mu_dmudpsi_2d_lat(r, lat, chi, f, env)
        _, expect = oracle.mu_lat_raymain_env(r, lat, chi, f)
        assert float(got) == pytest.approx(expect, rel=1e-9)


def test_autodiff_vs_central_fd_float64():
    """All four autodiff partials vs well-scaled central differences.

    (The reference's own absolute h = 1e-11 m on r ~ 7e6 m is below float64
    resolution -- SURVEY.md hard part 1; we use relative steps.)"""
    env = medium.make_env_lat()
    r, lat, chi, f = 2.3, 0.4, 0.6, 1500.0
    mu, dmudr, dmudlat, dmudchi, dmudf = gradients.mu_grads_2d_lat(
        r, lat, chi, f, env
    )
    hr, ha, hf = 1e-7, 1e-7, 1e-3
    fd_r = analytic.fd_grad(lambda x: dispersion.mu_2d_lat(x, lat, chi, f, env), r, hr)
    fd_lat = analytic.fd_grad(lambda x: dispersion.mu_2d_lat(r, x, chi, f, env), lat, ha)
    fd_chi = analytic.fd_grad(lambda x: dispersion.mu_2d_lat(r, lat, x, f, env), chi, ha)
    fd_f = analytic.fd_grad(lambda x: dispersion.mu_2d_lat(r, lat, chi, x, env), f, hf)
    assert float(dmudr) == pytest.approx(float(fd_r), rel=1e-6)
    assert float(dmudlat) == pytest.approx(float(fd_lat), rel=1e-6)
    assert float(dmudchi) == pytest.approx(float(fd_chi), rel=1e-6)
    assert float(dmudf) == pytest.approx(float(fd_f), rel=1e-6)


def test_3d_rho_grads_match_kimura_geometry():
    """Autodiff d(mu)/d(rho_k) == the Kimura 1966 chain
    dmu/drho_k = (dmu/dpsi)(dpsi/drho_k) when driven by the TRUE dmu/dpsi
    (autodiff of the traced mu w.r.t. psi). This validates the reference's
    dpsi/drho_k geometry (RayTrace_3D.jl:261-311) independently of its
    dmu/dpsi quirk."""
    env = medium.make_env(b0=3.12e-5)
    r, theta, phi = 2.0, np.pi / 3, 0.0
    f = 1500.0
    # the Kimura form substitutes mu for |rho| -- exact only on-shell
    # (|rho| = mu, which the reference ODE maintains). mu depends only on
    # the direction of rho, so scale the test point onto the shell first.
    d_r, d_t, d_p = 0.9, 1.3, 0.2
    mu0 = float(dispersion.mu_3d(r, theta, phi, d_r, d_t, d_p, f, env))
    scale = mu0 / np.sqrt(d_r**2 + d_t**2 + d_p**2)
    rho_r, rho_t, rho_p = d_r * scale, d_t * scale, d_p * scale
    mu, grads = gradients.mu_grads_3d(r, theta, phi, rho_r, rho_t, rho_p, f, env)
    psi = dispersion.psi_3d(r, theta, phi, rho_r, rho_t, rho_p, env)
    lat = np.pi / 2 - theta
    ne = medium.ne_total_m3(r, lat, env)
    b = medium.b_mag(r, lat, env)
    rlp = dispersion.stix_rlp(ne, b, f)
    true_dmudpsi = jax.grad(
        lambda p: dispersion.mu_from_mu2(dispersion.mu2_signed(*rlp, p))
    )(psi)
    bvec = dipole.b_vec_colat(r, theta, phi, env.b0)
    kim = analytic.kimura_dmudrho(
        mu, true_dmudpsi, psi, bvec, (rho_r, rho_t, rho_p)
    )
    for got, expect in zip(grads[3:6], kim):
        assert float(got) == pytest.approx(float(expect), rel=1e-7)


def test_3d_reference_mode_rho_grads():
    """mode='reference' rho-partials == Kimura chain with the reference's
    closed-form dmu/dpsi (what RayTrace_3D.jl actually integrates)."""
    env = medium.make_env(b0=3.12e-5)
    args = (2.0, np.pi / 3, 0.0, 0.9, 1.3, 0.2, 1500.0)
    mu, grads = gradients.mu_grads_3d(*args, env, grad_mode=gradients.REFERENCE)
    psi = dispersion.psi_3d(*args[:6], env)
    lat = np.pi / 2 - args[1]
    ne = medium.ne_total_m3(args[0], lat, env)
    b = medium.b_mag(args[0], lat, env)
    _, dmudpsi_ref = analytic.mu_and_dmudpsi(ne, b, args[6], psi)
    bvec = dipole.b_vec_colat(args[0], args[1], args[2], env.b0)
    kim = analytic.kimura_dmudrho(mu, dmudpsi_ref, psi, bvec, args[3:6])
    for got, expect in zip(grads[3:6], kim):
        assert float(got) == pytest.approx(float(expect), rel=1e-10)


def test_3d_spatial_grads_vs_fd():
    env = medium.make_env(b0=3.12e-5)
    args = [2.0, np.pi / 3, 0.0, 0.9, 1.3, 0.2, 1500.0]
    mu, grads = gradients.mu_grads_3d(*args, env)
    for i, h in [(0, 1e-7), (1, 1e-7), (6, 1e-3)]:
        def f_of(x, i=i):
            a = list(args)
            a[i] = x
            return dispersion.mu_3d(*a, env)
        fd = analytic.fd_grad(f_of, args[i], h)
        assert float(grads[i]) == pytest.approx(float(fd), rel=1e-6), i


def test_grads_jit_and_vmap():
    """The gradient bundle compiles and batches cleanly (vmap-first)."""
    env = medium.make_env_lat()
    fn = jax.jit(jax.vmap(lambda r, lat, chi, f: gradients.mu_grads_2d_lat(
        r, lat, chi, f, env
    )))
    n = 64
    rs = jnp.linspace(R0, 4.0, n)
    lats = jnp.linspace(-1.0, 1.0, n)
    chis = jnp.linspace(-1.0, 1.0, n)
    fs = jnp.full((n,), 2000.0)
    out = fn(rs, lats, chis, fs)
    assert all(o.shape == (n,) for o in out)
    assert bool(jnp.all(jnp.isfinite(jnp.stack(out))))


def test_tilted_dipole_3d_gradients_and_symmetry_breaking():
    """mu in a tilted-dipole medium: the fused path falls back to
    autodiff (values agree by construction), d mu/d phi is genuinely
    nonzero (meridional symmetry broken), and tilt = 0 matches the
    centered medium exactly."""
    import jax

    from raytrace_tpu.models import make_env
    from raytrace_tpu.ops import dispersion

    env_t = make_env(b_model="tilted", b_tilt=0.2, b_tilt_phi=0.4)
    env_0 = make_env()
    args = (2.5, 1.0, 0.3, 1.0, 1.0, 0.1, 1000.0)

    mu_f, g_f = gradients.mu_grads_3d(*args, env_t, grad_mode="fused")
    mu_a, g_a = gradients.mu_grads_3d(*args, env_t, grad_mode="autodiff")
    assert float(mu_f) == pytest.approx(float(mu_a), rel=1e-12)
    for x, y in zip(g_f, g_a):
        assert float(x) == pytest.approx(float(y), rel=1e-12)
    # symmetry broken: dmu/dphi != 0 under tilt (it is identically zero
    # for the centered dipole)
    assert abs(float(g_f[2])) > 1e-6 * abs(float(mu_f))
    _, g_c = gradients.mu_grads_3d(*args, env_0, grad_mode="fused")
    assert float(g_c[2]) == 0.0

    # tilt -> 0 limit matches the centered-dipole dispersion exactly
    env_z = make_env(b_model="tilted", b_tilt=0.0)
    mu_z = dispersion.mu_3d(*args, env_z)
    mu_c = dispersion.mu_3d(*args, env_0)
    assert float(mu_z) == pytest.approx(float(mu_c), rel=1e-12)

    # reference mode refuses non-dipole media
    with pytest.raises(ValueError):
        gradients.mu_grads_3d(*args, env_t, grad_mode="reference")

    # the FD cross-check: autodiff dmu/dphi matches a central difference
    h = 1e-6
    mu_p = dispersion.mu_3d(2.5, 1.0, 0.3 + h, 1.0, 1.0, 0.1, 1000.0, env_t)
    mu_m = dispersion.mu_3d(2.5, 1.0, 0.3 - h, 1.0, 1.0, 0.1, 1000.0, env_t)
    fd = (float(mu_p) - float(mu_m)) / (2 * h)
    assert float(g_f[2]) == pytest.approx(fd, rel=1e-4)
