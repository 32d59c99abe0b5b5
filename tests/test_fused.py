"""Fused hand-derived gradient chain vs reverse-mode autodiff (float64)."""

import numpy as np
import pytest

from raytrace_tpu.constants import RE
from raytrace_tpu.models import make_env, make_env_lat, make_env_raymain
from raytrace_tpu.ops import fused, gradients

R0 = (RE + 1.0e6) / RE


@pytest.mark.parametrize(
    "env_fn", [make_env_lat, make_env_raymain,
               lambda: make_env(de_correction=True),
               lambda: make_env(iono_mlt=True, mlt=6.0),
               lambda: make_env(ps_model="gcpm"),
               lambda: make_env(ps_model="gcpm", gcpm_bpow=0.5,
                                de_correction=True),
               lambda: make_env(duct_amp=0.5, duct_l0=2.8, duct_w=0.15),
               lambda: make_env(ps_model="gcpm", duct_amp=-0.4,
                                duct_l0=3.2, duct_w=0.2)],
    ids=["lat", "raymain", "de", "iono_mlt", "gcpm", "gcpm_bpow_de",
         "duct", "gcpm_duct"],
)
def test_fused_matches_autodiff(env_fn):
    env = env_fn()
    rng = np.random.default_rng(11)
    for _ in range(100):
        r = float(rng.uniform(R0, 5.0))
        lat = float(rng.uniform(-1.2, 1.2))
        chi = float(rng.uniform(-2.0, 2.0))
        f = float(rng.uniform(500.0, 2.0e4))
        ad = gradients.mu_grads_2d_lat(r, lat, chi, f, env,
                                       grad_mode=gradients.AUTODIFF)
        fz = fused.mu_and_grads_2d_lat(r, lat, chi, f, env)
        for i, (a, b) in enumerate(zip(ad, fz)):
            assert float(b) == pytest.approx(float(a), rel=1e-9, abs=1e-12), (
                i, r, lat, chi, f,
            )


def test_fused_colat_sign():
    env = make_env_lat()
    r, theta, chi, f = 2.0, np.pi / 3, 0.4, 1500.0
    a = gradients.mu_grads_2d_colat(r, theta, chi, f, env,
                                    grad_mode=gradients.AUTODIFF)
    b = gradients.mu_grads_2d_colat(r, theta, chi, f, env,
                                    grad_mode=gradients.FUSED)
    for x, y in zip(a, b):
        assert float(y) == pytest.approx(float(x), rel=1e-9)


def test_fused_3d_matches_autodiff():
    """3D fused chain (closed-form geometry partials) vs value_and_grad."""
    env = make_env(b0=3.12e-5)
    rng = np.random.default_rng(23)
    for _ in range(60):
        r = float(rng.uniform(1.2, 6.0))
        th = float(rng.uniform(0.3, 2.8))
        ph = float(rng.uniform(-1.0, 1.0))
        rr, rt, rp = (float(x) for x in rng.normal(size=3))
        f = float(rng.uniform(500.0, 1.0e4))
        mu_a, g_a = gradients.mu_grads_3d(
            r, th, ph, rr, rt, rp, f, env, grad_mode=gradients.AUTODIFF
        )
        mu_b, g_b = fused.mu_and_grads_3d(r, th, ph, rr, rt, rp, f, env)
        assert float(mu_b) == pytest.approx(float(mu_a), rel=1e-10)
        for i, (a, b) in enumerate(zip(g_a, g_b)):
            assert float(b) == pytest.approx(float(a), rel=1e-8,
                                             abs=1e-11), i


def test_fused_3d_matches_autodiff_extended_medium():
    """3D fused chain with the extended medium (duct + He+/O+): the
    composition and duct terms flow through _ne_and_grads and the
    species sums identically in 3D."""
    env = make_env(duct_amp=0.4, duct_l0=3.0, duct_w=0.2,
                   eta_he=0.1, eta_o=0.05)
    rng = np.random.default_rng(41)
    for _ in range(30):
        r = float(rng.uniform(1.5, 5.0))
        th = float(rng.uniform(0.4, 2.7))
        ph = float(rng.uniform(-1.0, 1.0))
        rr, rt, rp = (float(x) for x in rng.normal(size=3))
        f = float(rng.uniform(100.0, 8.0e3))
        mu_a, g_a = gradients.mu_grads_3d(
            r, th, ph, rr, rt, rp, f, env, grad_mode=gradients.AUTODIFF
        )
        mu_b, g_b = fused.mu_and_grads_3d(r, th, ph, rr, rt, rp, f, env)
        assert float(mu_b) == pytest.approx(float(mu_a), rel=1e-9)
        for i, (a, b) in enumerate(zip(g_a, g_b)):
            assert float(b) == pytest.approx(float(a), rel=1e-7,
                                             abs=1e-11), i


def test_fused_3d_field_aligned_float32():
    """Field-aligned propagation (psi -> 0 or pi) in float32.

    The natural whistler state: rho nearly parallel (or antiparallel) to
    B. The psi-parameterized chain computes sin(psi) = sqrt(1 - cos^2)
    -- catastrophic cancellation at the f32 rounding floor -- then
    divides the Kimura terms by that noise; measured fallout was 65% of
    a 3D fan falsely wedge-retired (benchmarks/perf_r03j.py). The
    cos(psi)-form chain must stay finite and match the f64 truth to f32
    accuracy through the near-aligned approach."""
    import jax
    import jax.numpy as jnp

    from raytrace_tpu.models import cast_env
    from raytrace_tpu.models.dipole import b_vec_colat

    env = make_env(b0=3.12e-5)
    env32 = cast_env(env, jnp.float32)
    r, th, ph, f = 3.0, np.pi / 2 - 0.3, 0.0, 1500.0
    br, bt, bp = (float(x) for x in b_vec_colat(r, th, ph, env.b0))
    bm = np.hypot(br, bt)
    bhat = np.array([br / bm, bt / bm, 0.0])
    # perpendicular unit vector in the meridional plane
    perp = np.array([-bhat[1], bhat[0], 0.0])
    mu0 = 25.0
    for sign in (+1.0, -1.0):
        for eps in (1e-2, 1e-4, 1e-6, 0.0):
            rho = mu0 * (sign * bhat + eps * perp)
            args = (r, th, ph, float(rho[0]), float(rho[1]), float(rho[2]),
                    f)
            mu64, g64 = fused.mu_and_grads_3d(*args, env)
            a32 = tuple(jnp.float32(x) for x in args)
            mu32, g32 = fused.mu_and_grads_3d(*a32, env32)
            assert np.isfinite(float(mu32))
            assert float(mu32) == pytest.approx(float(mu64), rel=2e-5)
            for i, (a, b) in enumerate(zip(g64, g32)):
                a, b = float(a), float(b)
                assert np.isfinite(b), (sign, eps, i)
                # f32 accuracy relative to the gradient-vector scale
                scale = max(abs(float(x)) for x in g64)
                assert b == pytest.approx(a, rel=1e-3, abs=2e-4 * scale), (
                    sign, eps, i,
                )
