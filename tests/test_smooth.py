"""Smoothed-plasmapause option: blend correctness + fused-gradient parity."""

import numpy as np
import pytest

from raytrace_tpu.models import make_env, plasmasphere
from raytrace_tpu.ops import fused, gradients


def test_smooth_blend_limits():
    """Many blend-widths from the boundaries the smoothed model equals the
    hard model (log-space blending: no exponential branch-2 leakage)."""
    env_h = make_env()
    w = 0.005
    mid = 0.5 * (env_h.lppi + env_h.lppo)  # ~17 widths from lppi
    for L in (2.0, 3.5, mid, 7.0):
        hard = float(plasmasphere.ne_plasma_cm3(
            L, env_h.lppi, env_h.lppo, env_h.ne_lppi, env_h.ps_season,
            env_h.ps_trough, 0.0))
        soft = float(plasmasphere.ne_plasma_cm3(
            L, env_h.lppi, env_h.lppo, env_h.ne_lppi, env_h.ps_season,
            env_h.ps_trough, w))
        assert soft == pytest.approx(hard, rel=1e-6), L


def test_smooth_is_continuous_at_lppi():
    env = make_env(ps_smooth=0.05)
    eps = 1e-4
    a = float(plasmasphere.ne_plasma_cm3(
        env.lppi - eps, env.lppi, env.lppo, env.ne_lppi, env.ps_season,
        env.ps_trough, 0.05))
    b = float(plasmasphere.ne_plasma_cm3(
        env.lppi + eps, env.lppi, env.lppo, env.ne_lppi, env.ps_season,
        env.ps_trough, 0.05))
    assert a == pytest.approx(b, rel=1e-2)


def test_smooth_fused_matches_autodiff():
    env = make_env(b0=3.0696381e-5, ps_smooth=0.03)
    rng = np.random.default_rng(17)
    for _ in range(40):
        r = float(rng.uniform(1.2, 6.0))
        lat = float(rng.uniform(-1.0, 1.0))
        chi = float(rng.uniform(-2.0, 2.0))
        f = float(rng.uniform(500.0, 1.0e4))
        ad = gradients.mu_grads_2d_lat(r, lat, chi, f, env,
                                       grad_mode=gradients.AUTODIFF)
        fz = fused.mu_and_grads_2d_lat(r, lat, chi, f, env)
        for i, (a, b) in enumerate(zip(ad, fz)):
            assert float(b) == pytest.approx(float(a), rel=1e-8,
                                             abs=1e-12), i
