"""Drift tier (drift.py): bounce-averaged gradient-curvature drift.

The derivation chain is validated at three levels: the exact equatorial
closed form (Omega_d = 3 gamma m v^2 L / (2 q B0 RE^2)), the emergent
pitch-angle factor against Hamlin's classic 0.7 + 0.3 sin(alpha_eq)
shape (which this module derives rather than quotes), and -- decisively
-- a relativistic Boris push through the FULL 3D dipole Lorentz force
(no guiding-center approximation) whose measured mean dphi/dt must match
the bounce-averaged rate."""

import math

import numpy as np
import pytest

from raytrace_tpu import drift
from raytrace_tpu.constants import B0_3D, M_E, Q_E, RE
from raytrace_tpu.diffusion import kinematics


def test_equatorial_closed_form():
    """alpha_eq -> 90 deg reproduces the textbook equatorial drift."""
    for L in (2.0, 4.0, 6.0):
        for e_kev in (100.0, 1000.0):
            g, v, _ = kinematics(e_kev)
            closed = 3.0 * g * M_E * v * v * L / (2.0 * Q_E * B0_3D * RE * RE)
            num = float(drift.drift_rate(
                e_kev, math.radians(89.99), L)["omega_d"])
            np.testing.assert_allclose(num, closed, rtol=1e-6)


def test_pitch_angle_factor_is_hamlin_shaped():
    """The emergent pitch-angle dependence matches the classical
    0.7 + 0.3 sin(alpha_eq) Hamlin approximation to a few percent --
    derived here from the bounce average, not quoted."""
    a = np.radians(np.linspace(8.0, 89.0, 12))
    om = drift.drift_rate(1000.0, a, 4.0)["omega_d"]
    om_eq = float(drift.drift_rate(1000.0, math.radians(89.99), 4.0)
                  ["omega_d"])
    hamlin = 0.7 + 0.3 * np.sin(a)
    np.testing.assert_allclose(om / om_eq, hamlin, rtol=0.04)
    # monotonic in alpha_eq
    assert (np.diff(om) > 0.0).all()


def test_scalings():
    """Omega_d scales linearly in L and as gamma v^2 in energy."""
    o2 = float(drift.drift_rate(500.0, math.radians(60.0), 2.0)["omega_d"])
    o6 = float(drift.drift_rate(500.0, math.radians(60.0), 6.0)["omega_d"])
    np.testing.assert_allclose(o6 / o2, 3.0, rtol=1e-10)
    g1, v1, _ = kinematics(100.0)
    g2, v2, _ = kinematics(2000.0)
    oe1 = float(drift.drift_rate(100.0, math.radians(60.0), 4.0)["omega_d"])
    oe2 = float(drift.drift_rate(2000.0, math.radians(60.0), 4.0)["omega_d"])
    np.testing.assert_allclose(oe2 / oe1, (g2 * v2 * v2) / (g1 * v1 * v1),
                               rtol=1e-10)


def test_drift_average_weighting():
    """drift_average: normalized weighted mean over common numeric keys;
    equal weights = plain mean; non-common keys dropped."""
    m1 = {"daa": np.array([1.0, 2.0]), "dpp": 4.0, "extra": 7.0}
    m2 = {"daa": np.array([3.0, 6.0]), "dpp": 0.0}
    avg = drift.drift_average([m1, m2])
    np.testing.assert_allclose(avg["daa"], [2.0, 4.0])
    np.testing.assert_allclose(avg["dpp"], 2.0)
    assert "extra" not in avg
    # weights normalized: (3, 1) == (0.75, 0.25)
    w = drift.drift_average([m1, m2], weights=[3.0, 1.0])
    np.testing.assert_allclose(w["daa"], 0.75 * m1["daa"] + 0.25 * m2["daa"])
    with pytest.raises(ValueError):
        drift.drift_average([])
    with pytest.raises(ValueError):
        drift.drift_average([m1, m2], weights=[1.0])


def _dipole_b(pos):
    """Full 3D centered-dipole field [T] at Cartesian pos [m] (moment on
    -z so the equatorial field points +z... sign chosen so electrons
    gyrate consistently; only magnitudes and the drift DIRECTION-free
    rate are asserted)."""
    m = B0_3D * RE**3                       # dipole moment * mu0/4pi
    r2 = (pos * pos).sum(-1)
    r = np.sqrt(r2)
    rhat = pos / r[..., None]
    mz = np.array([0.0, 0.0, -m])
    mdotr = (mz * rhat).sum(-1)
    return (3.0 * mdotr[..., None] * rhat - mz) / r[..., None] ** 3


@pytest.mark.slow
def test_boris_full_lorentz_matches_drift_rate():
    """A relativistic electron pushed by the exact-angle Boris rotation
    through the full 3D dipole Lorentz force drifts azimuthally at the
    bounce-averaged guiding-center rate (a few percent: gyro-scale and
    bounce-phase wobble average out over whole bounce periods)."""
    from raytrace_tpu.constants import C_LIGHT

    e_kev, a_eq, L = 1000.0, math.radians(45.0), 4.0
    g0, v0, _ = kinematics(e_kev)

    # launch at the equator, guiding-center start at (L RE, 0, 0)
    b_eq = B0_3D / L**3
    pos = np.array([L * RE, 0.0, 0.0])
    p = g0 * M_E * v0 * np.array([0.0, math.sin(a_eq), math.cos(a_eq)])

    # timestep: resolve the mirror-point gyration (B_mirror = B_eq/sin^2a)
    f_c_mirror = Q_E * (b_eq / math.sin(a_eq) ** 2) / (2 * math.pi * M_E * g0)
    dt = 1.0 / (25.0 * f_c_mirror)
    tau_b_est = 4.0 * L * RE / v0 * 1.3
    n_steps = int(4.6 * tau_b_est / dt)

    q = -Q_E
    mc = M_E * C_LIGHT
    phis = np.empty(n_steps)
    ts = np.empty(n_steps)
    zs = np.empty(n_steps)
    t = 0.0
    for i in range(n_steps):
        bv = _dipole_b(pos)
        bm = np.linalg.norm(bv)
        gam = math.sqrt(1.0 + (p * p).sum() / mc**2)
        tv = bv / bm * math.tan(0.5 * q * dt * bm / (M_E * gam))
        sv = 2.0 * tv / (1.0 + (tv * tv).sum())
        pp = p + np.cross(p, tv)
        p = p + np.cross(pp, sv)
        gam = math.sqrt(1.0 + (p * p).sum() / mc**2)
        pos = pos + p / (M_E * gam) * dt
        t += dt
        phis[i] = math.atan2(pos[1], pos[0])
        ts[i] = t
        zs[i] = pos[2]

    # mean dphi/dt between UPWARD equator crossings (identical bounce
    # phase), removing the bounce-phase modulation of the instantaneous
    # drift rate; gyro wobble (~rho_g / r ~ 3e-4 rad) is the residual
    up = np.flatnonzero((zs[:-1] < 0.0) & (zs[1:] >= 0.0)) + 1
    assert up.size >= 3, "need >= 3 full bounces"
    phi_u = np.unwrap(phis)
    slope = (phi_u[up[-1]] - phi_u[up[0]]) / (ts[up[-1]] - ts[up[0]])
    want = float(drift.drift_rate(e_kev, a_eq, L)["omega_d"])
    np.testing.assert_allclose(abs(slope), want, rtol=0.05)
