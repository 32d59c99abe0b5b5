"""Haselgrove ray equations (ODE right-hand sides).

Three variants, mirroring the reference workloads:
  - 2D colatitude frame (RayMain.jl:321-367), state u = (r, theta, chi, T)
  - 2D latitude frame  (RayTrace_lat.jl:251-296), state u = (r, lat, chi, T)
  - 3D Kimura form     (RayTrace_3D.jl:327-359),
    state u = (r, theta, phi, rho_r, rho_theta, rho_phi, T)

Units: r in RE, the independent variable t is phase path length in RE, T is
group delay in seconds. The Haselgrove equations are scale-invariant under
(r, t) -> (r/RE, t/RE); only dT/dt picks up the factor RE/c
(constants.RE_OVER_C).

Frequency convention: f is a parameter (the RayTrace_3D.jl:334 convention).
The 2D reference scripts instead initialize state[3] to f and integrate the
group-delay equation into it, so "f" drifts by the accumulated group delay
(RayMain.jl:328 vs :344 -- documented quirk, SURVEY.md section 3.1). Here
state[3] is a dedicated group-delay channel T for all variants; pass
legacy_freq_state=True to reproduce the reference quirk bit-for-bit in
parity tests (freq read as f0 + T).
"""

import jax.numpy as jnp

from ..constants import RE_OVER_C
from ..models import medium
from . import gradients


def rhs_2d_lat(u, f, env: medium.EnvParams, legacy_freq_state=False,
               grad_mode=gradients.FUSED, root=1.0, ne_fn=None):
    """du/dt for the latitude-frame 2D ray (RayTrace_lat.jl:270-273).

    grad_mode="reference" reproduces the reference's mixed gradient set
    (analytic dmu/dpsi, FD-consistent spatial grads) for trajectory parity;
    see ops/gradients.py. ne_fn: optional tabulated-medium surrogate
    (ops/tabulated.py; fused mode only)."""
    r, lat, chi, T = u[0], u[1], u[2], u[3]
    freq = f + T if legacy_freq_state else f
    mu, dmudr, dmudlat, dmudpsi, dmudf = gradients.mu_grads_2d_lat(
        r, lat, chi, freq, env, grad_mode, root, ne_fn
    )
    # two reciprocals serve every term: 1/mu == mu * inv_mu2 (the
    # dependency-chain roofline is op-bound, BASELINE.md)
    sinchi, coschi = jnp.sin(chi), jnp.cos(chi)
    inv_mu2 = 1.0 / (mu * mu)
    inv_mu2_r = inv_mu2 * (1.0 / r)
    dr = inv_mu2 * (mu * coschi + dmudpsi * sinchi)
    dlat = inv_mu2_r * (mu * sinchi - dmudpsi * coschi)
    dchi = inv_mu2_r * (dmudlat * coschi - (r * dmudr + mu) * sinchi)
    dT = RE_OVER_C * (1.0 + (freq * mu * inv_mu2) * dmudf)
    return jnp.stack([dr, dlat, dchi, dT])


def rhs_2d_colat(u, f, env: medium.EnvParams, legacy_freq_state=False,
                 grad_mode=gradients.FUSED, root=1.0):
    """du/dt for the colatitude-frame 2D ray (RayMain.jl:341-344).

    Sign flips vs the latitude form reflect lat = pi/2 - theta."""
    r, theta, chi, T = u[0], u[1], u[2], u[3]
    freq = f + T if legacy_freq_state else f
    mu, dmudr, dmudtheta, dmudpsi, dmudf = gradients.mu_grads_2d_colat(
        r, theta, chi, freq, env, grad_mode, root
    )
    sinchi, coschi = jnp.sin(chi), jnp.cos(chi)
    inv_mu2 = 1.0 / (mu * mu)
    inv_mu2_r = inv_mu2 * (1.0 / r)
    dr = inv_mu2 * (mu * coschi - dmudpsi * sinchi)
    dtheta = inv_mu2_r * (mu * sinchi + dmudpsi * coschi)
    dchi = inv_mu2_r * (dmudtheta * coschi - (r * dmudr + mu) * sinchi)
    dT = RE_OVER_C * (1.0 + (freq * mu * inv_mu2) * dmudf)
    return jnp.stack([dr, dtheta, dchi, dT])


def rhs_3d(u, f, env: medium.EnvParams, grad_mode=gradients.FUSED,
           root=1.0):
    """du/dt for the 3D ray (RayTrace_3D.jl:350-356), f a true parameter."""
    r, theta, phi = u[0], u[1], u[2]
    rho_r, rho_t, rho_p = u[3], u[4], u[5]
    mu, (dmudr, dmudtheta, dmudphi, dmudrr, dmudrt, dmudrp, dmudf) = (
        gradients.mu_grads_3d(r, theta, phi, rho_r, rho_t, rho_p, f, env,
                              grad_mode, root)
    )
    # three reciprocals serve all seven equations (1/mu == mu * inv_mu2)
    sintheta, costheta = jnp.sin(theta), jnp.cos(theta)
    inv_mu2 = 1.0 / (mu * mu)
    inv_mu = mu * inv_mu2
    inv_r = 1.0 / r
    inv_st = 1.0 / sintheta
    inv_mu2_r = inv_mu2 * inv_r
    dr = inv_mu2 * (rho_r - mu * dmudrr)
    dtheta = inv_mu2_r * (rho_t - mu * dmudrt)
    dphi = inv_mu2_r * inv_st * (rho_p - mu * dmudrp)
    drho_r = dmudr * inv_mu + rho_t * dtheta + rho_p * dphi * sintheta
    drho_t = (
        dmudtheta * inv_mu - rho_t * dr + r * rho_p * dphi * costheta
    ) * inv_r
    drho_p = (
        dmudphi * inv_mu - rho_p * dr * sintheta - r * rho_p * dtheta * costheta
    ) * (inv_r * inv_st)
    dT = RE_OVER_C * (1.0 + (f * inv_mu) * dmudf)
    return jnp.stack([dr, dtheta, dphi, drho_r, drho_t, drho_p, dT])
