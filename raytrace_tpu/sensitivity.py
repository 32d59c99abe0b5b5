"""Landing-state sensitivity: adaptive variational (tangent) flow.

The canonical whistler's landing position scatters ~1e4 x integrator
tolerance (BASELINE.md accuracy notes; at loose tolerance a graze can
even flip hit <-> miss). This module measures WHY, with machinery the
Julia reference cannot express: the variational system of the ray
equations, built by jax.jvp and integrated by the same adaptive stepper
as the ray itself.

Method: augment the state with tangent columns, du/dt = F(u),
dV/dt = J(u) V (each column via one jvp -- no materialized Jacobian),
and integrate the (n + n*k)-state system adaptively so the error
controller resolves the TANGENT dynamics too (tangents blow through the
near-singular reflection regions where steps sized for the state alone
mis-integrate them -- frozen-step replays of the same trajectory get the
right answer only to ~1%). The surface-crossing event refines the
augmented state, and the classical event projection (perturbations
carried to the surface along the flow)

    Phi_event = (I - f_end e_r^T / f_end[r]) Phi

gives d(landing state)/d(launch state) ON the surface r = r_floor.

Findings on the canonical ray (f = 1000 Hz, lat 45 deg, rtol-converged
to 6 digits and confirmed by an independent frozen-step replay to ~1%):
d(lat_land)/d(lat_0) = -7226.4. Finite-difference SECANTS at h >= 1e-7
read ~0.2 instead: the landing map carries microscopic folds (slope
+-7e3, sub-1e-8 amplitude) from the ray's many magnetospheric bounces,
so the infinitesimal tangent and the macroscopic response differ by 4
orders of magnitude. Both are physical: the tangent bounds worst-case
error growth (and quantitatively explains the ~1e4 x tolerance scatter
of landing positions); the secant describes finite launch-window
response. `landing_secant` measures the latter.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .integrate import SolverConfig, StopSpec, events, trace


def make_variational_rhs(rhs_fn, n, k=None):
    """RHS of the augmented (u, V) system; V is (n, k) tangent columns."""
    k = n if k is None else k

    def rhs_aug(ua, f):
        u, V = ua[:n], ua[n:].reshape(n, k)
        F = lambda uu: rhs_fn(uu, f)
        du = F(u)
        dV = jnp.stack(
            [jax.jvp(F, (u,), (V[:, j],))[1] for j in range(k)], axis=1
        )
        return jnp.concatenate([du, dV.ravel()])

    return rhs_aug


def landing_sensitivity(rhs_fn, u0, f, *, cfg=SolverConfig(rtol=1e-9,
                                                           atol=1e-13),
                        spec=StopSpec(), group_idx=3, max_steps=200000,
                        tangents=None):
    """Event-projected landing Jacobian for one ray (float64 analysis).

    tangents: (n, k) initial tangent directions (default: identity -> the
    full Jacobian). Returns a dict with:
      u_land        -- landing state
      status        -- stop status (meaningful for HIT_EARTH)
      jac           -- (n, k) event-projected d(u_land)/d(u_launch)
      dlat_dlaunch  -- row of `jac` for state[1]
      amplification -- |d lat_land / d lat_0| (canonical ray: ~7.2e3)
    """
    u0 = jnp.asarray(u0)
    n = u0.shape[0]
    V0 = jnp.eye(n) if tangents is None else jnp.asarray(tangents)
    k = V0.shape[1]
    rhs_aug = make_variational_rhs(rhs_fn, n, k)
    ua0 = jnp.concatenate([u0, V0.ravel()])
    res = trace(
        lambda ua, ff: rhs_aug(ua, ff), ua0[None], jnp.asarray(f)[None],
        cfg=cfg, spec=spec, group_idx=group_idx, max_steps=max_steps,
        chunk=256,
    )
    ua = res.u[0]
    u_land, phi = ua[:n], ua[n:].reshape(n, k)
    f_end = rhs_fn(u_land, jnp.asarray(f))
    proj = jnp.eye(n) - jnp.outer(f_end, jnp.eye(n)[0]) / f_end[0]
    jac = proj @ phi
    return {
        "u_land": np.asarray(u_land),
        "status": int(res.status[0]),
        "jac": np.asarray(jac),
        "dlat_dlaunch": np.asarray(jac[1]),
        "amplification": float(jnp.abs(jac[1, 1])) if k == n else None,
    }


def landing_sensitivity_batch(rhs_fn, u0, f, *,
                              cfg=SolverConfig(rtol=1e-9, atol=1e-13),
                              spec=StopSpec(), group_idx=3,
                              max_steps=200000):
    """Event-projected landing Jacobians for a whole fan in ONE trace.

    u0: (B, n); f: (B,). The augmented (u, V) system is built per ray and
    integrated as a single (B, n + n^2)-state batch -- the usual vmapped
    adaptive machinery, so a fan of sensitivities costs one ensemble run.
    Returns dict(u_land (B, n), status (B,), jac (B, n, n),
    amplification (B,))."""
    u0 = jnp.asarray(u0)
    b, n = u0.shape
    rhs_aug = make_variational_rhs(rhs_fn, n)
    eye = jnp.broadcast_to(jnp.eye(n).ravel(), (b, n * n))
    ua0 = jnp.concatenate([u0, eye], axis=1)
    res = trace(
        lambda ua, ff: rhs_aug(ua, ff), ua0, jnp.asarray(f), cfg=cfg,
        spec=spec, group_idx=group_idx, max_steps=max_steps, chunk=256,
    )
    u_land = res.u[:, :n]
    phi = res.u[:, n:].reshape(b, n, n)
    f_end = jax.vmap(rhs_fn)(u_land, jnp.asarray(f))
    proj = jnp.eye(n)[None] - (
        f_end[:, :, None] * jnp.eye(n)[0][None, None, :]
        / f_end[:, 0][:, None, None]
    )
    jac = jnp.einsum("bij,bjk->bik", proj, phi)
    return {
        "u_land": np.asarray(u_land),
        "status": np.asarray(res.status),
        "jac": np.asarray(jac),
        "amplification": np.asarray(jnp.abs(jac[:, 1, 1])),
    }


def landing_secant(rhs_fn, u0, f, index=1, h=1e-6, *,
                   cfg=SolverConfig(rtol=1e-12, atol=1e-15),
                   spec=StopSpec(), group_idx=3, max_steps=200000):
    """Macroscopic landing response: central secant of lat_land over a
    finite launch window h in launch component `index`. See the module
    docstring for why this differs (by orders of magnitude) from the
    tangent on folded landing maps."""
    u0 = np.asarray(u0, np.float64)

    def land(delta):
        u = u0.copy()
        u[index] += delta
        r = trace(
            rhs_fn, jnp.asarray(u)[None], jnp.asarray(f)[None], cfg=cfg,
            spec=spec, group_idx=group_idx, max_steps=max_steps, chunk=256,
        )
        if int(r.status[0]) != events.HIT_EARTH:
            raise RuntimeError(
                f"perturbed ray did not land: status {int(r.status[0])}"
            )
        return float(r.u[0, 1])

    return (land(h) - land(-h)) / (2.0 * h)
