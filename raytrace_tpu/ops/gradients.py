"""Autodiff gradient layer: all partials of mu in one reverse-mode pass.

Replaces the reference's 9 (2D) / 12 (3D) redundant dispersion evaluations
per RHS call (finite differences, RayMain.jl:268-316; FD + analytic Kimura,
RayTrace_3D.jl:223-323) with a single jax.value_and_grad -- one forward +
one reverse sweep (~3 dispersion-eval cost), and no 1e-11 absolute-step
cancellation hazard.

Identities exploited:
  - psi = pi/2 + dip(lat) + chi  =>  d(mu)/d(chi) == d(mu)/d(psi), so the
    analytic dmu/dpsi the reference carries separately (RayMain.jl:246-254)
    is just the chi-gradient here.
  - the Kimura dmu/drho_k terms (RayTrace_3D.jl:261-311) are the
    rho-gradients of mu_3d.
"""

import jax
import jax.numpy as jnp

from ..models import medium
from . import analytic, dispersion

# grad_mode values:
#   "autodiff"  -- every partial is the exact derivative of the traced
#                  mu = sqrt(|mu^2_+|); self-consistent (default).
#   "reference" -- reproduces the gradient set the reference *actually*
#                  integrates:
#                    * dmu/dpsi from its closed form (RayMain.jl:246-254),
#                      which differs from the true derivative in the
#                      abs-guarded regime (see ops/analytic.py);
#                    * dmu/dr == 0 EXACTLY: the reference's central
#                      difference uses an absolute step dr = 1e-11 m
#                      (RayMain.jl:270) on r ~ 7.4e6 m, which is below
#                      half a float64 ULP, so r +- dr/2 rounds back to r
#                      and (mu_r - mu_l)/dr is identically zero in all
#                      three scripts;
#                    * angle/frequency partials stay autodiff (the
#                      reference's theta/chi/f steps are representable
#                      and its FD matches autodiff to ~1e-6).
#   "fused"     -- same values as "autodiff" (tested to 1e-11) from the
#                  hand-derived chain in ops/fused.py: all four partials
#                  cost zero extra transcendentals over the forward pass
#                  (~1.8x faster RHS). Default for the 2D paths.
AUTODIFF = "autodiff"
REFERENCE = "reference"
FUSED = "fused"


def _require_protons_only(env):
    """grad_mode='reference' reproduces the reference's closed forms,
    which are written for the 2-species e-p plasma (RayMain.jl:154);
    multi-ion envs must use autodiff/fused gradients."""
    def _on(v):
        return not (isinstance(v, float) and v == 0.0)

    if _on(env.eta_he) or _on(env.eta_o):
        raise ValueError(
            "grad_mode='reference' is protons-only (the reference has no "
            "ion composition); use the default fused/autodiff gradients"
        )


def _require_dipole_2d(env):
    """The 2D frames assume the centered axial dipole (the fused chain
    hand-codes its geometry and would otherwise silently trace
    centered-dipole physics for a tilted/IGRF env; autodiff raises via
    medium.b_mag). Tilted/IGRF media are 3D-only -- same contract as
    medium.b_mag."""
    if env.b_model != "dipole":
        raise ValueError(
            "the 2D frames assume the centered axial dipole; "
            f"b_model={env.b_model!r} is 3D-only"
        )


def mu_grads_2d_lat(r, lat, chi, f, env: medium.EnvParams, grad_mode=FUSED,
                    root=1.0, ne_fn=None):
    """(mu, dmu/dr, dmu/dlat, dmu/dpsi, dmu/df) at a latitude-frame state.

    root=+1.0 traces the whistler branch (B+F)/2A; root=-1.0 the EMIC
    branch the reference leaves commented out (RayMain.jl:243).
    ne_fn: optional density surrogate (fused mode only; ops/tabulated.py)."""
    _require_dipole_2d(env)
    if grad_mode == FUSED:
        from . import fused

        return fused.mu_and_grads_2d_lat(r, lat, chi, f, env, root, ne_fn)
    if ne_fn is not None:
        raise ValueError("ne_fn (tabulated medium) rides the fused chain "
                         f"only; got grad_mode={grad_mode!r}")
    mu, (dmudr, dmudlat, dmudchi, dmudf) = jax.value_and_grad(
        dispersion.mu_2d_lat, argnums=(0, 1, 2, 3)
    )(r, lat, chi, f, env, root)
    if grad_mode == REFERENCE:
        _require_protons_only(env)
        _, dmudchi = analytic.mu_dmudpsi_2d_lat(r, lat, chi, f, env)
        dmudr = jnp.zeros_like(dmudr)
    return mu, dmudr, dmudlat, dmudchi, dmudf


def mu_grads_2d_colat(r, theta, chi, f, env: medium.EnvParams, grad_mode=FUSED,
                      root=1.0):
    """(mu, dmu/dr, dmu/dtheta, dmu/dpsi, dmu/df), colatitude frame.

    dip(theta) == dip(lat = pi/2 - theta), so the fused latitude chain
    serves here with dmu/dtheta = -dmu/dlat."""
    _require_dipole_2d(env)
    if grad_mode == FUSED:
        from . import fused

        lat = jnp.pi / 2.0 - theta
        mu, dmudr, dmudlat, dmudpsi, dmudf = fused.mu_and_grads_2d_lat(
            r, lat, chi, f, env, root
        )
        return mu, dmudr, -dmudlat, dmudpsi, dmudf
    mu, (dmudr, dmudtheta, dmudchi, dmudf) = jax.value_and_grad(
        dispersion.mu_2d_colat, argnums=(0, 1, 2, 3)
    )(r, theta, chi, f, env, root)
    if grad_mode == REFERENCE:
        _require_protons_only(env)
        lat = jnp.pi / 2.0 - theta
        _, dmudchi = analytic.mu_dmudpsi_2d_lat(r, lat, chi, f, env)
        dmudr = jnp.zeros_like(dmudr)
    return mu, dmudr, dmudtheta, dmudchi, dmudf


def mu_grads_3d(r, theta, phi, rho_r, rho_t, rho_p, f, env: medium.EnvParams,
                grad_mode=FUSED, root=1.0):
    """mu and all 7 partials (r, theta, phi, rho_r, rho_t, rho_p, f).

    mode="fused" (default): the hand-derived closed-form chain
    (ops/fused.py::mu_and_grads_3d), matching autodiff to ~3e-13.
    mode="reference" swaps the rho-partials for the reference's Kimura
    chain driven by its closed-form dmu/dpsi (RayTrace_3D.jl:261-311 uses
    refractive_index's dmudpsi output); spatial/frequency partials remain
    autodiff (they match the reference's central differences).

    The fused chain hand-codes the centered-dipole geometry; non-dipole
    media (b_model="tilted"/"igrf") route to the general hybrid chain
    (ops/fused.py::mu_and_grads_3d_general -- forward-mode geometry
    jacobian + the same fused density/Stix core), and the reference mode
    (built around the axial dipole's Kimura chain) refuses them."""
    if grad_mode == REFERENCE and env.b_model != "dipole":
        raise ValueError(
            "grad_mode='reference' reproduces the reference's centered-"
            f"dipole chain; b_model={env.b_model!r} is unsupported there"
        )
    if grad_mode == FUSED:
        from . import fused

        if env.b_model != "dipole":
            return fused.mu_and_grads_3d_general(
                r, theta, phi, rho_r, rho_t, rho_p, f, env, root
            )
        return fused.mu_and_grads_3d(
            r, theta, phi, rho_r, rho_t, rho_p, f, env, root
        )
    mu, grads = jax.value_and_grad(
        dispersion.mu_3d, argnums=(0, 1, 2, 3, 4, 5, 6)
    )(r, theta, phi, rho_r, rho_t, rho_p, f, env, root)
    if grad_mode == REFERENCE:
        _require_protons_only(env)
        from ..models import dipole

        psi = dispersion.psi_3d(r, theta, phi, rho_r, rho_t, rho_p, env)
        lat = jnp.pi / 2.0 - theta
        ne = medium.ne_total_m3(r, lat, env)
        b = medium.b_mag(r, lat, env)
        _, dmudpsi_ref = analytic.mu_and_dmudpsi(ne, b, f, psi)
        bvec = dipole.b_vec_colat(r, theta, phi, env.b0)
        kim = analytic.kimura_dmudrho(
            mu, dmudpsi_ref, psi, bvec, (rho_r, rho_t, rho_p)
        )
        # dmu/dr == 0 for the same sub-ULP FD step reason as in 2D
        grads = (jnp.zeros_like(grads[0]), grads[1], grads[2], *kim, grads[6])
    return mu, grads
