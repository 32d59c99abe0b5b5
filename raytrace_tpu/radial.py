"""Radial (L-shell) diffusion with wave-driven losses.

The third axis of radiation-belt transport, closing the triad this
framework now covers (pitch angle - momentum - L): ULF-driven radial
diffusion at fixed first/second adiabatic invariants,

    df/dt = L^2 d/dL [ D_LL L^-2 df/dL ] - f / tau(L) + (boundary source),

(Schulz-Lanzerotti form: the phase-space Jacobian at fixed (mu, J) is
G proportional to L^-2, so the flux form below is exactly the standard
equation and exactly particle-conserving under zero-flux walls). tau(L)
is a local lifetime profile -- fed, in this framework, by its OWN
pitch-angle machinery: diffusion.bounce_averaged on a hiss/chorus band ->
fokker_planck.precipitation_lifetime per L (see
examples/two_belt_structure.py, which reproduces the classic Lyons-Thorne
two-belt/slot structure from that chain).

D_LL: radial diffusion is driven by global ULF fluctuations the
reference's single-flux-tube medium cannot supply, so the coefficient is
a user-supplied profile. `dll_power_law` provides the standard
magnetic-diffusion scaling class D_LL = d0 (L/l0)^q (q ~ 6-10 in the
empirical literature; magnitude and exponent are the user's choice --
nothing is quoted as physics here, unlike every other coefficient in
this framework, which is derived in-repo).

Numerics reuse the validated 1D Fokker-Planck machinery
(fokker_planck.build_operator / thomas_solve / the CN pattern) with
alpha -> L and G = L^-2: conservative FV face fluxes, Crank-Nicolson,
and a direct Thomas solve for steady states. Boundary conditions:
Dirichlet at the outer wall (the plasma-sheet source population, held at
f_out) and absorbing (f = 0) at the inner wall (the dense atmosphere).

All jittable; the L grid is ~10^2 cells, so everything is host-trivial
and the value is in the COUPLING to the framework's lifetime chain.
"""

import jax.numpy as jnp
import numpy as np

from .fokker_planck import build_operator, evolve_cn, thomas_solve


def make_l_grid(l_in=1.1, l_out=7.0, n_cells=160):
    """Uniform cell-centered grid on [l_in, l_out]."""
    faces = np.linspace(float(l_in), float(l_out), n_cells + 1)
    centers = 0.5 * (faces[:-1] + faces[1:])
    return centers, faces, faces[1] - faces[0]


def dll_power_law(l, d0=1.0e-8, l0=4.0, q=10.0):
    """D_LL = d0 (L/l0)^q  [1/s] -- the standard ULF scaling class.

    d0 is the rate AT L = l0; q ~ 6-10 spans the empirical range
    (magnetic diffusion steepens as L^10 in the classic treatments).
    Magnitude/exponent are inputs, not claims."""
    xp = jnp if isinstance(l, jnp.ndarray) else np
    return d0 * xp.exp(q * xp.log(l / l0))


def build_radial_operator(l_centers, l_faces, dl, dll_faces,
                          inv_tau_centers=None):
    """Tridiagonal A with (A f) = L^2 d/dL [D_LL L^-2 df/dL] - f/tau.

    dll_faces: D_LL at the n+1 faces. inv_tau_centers: optional loss rate
    1/tau(L) at cell centers (0 = no loss). Walls: inner absorbing
    (f = 0 half a cell in), outer absorbing as well -- steady-state and
    evolution sources enter through the RHS (see steady_state /
    evolve_radial), which is the clean way to hold a Dirichlet value
    without breaking the operator's M-matrix structure."""
    g_c = 1.0 / (np.asarray(l_centers) ** 2)
    g_f = 1.0 / (np.asarray(l_faces) ** 2)
    lo, dg, up = build_operator(jnp.asarray(dll_faces), jnp.asarray(g_c),
                                jnp.asarray(g_f), dl,
                                left_bc="absorbing", right_bc="absorbing")
    if inv_tau_centers is not None:
        dg = dg - jnp.asarray(inv_tau_centers)
    return lo, dg, up


def _outer_source(l_centers, l_faces, dl, dll_faces, f_out):
    """RHS vector injecting the outer Dirichlet value f_out.

    The absorbing outer wall writes flux 2 G_N D_N (0 - f_N)/dl; holding
    f_wall = f_out instead adds the constant 2 G_N D_N f_out / (dl^2 G_n)
    to the last cell's tendency."""
    n = np.asarray(l_centers).size
    b = np.zeros(n)
    g_wall = 1.0 / float(np.asarray(l_faces)[-1]) ** 2
    g_n = 1.0 / float(np.asarray(l_centers)[-1]) ** 2
    b[-1] = 2.0 * float(np.asarray(dll_faces)[-1]) * g_wall * f_out \
        / (dl * dl * g_n)
    return jnp.asarray(b)


def steady_state(l_centers, l_faces, dl, dll_faces, f_out=1.0,
                 inv_tau_centers=None, source_centers=None):
    """Equilibrium profile: solve -A f = b_outer + S by one Thomas sweep.

    source_centers: optional volumetric injection rate S(L) [f-units/s]
    at cell centers -- e.g. the CRAND source that sustains the inner belt
    behind the slot, which inward diffusion cannot reach in steady state.
    -A is an irreducibly diagonally dominant M-matrix (losses only add
    to the diagonal), the textbook no-pivot case."""
    lo, dg, up = build_radial_operator(l_centers, l_faces, dl, dll_faces,
                                       inv_tau_centers)
    b = _outer_source(l_centers, l_faces, dl, dll_faces, f_out)
    if source_centers is not None:
        b = b + jnp.asarray(source_centers)
    return thomas_solve(-lo, -dg, -up, b)


def evolve_radial(f0, l_centers, l_faces, dl, dll_faces, dt, n_steps,
                  f_out=1.0, inv_tau_centers=None, source_centers=None,
                  save_every=0):
    """Crank-Nicolson evolution with the outer Dirichlet source held.

    (I - dt/2 A) f+ = (I + dt/2 A) f + dt b  per step (the sources are
    constant in time, so they enter the CN step at full weight) -- the
    shared fokker_planck.evolve_cn machinery with source = b."""
    lo, dg, up = build_radial_operator(l_centers, l_faces, dl, dll_faces,
                                       inv_tau_centers)
    b = _outer_source(l_centers, l_faces, dl, dll_faces, f_out)
    if source_centers is not None:
        b = b + jnp.asarray(source_centers)
    return evolve_cn(jnp.asarray(f0), (lo, dg, up), dt, n_steps,
                     save_every=save_every, source=b)
