"""Bounce-averaged 2D pitch-angle + momentum Fokker-Planck solver.

Extends fokker_planck.py (pure pitch-angle) to the FULL quasi-linear
tensor the diffusion tier produces -- D_aa, D_ap, D_pp -- so momentum
diffusion (chorus acceleration, the mechanism that builds the MeV belt)
and the alpha-p cross coupling are evolved, not just scattering into the
loss cone:

    df/dt = (1/G) [ d/da ( G (D_aa df/da + D_ap df/dp) )
                  + d/dp ( G (D_ap df/da + D_pp df/dp) ) ],
    G(a, p) = p^2 T(a) sin a cos a,

(the standard bounce-averaged diffusion equation, f = phase-space density,
p in units of m_e c). The reference repo stops at ray paths; its lineage
(Bortnik's thesis, RayTrace_3D.jl:5) carries the chain to scattering and
precipitation -- this module closes the loop through ACCELERATION as well.

Design (TPU-shaped, all jittable):
  - The spatial operator is defined through its ENERGY FORM
        a(f, f) = sum_faces K (Delta f)^2  +  sum_cells 2 W (Da f)(Dp f),
    and A f = grad_f [ a(f,f)/2 ] via jax.grad -- so A is symmetric in the
    G-volume inner product EXACTLY (by construction, not by stencil
    bookkeeping), conservative under zero-flux walls (constants are in the
    kernel of every difference), and positive semidefinite whenever the
    local tensor is (Dap^2 <= Daa Dpp -- guaranteed by the quasi-linear
    rank-1-per-resonance structure, and PRESERVED by bounce averaging:
    the equatorial mapping is the congruence diag(c,1) D diag(c,1) with
    c = tan a_eq / tan a, and the bounce average is a positive-weighted
    sum of PSD matrices).
  - Crank-Nicolson in time; the SPD system (M + dt/2 A) f+ = (M - dt/2 A) f
    is solved matrix-free by Jacobi-preconditioned conjugate gradients
    (each iteration = a handful of shifted adds on the (n_a, n_p) grid --
    the natural TPU layout; no factorization, no sparse matrix).
  - Boundary conditions: absorbing loss-cone wall in alpha (half-cell
    Dirichlet ghost, same convention as the 1D solver), reflecting at
    a = pi/2 (G -> 0 there anyway); zero flux at both p walls.

Momentum units: p is measured in m_e c. diffusion.bounce_averaged returns
D_ap in SI rad kg m/s^2... per s and D_pp in (kg m/s)^2/s; divide by
(M_E C_LIGHT) and (M_E C_LIGHT)^2 respectively (see tensor_from_bounce).

Validation (tests/test_fokker_planck_2d.py): exact discrete symmetry and
PSD of A on random tensors, particle conservation to roundoff, reduction
to the 1D solver when D_ap = D_pp = 0, and analytic covariance growth
Cov(t) = Cov0 + 2 D t of an anisotropic Gaussian under a constant tensor
with cross terms.
"""

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .constants import C_LIGHT, M_E, Q_E
from .fokker_planck import bounce_time_factor, make_grid

_MC2_KEV = M_E * C_LIGHT * C_LIGHT / Q_E / 1.0e3   # electron rest energy, keV
# (same Q_E provenance as diffusion._MC2_EV, so the keV <-> p mapping used to
# build grids here is identical to the one the diffusion tier uses)


@dataclass(frozen=True)
class Grid2D:
    """Tensor grid: uniform alpha in [a_lc, pi/2] x (optionally log) p."""

    alpha_c: np.ndarray          # (n_a,) cell centers
    alpha_f: np.ndarray          # (n_a+1,) faces
    da: float
    p_c: np.ndarray              # (n_p,) cell centers  [m_e c]
    p_f: np.ndarray              # (n_p+1,) faces
    dp: np.ndarray               # (n_p,) cell widths
    dpc: np.ndarray              # (n_p-1,) center-to-center distances


def make_grid_2d(alpha_lc_rad, n_alpha, p_min_mc, p_max_mc, n_p,
                 log_p=True):
    """Build the (alpha_eq, p) grid. p in units of m_e c."""
    a_c, a_f, da = make_grid(alpha_lc_rad, n_alpha)
    if log_p:
        p_f = np.geomspace(p_min_mc, p_max_mc, n_p + 1)
    else:
        p_f = np.linspace(p_min_mc, p_max_mc, n_p + 1)
    p_c = 0.5 * (p_f[:-1] + p_f[1:])
    return Grid2D(a_c, a_f, float(da), p_c, p_f,
                  np.diff(p_f), np.diff(p_c))


def energy_from_p(p_mc):
    """Kinetic energy [keV] from momentum in m_e c units."""
    return (np.sqrt(1.0 + np.asarray(p_mc) ** 2) - 1.0) * _MC2_KEV


def p_from_energy(e_kev):
    """Momentum [m_e c] from kinetic energy [keV]."""
    gamma = 1.0 + np.asarray(e_kev) / _MC2_KEV
    return np.sqrt(gamma * gamma - 1.0)


def tensor_from_bounce(ba):
    """Convert diffusion.bounce_averaged output (SI) to solver units.

    Returns (daa [rad^2/s], dap [rad (m_e c)/s], dpp [(m_e c)^2/s])."""
    s = M_E * C_LIGHT
    return (np.asarray(ba["daa"]), np.asarray(ba["dap"]) / s,
            np.asarray(ba["dpp"]) / (s * s))


def _avg_a(x):
    """Cell-center -> interior-alpha-face arithmetic average (axis 0)."""
    return 0.5 * (x[1:, :] + x[:-1, :])


def _avg_p(x):
    """Cell-center -> interior-p-face arithmetic average (axis 1)."""
    return 0.5 * (x[:, 1:] + x[:, :-1])


@dataclass(frozen=True)
class _Op2D:
    """Assembled conductances (pytree leaves all jnp arrays).

    The tensor is split per cell as D = diag(remainder) + rank-1:
        D = [[daa - |c| s, 0], [0, dpp - |c|/s]]
          + |c| [[s, sgn c], [sgn c, 1/s]],      s = sqrt(daa/dpp),
    (both parts PSD whenever c^2 = dap^2 <= daa dpp). The diagonal
    remainder is discretized with compact face fluxes (k_a, k_p -- the
    1D-solver stencil, no odd-even decoupling); the rank-1 part with
    centered cell gradients as the EXACT perfect square
    |c| (sqrt(s) ga + sgn(c) gp / sqrt(s))^2 (r_a, r_x, r_p below), so
    the assembled operator is symmetric positive semidefinite BY
    CONSTRUCTION -- no cross-term limiter, even at the exactly-marginal
    det D = 0 tensors single-resonance physics produces."""

    k_a: jnp.ndarray      # (n_a-1, n_p) interior alpha-face conductance
    k_lc: jnp.ndarray     # (n_p,) loss-cone wall conductance (0 if reflect)
    k_p: jnp.ndarray      # (n_a, n_p-1) interior p-face conductance
    r_a: jnp.ndarray      # (n_a, n_p) rank-1 cell weight G V |c| s
    r_x: jnp.ndarray      # (n_a, n_p) rank-1 cell weight G V c (signed)
    r_p: jnp.ndarray      # (n_a, n_p) rank-1 cell weight G V |c| / s
    mass: jnp.ndarray     # (n_a, n_p) G_c * da * dp
    diag: jnp.ndarray     # (n_a, n_p) diagonal of A (preconditioner)
    da: float
    dpc: jnp.ndarray      # (n_p-1,)
    n_a: int
    n_p: int


jax.tree_util.register_dataclass(
    _Op2D,
    data_fields=["k_a", "k_lc", "k_p", "r_a", "r_x", "r_p", "mass",
                 "diag", "dpc"],
    meta_fields=["da", "n_a", "n_p"],
)


def make_operator_2d(grid: Grid2D, daa, dap, dpp, loss_cone="absorbing",
                     g_centers=None):
    """Assemble the 2D operator from the cell-centered tensor.

    daa/dap/dpp: (n_a, n_p) at grid cell centers, solver units (p in m_e c;
    see tensor_from_bounce). The physical Jacobian G(a,p) =
    p^2 T(a) sin a cos a is evaluated EXACTLY at the faces (the 1D
    solver's convention, so the D_ap = D_pp = 0 limit reduces to it to
    rounding); face D values are arithmetic center averages with endpoint
    copies at the walls, also matching the 1D solver. g_centers overrides
    G (tests use G = 1); overridden G is averaged to faces."""
    n_a, n_p = grid.alpha_c.size, grid.p_c.size
    daa = jnp.asarray(daa)
    dap = jnp.asarray(dap)
    dpp = jnp.asarray(dpp)

    da = grid.da
    dp = jnp.asarray(grid.dp)
    dpc = jnp.asarray(grid.dpc)

    if g_centers is None:
        t_c = bounce_time_factor(grid.alpha_c)
        t_f = bounce_time_factor(grid.alpha_f)
        ga_c = np.maximum(t_c * np.sin(grid.alpha_c) * np.cos(grid.alpha_c),
                          1.0e-12)
        ga_f = np.maximum(t_f * np.sin(grid.alpha_f) * np.cos(grid.alpha_f),
                          1.0e-12)
        g_c = jnp.asarray(ga_c[:, None] * grid.p_c[None, :] ** 2)
        g_af = jnp.asarray(ga_f[1:-1, None] * grid.p_c[None, :] ** 2)
        g_pf = jnp.asarray(ga_c[:, None] * grid.p_f[None, 1:-1] ** 2)
        g_wall = jnp.asarray(ga_f[0] * grid.p_c ** 2)
    else:
        g_c = jnp.asarray(g_centers)
        g_af = _avg_a(g_c)
        g_pf = _avg_p(g_c)
        g_wall = g_c[0, :]

    # PSD split (see _Op2D): rank-1 magnitudes per cell. Where one
    # diagonal entry vanishes the cross term must too (Dap^2 <= Daa Dpp);
    # guards keep the 0/0 limits at zero. Tiny PSD violations from the
    # bounce-average roundoff are absorbed by clipping the remainders.
    absc = jnp.abs(dap)
    tiny = jnp.asarray(np.finfo(np.asarray(daa).dtype).tiny * 1e4,
                       daa.dtype)
    s = jnp.sqrt(jnp.maximum(daa, tiny) / jnp.maximum(dpp, tiny))
    c_on = (absc > 0.0) & (daa > 0.0) & (dpp > 0.0)
    rank_a = jnp.where(c_on, absc * s, 0.0)
    rank_p = jnp.where(c_on, absc / s, 0.0)
    c_eff = jnp.where(c_on, dap, 0.0)
    daa_rem = jnp.maximum(daa - rank_a, 0.0)
    dpp_rem = jnp.maximum(dpp - rank_p, 0.0)

    # face conductances K = (G D)_face * (transverse width) / (normal dist)
    k_a = _avg_a(daa_rem) * g_af * dp[None, :] / da
    k_p = _avg_p(dpp_rem) * g_pf * da / dpc[None, :]

    if loss_cone == "absorbing":
        # Dirichlet f = 0 at the wall, half-cell distance (1D convention);
        # the wall flux carries the FULL Daa (the physical absorption)
        k_lc = daa[0, :] * g_wall * dp / (0.5 * da)
    elif loss_cone == "reflecting":
        k_lc = jnp.zeros((n_p,), daa.dtype)
    else:
        raise ValueError(f"unknown loss_cone {loss_cone!r}")

    vol = g_c * da * dp[None, :]
    r_a = rank_a * vol
    r_x = c_eff * vol
    r_p = rank_p * vol
    mass = vol

    # diagonal of A for the Jacobi preconditioner: face terms scatter K
    # onto both adjacent cells. The rank-1 corner quadrature contributes
    # too: each interior face gradient carries weight (r/4)(cell_lo +
    # cell_hi) summed over its two corners, so its Hessian adds
    # 0.5 (r_lo + r_hi) / h^2 to BOTH adjacent cells; the r_x cross term's
    # self-coefficient cancels exactly at interior cells (the two face
    # gradients' sensitivities are +-1/h), leaving only a small
    # uncompensated wall-cell term -- harmless in a preconditioner. With
    # an exactly rank-1 tensor the face remainders k_a/k_p vanish and
    # these terms ARE the whole diagonal (verified <=0.1% vs the true
    # Hessian diagonal; ~6% at walls in the general case).
    zrow = jnp.zeros((1, n_p), daa.dtype)
    diag = (jnp.concatenate([k_a, zrow], 0)
            + jnp.concatenate([zrow, k_a], 0))
    diag = diag.at[0, :].add(k_lc)
    zcol = jnp.zeros((n_a, 1), daa.dtype)
    diag = diag + (jnp.concatenate([k_p, zcol], 1)
                   + jnp.concatenate([zcol, k_p], 1))
    ra_face = 0.5 * (r_a[1:, :] + r_a[:-1, :]) / (da * da)
    diag = diag + (jnp.concatenate([ra_face, zrow], 0)
                   + jnp.concatenate([zrow, ra_face], 0))
    rp_face = 0.5 * (r_p[:, 1:] + r_p[:, :-1]) / (dpc[None, :] ** 2)
    diag = diag + (jnp.concatenate([rp_face, zcol], 1)
                   + jnp.concatenate([zcol, rp_face], 1))
    return _Op2D(k_a=k_a, k_lc=k_lc, k_p=k_p, r_a=r_a, r_x=r_x, r_p=r_p,
                 mass=mass, diag=diag, da=da, dpc=dpc, n_a=n_a, n_p=n_p)


def _energy(f, op: _Op2D):
    """0.5 a(f, f): the quadratic energy whose gradient is A f.

    Face terms carry the diagonal remainder. The rank-1 part is evaluated
    as a PERFECT SQUARE at the four corners of each cell (quarter-weight
    quadrature) using the adjacent FACE gradients:

        (1/4) sum_{A in {left,right}} sum_{P in {bottom,top}}
              |c| G V (sqrt(s) ga_A + sgn(c) gp_P / sqrt(s))^2

    Each corner term is a square (r_a r_p = r_x^2 by construction), so
    a(f,f) >= 0 termwise -- PSD with no limiter even at det D = 0. Using
    face gradients (not cell-centered ones) matters where the tensor is
    EXACTLY rank-1 over a region (single-resonance physics, e.g. the
    EMIC channel): the remainder vanishes there, and a centered-gradient
    square has an odd-even null mode that shows up as a checkerboard in
    the solution; face gradients see and damp it. Domain-wall gradients
    are taken as zero for the rank part (the absorbing loss-cone flux is
    carried by the dedicated full-D_aa wall term)."""
    ea = 0.5 * (op.k_a * (f[1:, :] - f[:-1, :]) ** 2).sum()
    elc = 0.5 * (op.k_lc * f[0, :] ** 2).sum()
    ep = 0.5 * (op.k_p * (f[:, 1:] - f[:, :-1]) ** 2).sum()
    ga_f = jnp.pad((f[1:, :] - f[:-1, :]) / op.da, ((1, 1), (0, 0)))
    gp_f = jnp.pad((f[:, 1:] - f[:, :-1]) / op.dpc[None, :],
                   ((0, 0), (1, 1)))
    quad = 0.0
    for ga in (ga_f[:-1, :], ga_f[1:, :]):
        for gp in (gp_f[:, :-1], gp_f[:, 1:]):
            quad = quad + (op.r_a * ga * ga + 2.0 * op.r_x * ga * gp
                           + op.r_p * gp * gp).sum()
    return ea + elc + ep + 0.125 * quad


_apply_a = jax.grad(_energy)       # A f: exactly symmetric by construction


def apply_operator_2d(op: _Op2D, f):
    """A f. df/dt = -(1/mass) A f is the semi-discrete equation."""
    return _apply_a(f, op)


def content_2d(op: _Op2D, f):
    """Particle number N = sum f G dV (conserved under zero-flux walls)."""
    return (f * op.mass).sum()


def _pcg(apply_h, b, x0, m_inv, tol, maxiter):
    """Jacobi-preconditioned CG on the SPD system H x = b (matrix-free)."""
    r = b - apply_h(x0)
    z = m_inv * r
    rz = (r * z).sum()
    bnorm = jnp.sqrt((b * b).sum())
    eps = tol * jnp.maximum(bnorm, 1.0e-300)

    tiny = jnp.asarray(1.0e-37 if b.dtype == jnp.float32 else 1.0e-300,
                       b.dtype)

    def cond(c):
        _, r, _, _, k = c
        return (jnp.sqrt((r * r).sum()) > eps) & (k < maxiter)

    def body(c):
        x, r, p, rz, k = c
        hp = apply_h(p)
        # denominators guarded for f32: underflowed curvature / rz would
        # turn a converged iterate into NaN instead of a no-op step
        alpha = rz / jnp.maximum((p * hp).sum(), tiny)
        x = x + alpha * p
        r = r - alpha * hp
        z = m_inv * r
        rz_new = (r * z).sum()
        p = z + (rz_new / jnp.maximum(rz, tiny)) * p
        return x, r, p, rz_new, k + 1

    x, r, _, _, k = jax.lax.while_loop(cond, body, (x0, r, z, rz, 0))
    return x, k


@partial(jax.jit, static_argnames=("n_steps", "save_every", "cg_maxiter"))
def evolve_cn_2d(f0, op: _Op2D, dt, n_steps, save_every=0,
                 cg_tol=None, cg_maxiter=500):
    """Crank-Nicolson evolution of M df/dt = -A f for n_steps of dt.

    Each step solves the SPD system (M + dt/2 A) f+ = (M - dt/2 A) f by
    preconditioned CG, warm-started from the previous f. save_every > 0
    additionally returns snapshots stacked on a leading axis; a
    n_steps % save_every remainder is still evolved (f_end always
    reflects the full n_steps). cg_tol defaults by dtype: 1e-10 in f64,
    3e-6 in f32 -- a tighter tol than f32 residuals can reach would
    silently burn cg_maxiter iterations per step."""
    if cg_tol is None:
        cg_tol = 1.0e-10 if f0.dtype == jnp.float64 else 3.0e-6
    half = 0.5 * dt
    m_inv = 1.0 / (op.mass + half * op.diag)

    def apply_h(x):
        return op.mass * x + half * _apply_a(x, op)

    def step(f, _):
        b = op.mass * f - half * _apply_a(f, op)
        f1, _ = _pcg(apply_h, b, f, m_inv, cg_tol, cg_maxiter)
        return f1, None

    if save_every:
        n_out, rem = divmod(n_steps, save_every)

        def chunk(f, _):
            f1, _ = jax.lax.scan(step, f, None, length=save_every)
            return f1, f1

        f_end, snaps = jax.lax.scan(chunk, f0, None, length=n_out)
        if rem:
            f_end, _ = jax.lax.scan(step, f_end, None, length=rem)
        return f_end, snaps
    f_end, _ = jax.lax.scan(step, f0, None, length=n_steps)
    return f_end
