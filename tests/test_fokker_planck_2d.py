"""2D pitch-angle + momentum Fokker-Planck solver (fokker_planck_2d.py).

The operator is the gradient of an explicit quadratic energy form, so
symmetry is structural; these tests verify the rest: positive
semidefiniteness on physical (PSD) tensors, particle conservation under
zero-flux walls, exact reduction to the validated 1D solver when the
momentum terms vanish, and the analytic covariance growth
Cov(t) = Cov0 + 2 D t of an anisotropic Gaussian under a constant
cross-coupled tensor (the decisive check that the cross-term
discretization carries the right physics, not just the right symmetry)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu import fokker_planck as fp1
from raytrace_tpu import fokker_planck_2d as fp2


def _dense(op, na, npp):
    n = na * npp
    a = np.zeros((n, n))
    for k in range(n):
        e = np.zeros(n)
        e[k] = 1.0
        a[:, k] = np.asarray(
            fp2.apply_operator_2d(op, jnp.asarray(e.reshape(na, npp)))
        ).ravel()
    return a


def test_operator_symmetric_and_psd():
    """A is exactly symmetric; PSD whenever Dap^2 <= Daa Dpp pointwise
    (strictly PD with the absorbing loss-cone wall)."""
    g = fp2.make_grid_2d(np.radians(8.0), 10, 0.5, 4.0, 9)
    rng = np.random.default_rng(1)
    na, npp = 10, 9
    a11 = rng.uniform(0.3, 3.0, (na, npp))
    a22 = rng.uniform(0.3, 3.0, (na, npp))
    a12 = rng.uniform(-0.95, 0.95, (na, npp)) * np.sqrt(a11 * a22)
    op = fp2.make_operator_2d(g, a11, a12, a22)
    a = _dense(op, na, npp)
    assert np.abs(a - a.T).max() <= 1e-13 * np.abs(a).max()
    ev = np.linalg.eigvalsh(0.5 * (a + a.T))
    assert ev.min() > 0.0
    # reflecting wall: constants in the kernel (conservative, PSD)
    op_r = fp2.make_operator_2d(g, a11, a12, a22, loss_cone="reflecting")
    a_r = _dense(op_r, na, npp)
    ev_r = np.linalg.eigvalsh(0.5 * (a_r + a_r.T))
    assert ev_r.min() > -1e-12 * ev_r.max()
    assert np.abs(a_r.sum(axis=0)).max() < 1e-12 * np.abs(a_r).max()


def test_conservation_reflecting():
    """Zero-flux everywhere: N = int f G dV constant to the CG tolerance."""
    g = fp2.make_grid_2d(np.radians(10.0), 16, 0.3, 3.0, 12)
    rng = np.random.default_rng(2)
    a11 = rng.uniform(0.5, 2.0, (16, 12))
    a22 = rng.uniform(0.5, 2.0, (16, 12))
    a12 = rng.uniform(-0.8, 0.8, (16, 12)) * np.sqrt(a11 * a22)
    op = fp2.make_operator_2d(g, a11, a12, a22, loss_cone="reflecting")
    f0 = jnp.asarray(rng.uniform(0.5, 1.5, (16, 12)))
    f1 = fp2.evolve_cn_2d(f0, op, 0.02, 40, cg_tol=1e-13)
    n0 = float(fp2.content_2d(op, f0))
    n1 = float(fp2.content_2d(op, f1))
    assert abs(n1 - n0) < 1e-11 * n0


def test_absorbing_wall_loses_particles():
    g = fp2.make_grid_2d(np.radians(10.0), 16, 0.3, 3.0, 12)
    a11 = np.full((16, 12), 1.0)
    zero = np.zeros((16, 12))
    op = fp2.make_operator_2d(g, a11, zero, zero)
    f0 = jnp.ones((16, 12))
    f1 = fp2.evolve_cn_2d(f0, op, 0.005, 60)
    assert float(fp2.content_2d(op, f1)) < 0.9 * float(
        fp2.content_2d(op, f0))
    assert float(f1.min()) > -1e-9      # CN undershoot stays negligible


def test_reduces_to_1d_solver():
    """D_ap = D_pp = 0 and p-independent D_aa: each p row must evolve
    exactly as the validated 1D solver (same G, same walls)."""
    a_lc = np.radians(12.0)
    n_a, n_p = 48, 6
    g2 = fp2.make_grid_2d(a_lc, n_a, 0.5, 2.0, n_p)
    centers, faces, da = fp1.make_grid(a_lc, n_a)
    daa_a = 0.02 + 0.01 * np.sin(3.0 * centers) ** 2

    op = fp2.make_operator_2d(
        g2, np.broadcast_to(daa_a[:, None], (n_a, n_p)),
        np.zeros((n_a, n_p)), np.zeros((n_a, n_p)))
    f0_a = np.sin(centers - a_lc) + 0.2
    f0 = jnp.asarray(np.broadcast_to(f0_a[:, None], (n_a, n_p)))
    dt, n_steps = 0.4, 25
    f2d = np.asarray(fp2.evolve_cn_2d(f0, op, dt, n_steps, cg_tol=1e-13))

    g_c = fp1.bounce_time_factor(centers) * np.sin(centers) * np.cos(centers)
    g_f = np.maximum(fp1.bounce_time_factor(faces) * np.sin(faces)
                     * np.cos(faces), 1e-12)
    d_faces = np.concatenate([daa_a[:1], 0.5 * (daa_a[1:] + daa_a[:-1]),
                              daa_a[-1:]])
    tri = fp1.build_operator(jnp.asarray(d_faces), jnp.asarray(g_c),
                             jnp.asarray(g_f), da)
    f1d = np.asarray(fp1.evolve_cn(jnp.asarray(f0_a), tri, dt, n_steps))

    for j in range(n_p):
        np.testing.assert_allclose(f2d[:, j], f1d, rtol=1e-12, atol=1e-14)


def test_gaussian_covariance_growth():
    """Constant tensor with cross term, G = 1, uniform grids: an interior
    Gaussian's covariance must grow as Cov(t) = Cov0 + 2 D t (exact
    solution of the constant-coefficient anisotropic diffusion equation)."""
    n_a, n_p = 96, 96
    a_lc = 0.2
    g = fp2.make_grid_2d(a_lc, n_a, 0.0, 1.0, n_p, log_p=False)
    d = np.array([[1.0, 0.45], [0.45, 0.5]]) * 1e-4
    ones = np.ones((n_a, n_p))
    op = fp2.make_operator_2d(
        g, d[0, 0] * ones, d[0, 1] * ones, d[1, 1] * ones,
        loss_cone="reflecting", g_centers=jnp.asarray(ones))

    ac = g.alpha_c
    pc = g.p_c
    x0, y0 = ac[n_a // 2], pc[n_p // 2]
    sig = 0.06
    xx, yy = np.meshgrid(ac - x0, pc - y0, indexing="ij")
    f0 = np.exp(-(xx**2 + yy**2) / (2 * sig**2))

    t_end = 20.0
    f1 = np.asarray(fp2.evolve_cn_2d(jnp.asarray(f0), op, 0.5,
                                     int(t_end / 0.5), cg_tol=1e-12))

    def cov(f):
        w = f / f.sum()
        mx = (w * xx).sum()
        my = (w * yy).sum()
        return np.array([
            [(w * (xx - mx) ** 2).sum(), (w * (xx - mx) * (yy - my)).sum()],
            [(w * (xx - mx) * (yy - my)).sum(), (w * (yy - my) ** 2).sum()],
        ])

    got = cov(f1) - cov(f0)
    want = 2.0 * d * t_end
    np.testing.assert_allclose(got, want, rtol=0.02)


def test_momentum_diffusion_accelerates():
    """Pure D_pp > 0 with the physical G = p^2 T sin cos: mean momentum of
    an initially low-p population increases (acceleration), and the
    equatorially-mirroring population stays put in alpha."""
    g = fp2.make_grid_2d(np.radians(15.0), 24, 0.3, 5.0, 48)
    n_a, n_p = 24, 48
    zero = np.zeros((n_a, n_p))
    dpp = np.full((n_a, n_p), 3e-3)
    op = fp2.make_operator_2d(g, zero, zero, dpp, loss_cone="reflecting")
    # seed at low p, all alpha
    f0 = np.exp(-((g.p_c[None, :] - 0.5) / 0.15) ** 2) * np.ones((n_a, 1))
    f1 = np.asarray(fp2.evolve_cn_2d(jnp.asarray(f0), op, 5.0, 40,
                                     cg_tol=1e-12))
    w0 = f0 * np.asarray(op.mass)
    w1 = f1 * np.asarray(op.mass)
    p_mean0 = (w0 * g.p_c[None, :]).sum() / w0.sum()
    p_mean1 = (w1 * g.p_c[None, :]).sum() / w1.sum()
    assert p_mean1 > p_mean0 + 0.05
    # no pitch-angle transport: the alpha marginal shape is unchanged
    ma0 = w0.sum(axis=1) / w0.sum()
    ma1 = w1.sum(axis=1) / w1.sum()
    np.testing.assert_allclose(ma1, ma0, rtol=1e-6)


def test_unit_helpers_roundtrip():
    e = np.array([30.0, 300.0, 3000.0])
    np.testing.assert_allclose(fp2.energy_from_p(fp2.p_from_energy(e)), e,
                               rtol=1e-12)


def test_psd_at_exactly_marginal_tensor():
    """Single-resonance physics produces EXACTLY rank-1 local tensors
    (det D = 0, |Dap| = sqrt(Daa Dpp)). The naive face/cell mixed
    discretization is indefinite there (measured -1e-3 of the max
    eigenvalue before the split scheme); the remainder + perfect-square
    split must stay PSD to roundoff with no cross-term limiter."""
    g = fp2.make_grid_2d(np.radians(8.0), 12, 0.4, 3.0, 11)
    rng = np.random.default_rng(7)
    na, npp = 12, 11
    a11 = rng.uniform(0.3, 3.0, (na, npp))
    a22 = rng.uniform(0.3, 3.0, (na, npp))
    sgn = np.where(rng.uniform(size=(na, npp)) < 0.5, -1.0, 1.0)
    a12 = sgn * np.sqrt(a11 * a22)            # det = 0 everywhere
    op = fp2.make_operator_2d(g, a11, a12, a22)
    a = _dense(op, na, npp)
    ev = np.linalg.eigvalsh(0.5 * (a + a.T))
    assert ev.min() > -1e-13 * ev.max()
    # and evolution from a rough state stays bounded
    f0 = jnp.asarray(rng.uniform(0.0, 1.0, (na, npp)))
    f1 = fp2.evolve_cn_2d(f0, op, 0.5, 200, cg_tol=1e-12)
    assert np.isfinite(np.asarray(f1)).all()
    assert float(jnp.abs(f1).max()) < 2.0


def test_checkerboard_mode_is_damped():
    """Where the tensor is exactly rank-1 the diagonal remainder vanishes,
    and a cell-centered-gradient cross discretization leaves an odd-even
    (checkerboard) null mode that contaminates the solution (seen as a
    sawtooth in the EMIC-dominated region of examples/belt_competition.py
    before the corner-quadrature scheme). With face-gradient corner
    quadrature the checkerboard must DECAY under evolution."""
    na, npp = 20, 18
    g = fp2.make_grid_2d(np.radians(8.0), na, 0.4, 3.0, npp)
    # exactly rank-1, alpha-dominant (the EMIC shape): daa >> dpp
    daa = np.full((na, npp), 1.0)
    dpp = np.full((na, npp), 1e-5)
    dap = np.sqrt(daa * dpp)
    op = fp2.make_operator_2d(g, daa, dap, dpp, loss_cone="reflecting")
    ii, jj = np.meshgrid(np.arange(na), np.arange(npp), indexing="ij")
    checker = ((-1.0) ** (ii + jj)).astype(float)
    f0 = jnp.asarray(1.0 + 0.2 * checker)
    f1 = np.asarray(fp2.evolve_cn_2d(f0, op, 0.05, 80, cg_tol=1e-12))
    amp0 = np.abs((np.asarray(f0) * checker).mean())
    amp1 = np.abs((f1 * checker).mean())
    assert amp1 < 0.02 * amp0
    assert np.abs(f1 - 1.0).max() < 0.05


def test_preconditioner_diag_matches_hessian():
    """op.diag tracks the TRUE diagonal of A -- including the rank-1
    corner-quadrature self-coefficients. Decisive case: an exactly
    rank-1 tensor (single-resonance physics, e.g. the EMIC channel),
    where the face remainders vanish and the rank-1 terms ARE the whole
    diagonal; a stale diag there degenerates Jacobi-PCG to mass scaling."""
    g = fp2.make_grid_2d(np.radians(8.0), 7, 0.5, 4.0, 6)
    na, npp = 7, 6
    daa = np.full((na, npp), 1.0)
    dpp = np.full((na, npp), 1e-5)
    dap = np.sqrt(daa * dpp)
    op = fp2.make_operator_2d(g, daa, dap, dpp)
    true_diag = np.diag(_dense(op, na, npp)).reshape(na, npp)
    np.testing.assert_allclose(np.asarray(op.diag), true_diag, rtol=5e-3)

    # general PSD tensor: only the wall cells' uncompensated cross term
    # may deviate (~10%); interior must be exact to roundoff
    rng = np.random.default_rng(3)
    daa = rng.uniform(0.5, 2.0, (na, npp))
    dpp = rng.uniform(0.5, 2.0, (na, npp))
    dap = rng.uniform(-0.95, 0.95, (na, npp)) * np.sqrt(daa * dpp)
    op = fp2.make_operator_2d(g, daa, dap, dpp)
    true_diag = np.diag(_dense(op, na, npp)).reshape(na, npp)
    rel = np.abs(np.asarray(op.diag) - true_diag) / np.abs(true_diag)
    assert rel.max() < 0.15
    assert rel[1:-1, 1:-1].max() < 1e-6


def test_save_every_remainder_still_evolved():
    """n_steps % save_every != 0: f_end reflects ALL n_steps (the
    remainder tail is not silently dropped)."""
    g = fp2.make_grid_2d(np.radians(8.0), 6, 0.5, 3.0, 5)
    rng = np.random.default_rng(5)
    daa = rng.uniform(0.5, 2.0, (6, 5))
    op = fp2.make_operator_2d(g, daa, np.zeros((6, 5)), np.zeros((6, 5)))
    f0 = jnp.asarray(rng.uniform(0.5, 1.5, (6, 5)))
    f_plain = fp2.evolve_cn_2d(f0, op, 0.05, 7, cg_tol=1e-12)
    f_chunk, snaps = fp2.evolve_cn_2d(f0, op, 0.05, 7, save_every=3,
                                      cg_tol=1e-12)
    assert snaps.shape[0] == 2
    np.testing.assert_allclose(np.asarray(f_chunk), np.asarray(f_plain),
                               rtol=1e-9)
