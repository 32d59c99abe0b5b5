"""Radial diffusion solver (radial.py).

The operator reuses the 1D Fokker-Planck machinery already pinned in
test_fokker_planck.py; these tests verify the radial specifics: the
L^-2 Jacobian (steady profile against the exact flux-constancy
quadrature), the held outer Dirichlet source, loss-term behavior (slot
formation where 1/tau is large), and CN relaxation onto the direct
steady solve."""

import numpy as np
import pytest

from raytrace_tpu import radial


def _grid(n=200):
    return radial.make_l_grid(1.5, 6.5, n)


def test_steady_state_matches_flux_quadrature():
    """No losses: the equilibrium has constant flux G D df/dL, so
    f(L) = f_out * int_{Lin}^{L} L'^2/D dL' / int_{Lin}^{Lout} -- compare
    the FV solve against the exact quadrature (2nd-order in h)."""
    centers, faces, dl = _grid(400)
    d_faces = radial.dll_power_law(faces, d0=3e-7, q=10.0)
    f = np.asarray(radial.steady_state(centers, faces, dl, d_faces,
                                       f_out=2.5))
    # exact: integrate L^2/D from the inner wall on a fine lattice
    lfine = np.linspace(faces[0], faces[-1], 20001)
    integrand = lfine**2 / radial.dll_power_law(lfine, d0=3e-7, q=10.0)
    big = np.concatenate([[0.0], np.cumsum(
        0.5 * (integrand[1:] + integrand[:-1]) * np.diff(lfine))])
    exact = 2.5 * np.interp(centers, lfine, big) / big[-1]
    err = np.abs(f - exact).max() / exact.max()
    # the max sits in the first cell (half-cell Dirichlet wall is locally
    # first-order where D varies steeply); interior order is pinned by
    # the Richardson test below
    assert err < 1e-3, err
    assert f[-1] < 2.5 and np.all(np.diff(f) > 0)      # monotone inward drop


def test_resolution_convergence_second_order():
    def solve(n):
        centers, faces, dl = _grid(n)
        d_faces = radial.dll_power_law(faces, d0=3e-7, q=8.0)
        f = np.asarray(radial.steady_state(centers, faces, dl, d_faces))
        return np.interp(4.0, centers, f)

    f1, f2, f4 = solve(100), solve(200), solve(400)
    # Richardson: successive differences shrink ~4x for a 2nd-order scheme
    r = abs(f1 - f2) / abs(f2 - f4)
    assert 3.0 < r < 5.5, r


def test_loss_carves_a_slot():
    """A localized loss band (hiss inside the plasmasphere) depresses the
    equilibrium locally -- the classic slot mechanism. Removing the loss
    restores the monotone no-loss profile."""
    centers, faces, dl = _grid(240)
    d_faces = radial.dll_power_law(faces, d0=3e-7, q=10.0)
    inv_tau = 2e-5 * np.exp(-((centers - 3.0) / 0.4) ** 2)
    f_loss = np.asarray(radial.steady_state(centers, faces, dl, d_faces,
                                            inv_tau_centers=inv_tau))
    f_free = np.asarray(radial.steady_state(centers, faces, dl, d_faces))
    i_slot = np.argmin(np.abs(centers - 3.0))
    i_out = np.argmin(np.abs(centers - 5.5))
    assert f_loss[i_slot] < 0.2 * f_free[i_slot]       # deep slot
    assert f_loss[i_out] > 0.8 * f_free[i_out]         # outer zone intact
    # losses only remove particles: f_loss <= f_free everywhere
    assert (f_loss <= f_free + 1e-12).all()


def test_cn_relaxes_to_steady_state():
    centers, faces, dl = _grid(120)
    d_faces = radial.dll_power_law(faces, d0=1e-6, q=10.0)
    inv_tau = 5e-6 * np.exp(-((centers - 3.0) / 0.5) ** 2)
    f_ss = np.asarray(radial.steady_state(centers, faces, dl, d_faces,
                                          f_out=1.0,
                                          inv_tau_centers=inv_tau))
    # D_LL ~ L^10 makes the inner-zone diffusion time years: ~10 sim-years
    # of CN steps relax the whole profile onto the direct solve
    f_t = np.asarray(radial.evolve_radial(
        np.zeros_like(centers), centers, faces, dl, d_faces,
        dt=2.0e4, n_steps=16000, f_out=1.0, inv_tau_centers=inv_tau))
    np.testing.assert_allclose(f_t, f_ss, rtol=1e-4, atol=1e-8 * f_ss.max())


def test_snapshots_fill_inward():
    """From an empty belt the Dirichlet source fills the interior inward
    through time; the (non-L-stable) CN overshoot around the held outer
    value stays bounded at the percent level."""
    centers, faces, dl = _grid(100)
    d_faces = radial.dll_power_law(faces, d0=1e-6, q=10.0)
    _, snaps = radial.evolve_radial(
        np.zeros_like(centers), centers, faces, dl, d_faces,
        dt=5.0e3, n_steps=4000, f_out=1.0, save_every=800)
    snaps = np.asarray(snaps)
    assert snaps.shape[0] == 5
    for l_probe in (2.5, 3.5, 4.5):
        i = np.argmin(np.abs(centers - l_probe))
        assert (np.diff(snaps[:, i]) > -1e-12).all(), l_probe
    assert snaps.max() < 1.02
    assert snaps[-1, np.argmin(np.abs(centers - 5.5))] > 0.5


def test_crand_source_builds_inner_belt():
    """A volumetric source behind a deep loss barrier sustains a local
    population the outer boundary cannot supply (the CRAND inner belt):
    with the source, f has a local maximum at the source location; without
    it, f is negligible there."""
    centers, faces, dl = _grid(240)
    d_faces = radial.dll_power_law(faces, d0=3e-8, q=10.0)
    inv_tau = 1e-5 * np.exp(-((centers - 3.2) / 0.5) ** 2)   # deep barrier
    src = 1e-9 * np.exp(-((centers - 1.9) / 0.2) ** 2)
    f_src = np.asarray(radial.steady_state(centers, faces, dl, d_faces,
                                           inv_tau_centers=inv_tau,
                                           source_centers=src))
    f_no = np.asarray(radial.steady_state(centers, faces, dl, d_faces,
                                          inv_tau_centers=inv_tau))
    i_in = np.argmin(np.abs(centers - 1.9))
    assert f_src[i_in] > 10.0 * max(f_no[i_in], 1e-30)
    # local maximum at the source, not a monotone boundary-fed profile
    assert f_src[i_in] > f_src[np.argmin(np.abs(centers - 2.8))]
    # outer zone unchanged by the inner source
    i_out = np.argmin(np.abs(centers - 5.5))
    np.testing.assert_allclose(f_src[i_out], f_no[i_out], rtol=1e-6)


def test_evolve_radial_remainder_steps():
    """evolve_radial with n_steps % save_every != 0 evolves the full
    n_steps (shared fokker_planck.evolve_cn remainder handling)."""
    centers, faces, dl = radial.make_l_grid(1.6, 6.4, 40)
    d_faces = radial.dll_power_law(faces, d0=3.0e-8)
    f0 = np.zeros(centers.size)
    f_plain = np.asarray(radial.evolve_radial(
        f0, centers, faces, dl, d_faces, dt=2.0e4, n_steps=11, f_out=1.0))
    f_chunk, snaps = radial.evolve_radial(
        f0, centers, faces, dl, d_faces, dt=2.0e4, n_steps=11, f_out=1.0,
        save_every=4)
    assert np.asarray(snaps).shape[0] == 2
    np.testing.assert_allclose(np.asarray(f_chunk), f_plain, rtol=1e-12)
