"""Convection tier (convection.py): Volland-Stern + corotation drift
paths, the derived plasmapause, and energy-dependent Alfven layers.

The headline validation is the one the module was built for: the MLT-
averaged last-closed-equipotential radius, derived purely from drift
kinematics on the framework's own dipole, must reproduce the EMPIRICAL
CA1992 plasmapause-Kp relation (Lppi = 5.6 - 0.46 Kp, which the
reference takes as input at plasmasphere.jl:43) across the active-Kp
range -- the module itself never quotes that relation."""

import math

import numpy as np


from raytrace_tpu import convection as cv
from raytrace_tpu.constants import C_LIGHT, M_E, Q_E, RE
from raytrace_tpu.models.plasmasphere import lppi_from_kp


def test_corotation_constant_and_rate():
    """C_cor = Omega B0 RE^2 ~ 92 kV, and the E x B rate of the
    corotation term alone is exactly Omega_E (checked at noon, where
    the Volland-Stern term contributes nothing to dphi/dt)."""
    assert 9.0e4 < cv.C_COROTATION_V < 9.5e4
    for l in (1.5, 3.0, 6.0):
        d = cv.exb_drift(l, 0.0, kp=3.0)
        np.testing.assert_allclose(d["dphi_dt"], cv.OMEGA_EARTH,
                                   rtol=1e-12)
    # and at noon the radial E x B drift is purely the convection term:
    # dL/dt = -dPhi/dphi/(L RE^2 B) = A L^g cos(phi)/(L RE^2 B) > 0
    # (sunward flow leaves the dayside)
    d = cv.exb_drift(6.0, 0.0, kp=3.0)
    assert d["dl_dt"] > 0.0


def test_stagnation_point_closed_form():
    """Numeric saddle location matches L_s = (C/(gamma A))^(1/(g+1))
    and the potential has a genuine saddle there: dPhi/dL = 0 and
    dPhi/dphi = 0 at dusk."""
    for kp in (1.0, 3.0, 6.0):
        l_s, phi_s = cv.stagnation_point(kp)
        a = float(cv.maynard_chen_a(kp))
        np.testing.assert_allclose(
            l_s, (cv.C_COROTATION_V / (2.0 * a)) ** (1.0 / 3.0),
            rtol=1e-12)
        d = cv.exb_drift(l_s, 0.5 * math.pi, kp)
        # both drift components vanish at the stagnation point
        v_phi = d["dphi_dt"] * l_s * RE
        v_r = d["dl_dt"] * RE
        assert abs(v_phi) < 1e-9 and abs(v_r) < 1e-9


def test_derived_plasmapause_matches_ca1992_kp_relation():
    """The drift-derived MLT-mean LCE radius reproduces the empirical
    Lppi(Kp) the reference hardcodes: within 5% at the canonical
    Kp_max = 3, within 12% over the storm range Kp in [2, 6], and
    monotonically eroding with Kp. (Quiet time Kp < 2 is excluded by
    design: the observed quiet plasmapause is a diffuse, history-
    dependent boundary the LCE overestimates -- documented behavior.)"""
    pp3 = cv.plasmapause(3.0)
    assert abs(pp3["l_mean"] - lppi_from_kp(3.0)) / lppi_from_kp(3.0) < 0.05
    prev = None
    for kp in (2.0, 3.0, 4.0, 5.0, 6.0):
        pp = cv.plasmapause(kp)
        emp = lppi_from_kp(kp)
        assert abs(pp["l_mean"] - emp) / emp < 0.12, (kp, pp["l_mean"], emp)
        if prev is not None:
            assert pp["l_mean"] < prev
        prev = pp["l_mean"]


def test_plasmapause_shape():
    """Classic teardrop: bulge at dusk (the max radius equals the
    stagnation radius there), constriction between dawn and noon, and
    the boundary is an equipotential (same Phi everywhere on it)."""
    pp = cv.plasmapause(3.0, n_mlt=192)
    i_max = int(np.argmax(pp["l_pp"]))
    # bulge sits at dusk (+pi/2)
    assert abs(pp["mlt_rad"][i_max] - 0.5 * math.pi) < 0.1
    # the separatrix has an X-point corner at the saddle, so on a
    # cell-centered MLT grid the max radius sits half a cell off dusk
    # and undershoots L_s slightly (quadratic contour, linear gap)
    np.testing.assert_allclose(pp["l_pp"][i_max], pp["l_stag"], rtol=0.02)
    assert pp["l_pp"][i_max] <= pp["l_stag"] + 1e-9
    # it is a single equipotential
    phi_on = cv.potential(pp["l_pp"], pp["mlt_rad"], 3.0)
    _, phi_s = cv.stagnation_point(3.0)
    np.testing.assert_allclose(phi_on, phi_s, rtol=1e-6)
    # dawn side tighter than dusk side
    i_dawn = int(np.argmin(np.abs(pp["mlt_rad"] + 0.5 * math.pi)))
    assert pp["l_pp"][i_dawn] < 0.75 * pp["l_pp"][i_max]


def test_closed_drift_path_returns_to_start():
    """A cold parcel launched inside the plasmapause returns to its
    launch radius after one full azimuthal circuit (closed orbit), with
    period near (but below) the corotation day -- convection speeds the
    nightside leg."""
    l0 = 3.0
    span = 1.1 * 2.0 * math.pi / cv.OMEGA_EARTH
    tr = cv.trace_drift_path(l0, 0.0, kp=3.0, t_span_s=span,
                             n_steps=6000)
    assert not tr["escaped"]
    i_ret = int(np.argmax(tr["mlt_rad"] > 2.0 * math.pi))
    assert i_ret > 0, "did not complete a circuit"
    np.testing.assert_allclose(tr["l"][i_ret], l0, rtol=1e-3)


def test_open_drift_path_escapes_sunward():
    """A parcel outside the LCE convects out: escaped flag set, and the
    escape happens moving sunward/dayside (dl/dt > 0 at exit)."""
    tr = cv.trace_drift_path(6.5, 0.0, kp=3.0, t_span_s=3600.0 * 48,
                             n_steps=4000)
    assert tr["escaped"]
    assert tr["l"][tr["n_valid"] - 1] > 6.5


def test_alfven_layer_zero_energy_limit_is_plasmapause():
    """M -> 0 collapses the drift Hamiltonian to the potential: the
    zero-energy Alfven layer IS the last closed equipotential."""
    al = cv.alfven_layer(1e-9, kp=3.0)
    pp = cv.plasmapause(3.0)
    np.testing.assert_allclose(al["l_stag"][0], pp["l_stag"], rtol=1e-6)
    np.testing.assert_allclose(al["l_mean"][0], pp["l_mean"], rtol=1e-4)
    np.testing.assert_allclose(al["l_layer"][0], pp["l_pp"], rtol=1e-4)


def test_alfven_layer_grows_with_energy_and_scaling():
    """Electron layers move OUTWARD with energy (eastward gradient
    drift reinforces corotation against convection), and in the
    drift-dominated regime the saddle follows the analytic scaling
    L_s^2 ~ 3 E_k eff/(2 e A) to ~10%."""
    e = np.array([0.1, 1.0, 5.0, 20.0, 100.0])
    al = cv.alfven_layer(e, kp=3.0)
    assert (np.diff(al["l_stag"]) > 0.0).all()
    assert (np.diff(al["l_mean"]) > 0.0).all()
    # analytic drift-dominated scaling at the top energy (gamma ~ 1):
    # dH/dL = 0 with the M term ~ 3 E_k/L >> corotation gives
    # L_s = sqrt(3 E_k_eV * ((gamma+1)/(2 gamma)) / (2 A_V))
    a_v = float(cv.maynard_chen_a(3.0))
    g = 1.0 + 100e3 * Q_E / (M_E * C_LIGHT**2)
    e_eff = 100e3 * (g + 1.0) / (2.0 * g)
    l_pred = math.sqrt(3.0 * e_eff / (2.0 * a_v))
    np.testing.assert_allclose(al["l_stag"][-1], l_pred, rtol=0.10)


def test_alfven_layer_hamiltonian_is_constant_on_layer():
    """The computed layer is a genuine H-contour."""
    al = cv.alfven_layer(2.0, kp=4.0)
    h = cv.electron_hamiltonian(al["l_layer"][0], al["mlt_rad"],
                                al["m_inv"][0], kp=4.0)
    h_sep = cv.electron_hamiltonian(al["l_stag"][0], 0.5 * math.pi,
                                    al["m_inv"][0], kp=4.0)
    # H is dominated by the rest energy; compare the dynamic part
    rest = M_E * C_LIGHT**2
    np.testing.assert_allclose(h - rest, h_sep - rest, rtol=1e-5)


def test_maynard_chen_monotone_and_positive():
    """Positive everywhere (the denominator quadratic has no real
    roots); monotone on the fit's validity range -- the denominator
    bottoms out at Kp = 0.159/(2*0.0093) ~ 8.5, beyond the Kp <= 6
    range Maynard & Chen fitted."""
    kp = np.linspace(0.0, 9.0, 50)
    a = cv.maynard_chen_a(kp)
    assert (a > 0.0).all()
    kp = np.linspace(0.0, 8.5, 50)
    assert (np.diff(cv.maynard_chen_a(kp)) > 0.0).all()


def test_erosion_times_derive_storm_tau():
    """The drift-kinematic stripping time after a Kp step lands on the
    hours scale models/storm.py assumes for tau_erode (~3 h), and
    stronger storms strip faster. Everything seeded on the quiet
    boundary is outside the storm LCE and eventually leaves."""
    prev = None
    for ks in (4.0, 5.0, 6.0):
        r = cv.erosion_times(1.0, ks, n_mlt=16)
        assert r["frac_stripped"] == 1.0
        # healthy integration: no RK4 blow-ups masquerading as strips
        assert r["n_diverged"] == 0
        assert np.isfinite(r["t_strip_s"]).all()
        t_h = r["t_median_s"] / 3600.0
        assert 0.5 < t_h < 12.0, t_h
        if prev is not None:
            assert t_h < prev
        prev = t_h


def test_lppi_derived_drop_in_for_storm_chain():
    """lppi_derived is a drop-in for the empirical fit in the storm
    relaxation: same shapes, ~12% agreement over the active range, and
    plasmapause_history accepts it via lppi_fn with sane output."""
    from raytrace_tpu.models import storm

    kps = np.array([2.0, 4.0, 6.0])
    der = cv.lppi_derived(kps, n_mlt=32)
    emp = lppi_from_kp(kps)
    assert der.shape == emp.shape
    assert (np.abs(der - emp) / emp < 0.12).all()
    assert isinstance(cv.lppi_derived(3.0, n_mlt=32), float)

    t = np.linspace(0.0, 48.0, 9)
    kp_h = np.array([0.0, 12.0, 24.0])
    kp_v = np.array([1.0, 5.0, 2.0])
    lpp_e = storm.plasmapause_history(t, kp_h, kp_v)
    lpp_d = storm.plasmapause_history(
        t, kp_h, kp_v, lppi_fn=lambda k: cv.lppi_derived(k, n_mlt=24),
        dt_hours=1.0)
    assert lpp_d.shape == lpp_e.shape
    assert np.isfinite(lpp_d).all() and (lpp_d > 1.5).all()
    # same storm story: erodes after the Kp=5 onset
    assert lpp_d[4] < lpp_d[0]


def test_lppi_at_mlt_dusk_bulge_and_env_pinning():
    """Per-MLT boundary: dusk sits well outside dawn; values track the
    full contour; an MLT-local env pins its knee to the derived radius
    through the same kp_max inversion storm.py uses."""
    from raytrace_tpu.models import medium

    l_dusk = cv.lppi_at_mlt(3.0, 18.0)
    l_dawn = cv.lppi_at_mlt(3.0, 6.0)
    assert l_dusk > 1.25 * l_dawn
    # array input + periodicity (30 h == 6 h)
    arr = cv.lppi_at_mlt(3.0, np.array([6.0, 18.0, 30.0]))
    np.testing.assert_allclose(arr[0], arr[2], rtol=1e-12)
    np.testing.assert_allclose(arr[0], l_dawn, rtol=1e-12)
    # env pinning: the pre-solved inner knee lands on the derived radius
    env = medium.make_env(kp_max=(5.6 - l_dawn) / 0.46)
    np.testing.assert_allclose(float(env.lppi), l_dawn, rtol=1e-9)
