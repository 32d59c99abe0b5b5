"""Whistler growth/damping rates (growth.py) -- Kennel-Petschek class.

The hot bi-Maxwellian susceptibility is derived symbolically in
tools/derive_growth.py with its conventions pinned to this repo's cold
dispersion (cold limit == Stix R electron term) and to the independently
known KP threshold. These tests verify the numerical implementation:
threshold location, growth/damping signs, parameter scalings, the dR/dw
closed form, and the path-gain integral on a traced ray."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.constants import FCE_E, RE
from raytrace_tpu.growth import (
    HotElectrons, _dr_dw, equatorial_gain_profile, gamma_whistler, path_gain,
)
from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
from raytrace_tpu.models import make_env_lat
from raytrace_tpu.ops import dispersion, rhs

# L=4-equator-like reference medium: fce ~ 13.6 kHz, 1000 cm^-3
BMAG = 3.12e-5 / 64.0
NE = 1.0e9
FCE = FCE_E * BMAG
HOT = HotElectrons(eta=1.0e-3, t_par_ev=10.0e3, anisotropy=1.0)


def test_threshold_at_kp_critical_anisotropy():
    """gamma changes sign EXACTLY at f_c = fce * A/(1+A) (equivalently
    A = A_c = f/(fce - f), analysis.kp_critical_anisotropy): growth below,
    damping above -- the marginal-stability fact the derivation asserts
    symbolically (tools/derive_growth.py check (b))."""
    f_c = FCE * HOT.anisotropy / (1.0 + HOT.anisotropy)
    below = float(gamma_whistler(f_c * 0.999, BMAG, NE, HOT))
    above = float(gamma_whistler(f_c * 1.001, BMAG, NE, HOT))
    assert below > 0.0 > above
    # and the zero is sharp: both within ~1e-2 of zero relative to the
    # mid-band growth rate
    mid = float(gamma_whistler(0.25 * FCE, BMAG, NE, HOT))
    assert abs(below) < 0.05 * mid and abs(above) < 0.05 * mid


def test_isotropic_population_damps():
    """A = 0: pure cyclotron damping at every propagating frequency."""
    hot0 = HotElectrons(eta=1.0e-3, t_par_ev=10.0e3, anisotropy=0.0)
    for frac in (0.1, 0.3, 0.5, 0.7):
        assert float(gamma_whistler(frac * FCE, BMAG, NE, hot0)) < 0.0


def test_scalings_and_weak_growth():
    """gamma is linear in the hot fraction eta, and |gamma|/w << 1 in the
    magnetospheric parameter range (the weak-growth validity condition)."""
    g1 = float(gamma_whistler(0.3 * FCE, BMAG, NE, HOT))
    g2 = float(gamma_whistler(
        0.3 * FCE, BMAG, NE,
        HotElectrons(eta=2.0e-3, t_par_ev=10.0e3, anisotropy=1.0),
    ))
    assert g2 / g1 == pytest.approx(2.0, rel=1e-12)
    for frac in (0.05, 0.2, 0.45):
        g = float(gamma_whistler(frac * FCE, BMAG, NE, HOT))
        assert abs(g) / (2 * np.pi * frac * FCE) < 0.05


def test_obliquity_reduces_growth_and_cone_cuts_off():
    """Quasi-longitudinal: growth decreases monotonically with psi and
    vanishes past the QL resonance cone (Y cos psi < 1)."""
    f = 0.3 * FCE
    gams = [
        float(gamma_whistler(f, BMAG, NE, HOT, psi=p))
        for p in (0.0, 0.4, 0.8, 1.2)
    ]
    assert all(a > b for a, b in zip(gams, gams[1:]))
    assert gams[0] > 0.0
    # cos psi < f/fce = 0.3 -> evanescent QL index -> 0
    assert float(gamma_whistler(f, BMAG, NE, HOT, psi=np.arccos(0.29))) == 0.0


def test_dr_dw_matches_stix_rlp_derivative():
    """The closed-form dR/dw against a numerical derivative of the
    framework's stix_rlp, including multi-ion terms."""
    for eta_he, eta_o in ((0.0, 0.0), (0.1, 0.05)):
        w = 2 * np.pi * 0.3 * FCE
        dw = w * 1e-7
        rp = float(dispersion.stix_rlp(
            NE, BMAG, (w + dw) / (2 * np.pi), eta_he, eta_o)[0])
        rm = float(dispersion.stix_rlp(
            NE, BMAG, (w - dw) / (2 * np.pi), eta_he, eta_o)[0])
        num = (rp - rm) / (2 * dw)
        ana = float(_dr_dw(w, NE, BMAG, eta_he, eta_o))
        assert ana == pytest.approx(num, rel=1e-6)


def test_regression_value():
    """Pin one full evaluation (medium like the L=2.56 plasmasphere
    equator) so silent formula drift cannot pass: gamma = 93.05 rad/s at
    f = 4 kHz, fce = 52.0 kHz, 1859 cm^-3, eta 1e-3, 25 keV, A = 1
    (independently confirmed by the full-kinetic dispersion root solve
    in test_full_kinetic_crosscheck: 92.90 rad/s, the 0.15% difference
    being exactly the weak-growth approximation error)."""
    g = float(gamma_whistler(
        4000.0, 3.12e-5 / 2.56**3, 1.8593826731720128e9,
        HotElectrons(eta=1.0e-3, t_par_ev=25.0e3, anisotropy=1.0),
    ))
    assert g == pytest.approx(93.045, rel=2e-3)


def test_full_kinetic_crosscheck():
    """The strongest validation of gamma_whistler: Newton-solve the FULL
    complex kinetic dispersion relation (cold Stix R + hot bi-Maxwellian
    susceptibility with the exact plasma dispersion function
    Z(zeta) = i sqrt(pi) w(zeta), scipy wofz) for the complex root
    omega(k), and compare its imaginary part to the weak-growth formula.
    No shared code path: the weak-growth route never touches Z's real
    part or a root solve. Agreement must be at the weak-growth error
    level (|gamma|/w ~ 3e-3 here -> ~0.2%), far below any sign or
    factor mistake."""
    wofz = pytest.importorskip("scipy.special").wofz

    from raytrace_tpu.constants import C_LIGHT, FPE2_E, M_E, Q_E

    bmag = 3.12e-5 / 2.56**3
    ne = 1.8593826731720128e9
    f = 4000.0
    hot = HotElectrons(eta=1.0e-3, t_par_ev=25.0e3, anisotropy=1.0)
    g_weak = float(gamma_whistler(f, bmag, ne, hot))

    w0 = 2 * np.pi * f
    wc = 2 * np.pi * FCE_E * bmag
    wpe2 = (2 * np.pi) ** 2 * FPE2_E * (ne * 1e-6)
    apar = np.sqrt(2.0 * Q_E * hot.t_par_ev / M_E)
    tr = hot.anisotropy + 1.0
    # k from the framework's cold dispersion at the real frequency
    mu2 = float(dispersion.stix_rlp(ne, bmag, f)[0])
    k = w0 / C_LIGHT * np.sqrt(mu2)

    def z_func(zeta):
        return 1j * np.sqrt(np.pi) * wofz(zeta)

    def d_full(w):
        # cold R at complex w (electron + proton terms, protons-only env)
        r = 1.0 + 0j
        for fpe2_s, fce_signed in [(FPE2_E, -FCE_E)] + list(
            dispersion.ion_species()
        ):
            wps2 = (2 * np.pi) ** 2 * fpe2_s * (ne * 1e-6)
            sig = 2 * np.pi * fce_signed * bmag
            r = r - wps2 / (w * (w + sig))
        zeta = (w - wc) / (k * apar)
        chi = (hot.eta * wpe2 / w**2) * (
            (tr - 1.0)
            + (zeta * (tr - 1.0) + w / (k * apar)) * z_func(zeta)
        )
        return r + chi - (C_LIGHT * k / w) ** 2

    # Newton iteration from the real cold root
    w = w0 + 0j
    for _ in range(50):
        dw = w * 1e-9
        deriv = (d_full(w + dw) - d_full(w - dw)) / (2 * dw)
        step = d_full(w) / deriv
        w = w - step
        if abs(step) < 1e-10 * abs(w):
            break
    g_full = float(np.imag(w))
    # same mode: the root's real part shifts only by the hot fraction's
    # real back-reaction (~0.2% here -- the term weak growth neglects)
    assert abs(np.real(w) - w0) / w0 < 5e-3
    assert g_full == pytest.approx(92.90, rel=1e-2)
    assert g_weak == pytest.approx(g_full, rel=5e-3)


def test_emic_threshold_and_damping():
    """gamma_emic (the '-' root counterpart): growth below the PROTON KP
    threshold f_c = fci * A/(1+A), damping above; isotropic protons damp
    at every propagating frequency; linear in the hot fraction."""
    from raytrace_tpu.constants import FCE_P
    from raytrace_tpu.growth import HotProtons, gamma_emic

    fci = FCE_P * BMAG
    hot = HotProtons(eta=1.0e-3, t_par_ev=30.0e3, anisotropy=1.0)
    f_c = 0.5 * fci
    assert float(gamma_emic(f_c * 0.999, BMAG, NE, hot)) > 0.0
    assert float(gamma_emic(f_c * 1.001, BMAG, NE, hot)) < 0.0
    hot0 = HotProtons(eta=1.0e-3, t_par_ev=30.0e3, anisotropy=0.0)
    for frac in (0.1, 0.4, 0.8):
        assert float(gamma_emic(frac * fci, BMAG, NE, hot0)) < 0.0
    g1 = float(gamma_emic(0.3 * fci, BMAG, NE, hot))
    g2 = float(gamma_emic(
        0.3 * fci, BMAG, NE,
        HotProtons(eta=2.0e-3, t_par_ev=30.0e3, anisotropy=1.0),
    ))
    assert g2 / g1 == pytest.approx(2.0, rel=1e-12)


def test_emic_full_kinetic_crosscheck():
    """gamma_emic vs a Newton solve of the full complex L-mode kinetic
    dispersion (cold Stix L + hot proton bi-Maxwellian susceptibility
    with exact Z via scipy wofz) -- same independent-route strategy as
    the whistler cross-check."""
    wofz = pytest.importorskip("scipy.special").wofz

    from raytrace_tpu.constants import (
        C_LIGHT, FCE_P, FPE2_E, FPE2_P, M_P, Q_E,
    )
    from raytrace_tpu.growth import HotProtons, gamma_emic

    fci = FCE_P * BMAG
    f = 0.3 * fci
    hot = HotProtons(eta=1.0e-3, t_par_ev=30.0e3, anisotropy=1.0)
    g_weak = float(gamma_emic(f, BMAG, NE, hot))

    w0 = 2 * np.pi * f
    wci = 2 * np.pi * fci
    wpp2 = (2 * np.pi) ** 2 * FPE2_P * (NE * 1e-6)
    apar = np.sqrt(2.0 * Q_E * hot.t_par_ev / M_P)
    tr = hot.anisotropy + 1.0
    mu2 = float(dispersion.stix_rlp(NE, BMAG, f)[1])     # cold L
    k = w0 / C_LIGHT * np.sqrt(mu2)

    def d_full(w):
        # cold L at complex w: term signs mirrored from R
        l_ = 1.0 + 0j
        for fpe2_s, fce_signed in [(FPE2_E, -FCE_E)] + list(
            dispersion.ion_species()
        ):
            wps2 = (2 * np.pi) ** 2 * fpe2_s * (NE * 1e-6)
            sig = -2 * np.pi * fce_signed * BMAG
            l_ = l_ - wps2 / (w * (w + sig))
        zeta = (w - wci) / (k * apar)
        z_val = 1j * np.sqrt(np.pi) * wofz(zeta)
        chi = (hot.eta * wpp2 / w**2) * (
            (tr - 1.0)
            + (zeta * (tr - 1.0) + w / (k * apar)) * z_val
        )
        return l_ + chi - (C_LIGHT * k / w) ** 2

    w = w0 + 0j
    for _ in range(60):
        dw = w * 1e-9
        deriv = (d_full(w + dw) - d_full(w - dw)) / (2 * dw)
        step = d_full(w) / deriv
        w = w - step
        if abs(step) < 1e-11 * abs(w):
            break
    g_full = float(np.imag(w))
    assert abs(np.real(w) - w0) / w0 < 5e-3
    assert g_weak == pytest.approx(g_full, rel=2e-2)


def test_equatorial_gain_profile_shape():
    """The KP amplification spectrum at L = 4: positive band below the
    cutoff fce A/(1+A), damped above, single interior growth peak."""
    env = make_env_lat()
    f = np.linspace(500.0, 12000.0, 47)
    prof = equatorial_gain_profile(4.0, f, env, HOT)
    fce = prof["fce"][0]
    cut = prof["f_cutoff"][0]
    gam = prof["gamma"]
    assert cut == pytest.approx(0.5 * fce, rel=1e-12)
    assert np.all(gam[f < 0.95 * cut] > 0.0)
    assert np.all(gam[f > 1.05 * cut] < 0.0)
    ipk = int(np.argmax(gam))
    assert 0 < ipk < len(f) - 1  # interior peak


def test_equatorial_confinement_along_field_line():
    """gamma(lat) along the L = 4 field line at fixed f: the resonant
    overlap (and thus growth) is confined near the magnetic equator --
    off-equator |B| grows, the resonant velocity runs away and gamma
    falls by orders of magnitude within ~20 degrees."""
    from raytrace_tpu.models import medium

    env = make_env_lat()
    lat = np.radians(np.linspace(0.0, 30.0, 7))
    r = 4.0 * np.cos(lat) ** 2
    bm = np.asarray(medium.b_mag(r, lat, env), np.float64)
    ne = np.asarray(medium.ne_total_m3(r, lat, env), np.float64)
    f = 0.15 * FCE_E * bm[0]
    gam = gamma_whistler(np.full_like(bm, f), bm, ne, HOT)
    assert gam[0] > 0.0
    assert gam[0] > 100.0 * abs(gam[-1])


def test_path_gain_on_traced_ray():
    """path_gain mechanics on a real traced ray (unducted, launch 58 deg,
    f = 4 kHz): anisotropic hot population -> net positive cumulative
    gain; isotropic -> strictly negative (damping); padding snapshots
    after the surface hit contribute nothing. The magnitudes are tiny --
    CORRECT physics: this unducted ray crosses the equator at r ~ 1.2
    where 4 kHz resonates only with ~MeV electrons (no overlap with a
    25 keV population); magnetospheric amplification needs ducted paths
    that stay near the high-L equator."""
    env = make_env_lat()
    u0 = jnp.array([[(RE + 1e6) / RE, np.radians(58.0), 0.0, 0.0]])
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, jnp.array([4000.0]),
        cfg=SolverConfig(rtol=1e-5, atol=1e-9, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=3e9 / RE), max_steps=8192,
        save_every=16,
    )
    assert int(res.status[0]) == events.HIT_EARTH
    traj = np.asarray(res.traj["u"])
    hot = HotElectrons(eta=1.0e-3, t_par_ev=25.0e3, anisotropy=1.0)
    g = path_gain(traj, 4000.0, env, hot)
    g0 = path_gain(
        traj, 4000.0, env,
        HotElectrons(eta=1.0e-3, t_par_ev=25.0e3, anisotropy=0.0),
    )
    assert g["gain_db"][-1, 0] > 0.0 > g0["gain_db"][-1, 0]
    assert np.all(np.isfinite(g["gamma"]))
    # group time masked correctly: cumulative gain constant over padding
    t = g["t"][:, 0]
    pad = np.flatnonzero(np.diff(t) <= 0.0)
    if pad.size:
        assert g["gain_db"][pad[-1] + 1, 0] == g["gain_db"][-1, 0]
    # single-ray (S, n) input round-trips
    g1 = path_gain(traj[:, 0], 4000.0, env, hot)
    assert g1["gamma"].shape == (traj.shape[0],)
    np.testing.assert_allclose(g1["gain_db"], g["gain_db"][:, 0])


def test_path_gain_3d_on_shell():
    """path_gain on the 3D frame (field-model-general channel: b_vec
    magnitude, mlat_3d density, B.rho psi, T at index 6). Launched
    ON-SHELL (consistent_rho_3d) so the group delay is physical and
    monotone -- the reference's own off-shell u0 accumulates NEGATIVE T
    (docs/NOTE_3D_GROUP_DELAY.md) which would zero the gain integral's
    advancing-T mask."""
    from raytrace_tpu.models import make_env

    env = make_env()
    r0, th0, ph0 = (RE + 1.0e6) / RE, np.pi / 4, 0.0
    rho = np.asarray(dispersion.consistent_rho_3d(
        r0, th0, ph0, (1.0, 1.0, 0.0), 1000.0, env
    ))
    u0 = jnp.array([[r0, th0, ph0, *rho, 0.0]])
    res = trace(
        lambda u, ff: rhs.rhs_3d(u, ff, env), u0, jnp.array([1000.0]),
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE, lat_sign=-1.0,
                      lat_offset=np.pi / 2),
        group_idx=6, max_steps=4096, save_every=16,
    )
    traj = np.asarray(res.traj["u"])
    t = traj[:, 0, 6]
    dt = np.diff(t)
    assert np.all(dt[dt != 0.0] > 0.0)      # on-shell: physical T
    hot = HotElectrons(eta=1.0e-3, t_par_ev=25.0e3, anisotropy=1.0)
    g = path_gain(traj, 1000.0, env, hot, frame="3d")
    g0 = path_gain(
        traj, 1000.0, env,
        HotElectrons(eta=1.0e-3, t_par_ev=25.0e3, anisotropy=0.0),
        frame="3d",
    )
    assert np.isfinite(g["gamma"]).all()
    assert g["gain_db"][-1, 0] > 0.0 > g0["gain_db"][-1, 0]


def test_group_velocity_closed_form():
    """group_velocity_parallel's closed form (via _dstix_dw) against the
    finite-difference v_g = c/(mu + f dmu/df) of the framework's own
    stix_rlp -- the same quantity the traced group-delay equation
    dT/dtau = (1/c)(1 + (f/mu) dmu/df) integrates (ops/rhs.py)."""
    from raytrace_tpu.constants import C_LIGHT
    from raytrace_tpu.growth import group_velocity_parallel

    for mode, idx in (("whistler", 0), ("emic", 1)):
        frac = 0.2
        base = FCE if mode == "whistler" else FCE / 1836.15267
        f0 = frac * base
        df = f0 * 1e-6
        mu = np.sqrt(float(dispersion.stix_rlp(NE, BMAG, f0)[idx]))
        mup = np.sqrt(float(dispersion.stix_rlp(NE, BMAG, f0 + df)[idx]))
        mum = np.sqrt(float(dispersion.stix_rlp(NE, BMAG, f0 - df)[idx]))
        vg_fd = C_LIGHT / (mu + f0 * (mup - mum) / (2 * df))
        vg = float(group_velocity_parallel(f0, BMAG, NE, mode))
        assert vg == pytest.approx(vg_fd, rel=1e-6)
        assert 0.0 < vg < C_LIGHT


def test_transit_gain_structure():
    """Single-transit KP gain along the L = 4 field line: positive in
    the growth band, linear in the hot fraction (nepers), and the EMIC
    mode produces modest positive gain below the proton threshold."""
    from raytrace_tpu.constants import FCE_P
    from raytrace_tpu.growth import HotProtons, transit_gain_db
    from raytrace_tpu.models import make_env_lat, medium

    env = make_env_lat()
    bm_eq = float(np.asarray(medium.b_mag(np.array([4.0]),
                                          np.zeros(1), env))[0])
    fce = FCE_E * bm_eq
    g1 = transit_gain_db(4.0, 0.2 * fce, env, HOT)
    g2 = transit_gain_db(
        4.0, 0.2 * fce, env,
        HotElectrons(eta=2.0e-3, t_par_ev=10.0e3, anisotropy=1.0),
    )
    assert g1 > 0.0
    assert g2 == pytest.approx(2.0 * g1, rel=1e-9)   # linear in eta
    fci = FCE_P * bm_eq
    ge = transit_gain_db(4.0, 0.3 * fci, env,
                         HotProtons(eta=1e-3, t_par_ev=30e3, anisotropy=1.0),
                         mode="emic")
    assert 0.0 < ge < 100.0


# ---------------------------------------------------------------------------
# gamma_oblique: genuinely oblique kinetics (tools/derive_growth_oblique.py)
# ---------------------------------------------------------------------------

def test_cold_mode_oblique_root_polarization_and_denominator():
    """The oblique cold machinery behind gamma_oblique: (a) mu^2 at
    psi=0 equals Stix R exactly; (b) the polarization is a true null
    vector of the dispersion tensor (residual at machine precision);
    (c) the closed-form weak-growth denominator lam_p matches a central
    finite difference of e* . D(w) . e at fixed k."""
    from raytrace_tpu.growth import cold_mode_oblique

    r_, l_, p_ = dispersion.stix_rlp(NE, BMAG, 0.25 * FCE)
    out0 = cold_mode_oblique(0.25 * FCE, BMAG, NE, 0.0)
    assert float(out0["mu2"]) == pytest.approx(float(r_), rel=1e-12)

    for psid in (0.0, 15.0, 35.0, 55.0):
        psi = np.radians(psid)
        f = 0.25 * FCE
        out = cold_mode_oblique(f, BMAG, NE, psi)
        assert bool(out["propagating"])
        n2 = float(out["mu2"])
        e = np.asarray(out["e"])

        def disp_tensor(fv):
            rr, ll, pp = dispersion.stix_rlp(NE, BMAG, fv)
            ss, dd = (rr + ll) / 2, (rr - ll) / 2
            sn, cs = abs(np.sin(psi)), abs(np.cos(psi))
            # fixed k: n^2(f) = (c k / w)^2 scales as (f0/f)^2 n2
            n2f = n2 * (f / fv) ** 2
            return np.array([
                [ss - n2f * cs**2, -1j * dd, n2f * cs * sn],
                [1j * dd, ss - n2f, 0.0],
                [n2f * cs * sn, 0.0, pp - n2f * sn**2],
            ])

        res = np.abs(disp_tensor(f) @ e).max()
        scale = max(abs(float(out["S"])), n2)
        assert res < 1e-9 * scale
        # lam_p vs central FD in w at fixed k and fixed e
        h = f * 1e-6
        lam_fd = (np.conj(e) @ (disp_tensor(f + h) - disp_tensor(f - h))
                  @ e).real / (2 * h * 2 * np.pi)
        assert float(out["lam_p"]) == pytest.approx(lam_fd, rel=1e-5)


def test_oblique_parallel_limit_matches_ql():
    """psi -> 0: gamma_oblique must reduce to gamma_whistler (whose
    kernel was itself pinned to the cold Stix R by derive_growth.py) --
    the runtime counterpart of derivation check (4). Residual is the
    half-range Gauss-Hermite quadrature error (~1e-5)."""
    from raytrace_tpu.growth import gamma_oblique

    for frac in (0.05, 0.15, 0.25, 0.4, 0.6):
        gq = float(gamma_whistler(frac * FCE, BMAG, NE, HOT, psi=0.0))
        go = float(gamma_oblique(frac * FCE, BMAG, NE, HOT, psi=1e-9))
        assert go == pytest.approx(gq, rel=1e-4), frac


def test_oblique_isotropic_damps_and_landau_turns_on():
    """Maxwellian (A = 0): damping at EVERY angle (the dissipation
    theorem the factored U T T-dagger form makes manifest), with the
    m = 0 Landau part exactly zero at psi = 0 and growing with
    obliquity as the wave acquires a parallel electric field."""
    from raytrace_tpu.growth import gamma_oblique

    hot0 = HotElectrons(eta=1.0e-3, t_par_ev=10.0e3, anisotropy=0.0)
    f = 0.22 * FCE
    landau = []
    for psid in (0.0, 10.0, 25.0, 40.0):
        g, parts = gamma_oblique(f, BMAG, NE, hot0, np.radians(psid),
                                 return_parts=True)
        assert float(g) < 0.0 or psid == 0.0 and float(g) < 0.0
        gm = {m: float(v) for m, v in parts["gamma_m"].items()}
        assert gm[-1] < 0.0
        assert gm[0] <= 0.0
        landau.append(gm[0])
    assert landau[0] == 0.0
    assert all(v < 0.0 for v in landau[1:])
    # Landau damping strengthens as obliquity turns on (it can weaken
    # again at large psi once the resonant velocity w/kpar moves off
    # the thermal core -- also physics, not asserted here)
    assert landau[2] < landau[1]


def test_oblique_growth_below_ql_estimate():
    """For an unstable anisotropic population at moderate obliquity the
    full kinetic rate sits BELOW the quasi-longitudinal estimate: the
    Landau term eats growth and the exact |T.e|^2 polarization weight
    replaces the QL assumption. This is the quantitative statement of
    why unducted (obliquely propagating) whistlers amplify less."""
    from raytrace_tpu.growth import gamma_oblique

    f = 0.22 * FCE
    g0 = float(gamma_oblique(f, BMAG, NE, HOT, 1e-9))
    assert g0 > 0.0
    for psid in (15.0, 30.0, 45.0):
        psi = np.radians(psid)
        gq = float(gamma_whistler(f, BMAG, NE, HOT, psi=psi))
        go = float(gamma_oblique(f, BMAG, NE, HOT, psi))
        assert go < gq, psid
    # in this dense (1000/cc) medium the QL estimate still predicts
    # strong growth at 30 deg; the full kinetics has KILLED it (Landau
    # m=0 plus the anomalous m=+1 resonance, which w/kpar makes
    # reachable here)
    g30 = float(gamma_oblique(f, BMAG, NE, HOT, np.radians(30.0)))
    assert g30 < 0.1 * g0


def test_oblique_quadrature_converged():
    """n_quad=96 (default) vs 192: the Gauss-Hermite vperp quadrature is
    converged well past the documented ~1e-4 tolerance."""
    from raytrace_tpu.growth import gamma_oblique

    f = 0.22 * FCE
    for psid in (10.0, 40.0, 65.0):
        a = float(gamma_oblique(f, BMAG, NE, HOT, np.radians(psid)))
        b = float(gamma_oblique(f, BMAG, NE, HOT, np.radians(psid),
                                n_quad=192))
        assert a == pytest.approx(b, rel=1e-6), psid


def test_path_gain_oblique_kinetics_on_traced_ray():
    """path_gain(kinetics='oblique') on a short traced whistler ray:
    finite everywhere, and for an isotropic hot population the gain is
    monotonically non-increasing (pure damping along the whole path)."""
    env = make_env_lat()
    u0 = jnp.array([[(RE + 1e6) / RE, np.radians(58.0), 0.0, 0.0]])
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, jnp.array([4000.0]),
        cfg=SolverConfig(rtol=1e-5, atol=1e-9, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=3e9 / RE), max_steps=8192,
        save_every=16,
    )
    assert int(res.status[0]) == events.HIT_EARTH
    traj = np.asarray(res.traj["u"])
    hot0 = HotElectrons(eta=1.0e-3, t_par_ev=25.0e3, anisotropy=0.0)
    out = path_gain(traj, 4000.0, env, hot0, kinetics="oblique")
    assert np.all(np.isfinite(out["gamma"]))
    assert np.all(np.isfinite(out["gain_db"]))
    gain = out["gain_neper"][:, 0]
    assert np.all(np.diff(gain) <= 1e-12)
    assert gain[-1] < 0.0
    # and the oblique gain differs from the QL one (the ray leaves
    # psi = 0 immediately) while agreeing in sign for the isotropic
    # (pure-damping) population
    out_ql = path_gain(traj, 4000.0, env, hot0, kinetics="ql")
    assert out_ql["gain_neper"][-1, 0] < 0.0
    assert not np.allclose(out["gamma"], out_ql["gamma"])
