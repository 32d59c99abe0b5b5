"""Environment-model unit tests (SURVEY.md section 4a)."""

import numpy as np
import pytest

from raytrace_tpu.constants import RE
from raytrace_tpu.models import (dipole, ionosphere, make_env, medium,
                                 plasmasphere)


def test_dipole_mag_lat_equator_surface():
    # at r = 1 RE, lat = 0 the field is exactly b0
    b0 = 3.12e-5
    assert float(dipole.b_mag_lat(1.0, 0.0, b0)) == pytest.approx(b0)


def test_dipole_mag_pole_factor():
    # polar field is 2x equatorial at the same radius
    b0 = 3.12e-5
    bp = float(dipole.b_mag_lat(1.0, np.pi / 2 - 1e-12, b0))
    assert bp == pytest.approx(2.0 * b0)


def test_dipole_lat_colat_consistency():
    b0 = 3.0696381e-5
    for r, lat in [(1.2, 0.3), (2.5, -0.7), (4.0, 1.1)]:
        assert float(dipole.b_mag_lat(r, lat, b0)) == pytest.approx(
            float(dipole.b_mag_colat(r, np.pi / 2 - lat, b0)), rel=1e-12
        )


def test_dipole_vector_matches_magnitude():
    b0 = 3.12e-5
    for r, theta in [(2.0, np.pi / 4), (3.5, 1.9), (1.5, 0.6)]:
        br, bt, bp = dipole.b_vec_colat(r, theta, 0.0, b0)
        mag = np.sqrt(float(br) ** 2 + float(bt) ** 2 + float(bp) ** 2)
        assert mag == pytest.approx(
            float(dipole.b_mag_colat(r, theta, b0)), rel=1e-12
        )


def test_dip_angle_conventions():
    # RayMain.jl:128 (colat) vs RayTrace_lat.jl:47 (lat) must agree
    for lat in [0.1, 0.5, 1.0, -0.8]:
        assert float(dipole.dip_angle_lat(lat)) == pytest.approx(
            float(dipole.dip_angle_colat(np.pi / 2 - lat)), rel=1e-12
        )


def test_ionosphere_reference_value():
    # 1000 km altitude: n = 1.8e5 exp(-4.183119 (r - 1.0471)) cm^-3
    r = (RE + 1.0e6) / RE
    expect = 1.8e5 * np.exp(-4.183119 * (r - 1.0471))
    got = float(ionosphere.ne_iono_cm3(r, *ionosphere.TRACED_FIT))
    assert got == pytest.approx(expect, rel=1e-12)


def test_lppi_kp3():
    # plasmasphere.jl:43: Lppi = 5.6 - 0.46*3 = 4.22
    assert plasmasphere.lppi_from_kp(3.0) == pytest.approx(4.22)


def test_plasmapause_initialization():
    """Lppo from the branch-2/branch-3 crossing scan (plasmasphere.jl:48-71)."""
    lppi = plasmasphere.lppi_from_kp(3.0)
    lppo, ne_lppi = plasmasphere.initialize_plasmasphere(lppi, 0.0, 90.0, 2.0)
    # crossing must be outside Lppi and inside the scan range
    assert lppi < lppo < 10.0
    # independent verification: branch densities really cross near lppo
    a = plasmasphere.season_coeff(0.0, 90.0)
    ne2 = ne_lppi * 10.0 ** ((lppi - lppo) / 0.1)
    ne3 = (5800.0 + 300.0 * 2.0) * lppo ** (-4.5) + (
        1.0 - np.exp((2.0 - lppo) / 10.0)
    )
    assert ne2 == pytest.approx(ne3, rel=0.05)
    # ne_Lppi matches the branch-1 formula at Lppi
    log_ne = (-0.3145 * lppi + 3.9043) + a * np.exp((2.0 - lppi) / 1.5)
    assert ne_lppi == pytest.approx(10.0**log_ne, rel=1e-12)


def test_plasmasphere_branch_selection():
    env = medium.make_env()
    lppi, lppo = env.lppi, env.lppo
    for L, branch in [(2.0, 1), (4.0, 1), (0.5 * (lppi + lppo), 2), (8.0, 3)]:
        got = float(
            plasmasphere.ne_plasma_cm3(
                L, lppi, lppo, env.ne_lppi, env.ps_season, env.ps_trough
            )
        )
        if branch == 1:
            expect = 10.0 ** (
                (-0.3145 * L + 3.9043) + env.ps_season * np.exp((2.0 - L) / 1.5)
            )
        elif branch == 2:
            expect = env.ne_lppi * 10.0 ** ((lppi - L) / 0.1)
        else:
            expect = env.ps_trough * L ** (-4.5) + (1.0 - np.exp((2.0 - L) / 10.0))
        assert got == pytest.approx(expect, rel=1e-12)


def test_plasmasphere_continuity_at_lppi():
    # branches 1 and 2 agree at L = Lppi by construction
    env = medium.make_env()
    eps = 1e-9
    lo = float(
        plasmasphere.ne_plasma_cm3(
            env.lppi - eps, env.lppi, env.lppo, env.ne_lppi,
            env.ps_season, env.ps_trough,
        )
    )
    hi = float(
        plasmasphere.ne_plasma_cm3(
            env.lppi + eps, env.lppi, env.lppo, env.ne_lppi,
            env.ps_season, env.ps_trough,
        )
    )
    assert lo == pytest.approx(hi, rel=1e-6)


def test_diffusive_equilibrium_factor():
    # at the model base r = rb the factor is exactly 1
    rb = plasmasphere.DE_RBASE_M / RE
    assert float(plasmasphere.diffusive_equilibrium_factor(rb)) == pytest.approx(1.0)
    # decreases with altitude above the base
    assert float(plasmasphere.diffusive_equilibrium_factor(3.0)) < 1.0


def test_total_density_composition():
    env = medium.make_env()
    r, lat = 2.5, 0.3
    L = float(dipole.l_shell(r, lat))
    ne_i = 1.8e5 * np.exp(-4.183119 * (r - 1.0471))
    ne_p = float(
        plasmasphere.ne_plasma_cm3(
            L, env.lppi, env.lppo, env.ne_lppi, env.ps_season, env.ps_trough
        )
    )
    assert float(medium.ne_total_m3(r, lat, env)) == pytest.approx(
        (ne_i + ne_p) * 1e6, rel=1e-10
    )


def test_raymain_env_has_no_plasmasphere():
    env = medium.make_env_raymain()
    r, lat = 2.5, 0.3
    ne_i = 1.8e5 * np.exp(-4.183119 * (r - 1.0471))
    assert float(medium.ne_total_m3(r, lat, env)) == pytest.approx(
        ne_i * 1e6, rel=1e-12
    )
    assert env.b0 == pytest.approx(3.0696381e-5)


def test_iono_mlt_interpolation():
    """Day/night ionosphere blend (the reference's planned MLT step,
    plasmasphere.jl:110-113): mixture equals the hand formula, endpoints
    recover the pure fits, and the default medium is unchanged."""
    import numpy as np

    from raytrace_tpu.models import ionosphere, make_env

    r = 1.2
    # endpoint checks on the weight
    assert float(ionosphere.day_weight(12.0)) == pytest.approx(1.0)
    assert float(ionosphere.day_weight(0.0)) == pytest.approx(0.0)
    w6 = float(ionosphere.day_weight(6.0))
    assert w6 == pytest.approx(0.5)

    env = make_env(iono_mlt=True, mlt=6.0)
    ne = float(medium.ne_total_m3(r, 0.0, env._replace(ps_weight=0.0)))
    day = float(ionosphere.ne_iono_cm3(r, *ionosphere.IRI_DAYSIDE_FIT))
    night = float(ionosphere.ne_iono_cm3(r, *ionosphere.IRI_NIGHTSIDE_FIT))
    assert ne == pytest.approx(1e6 * (w6 * day + (1 - w6) * night), rel=1e-12)

    # default media untouched (iono_mix == 1.0 static path)
    env0 = make_env()
    assert env0.iono_mix == 1.0
    ne0 = float(medium.ne_total_m3(r, 0.0, env0._replace(ps_weight=0.0)))
    traced = float(ionosphere.ne_iono_cm3(r, *ionosphere.TRACED_FIT))
    assert ne0 == pytest.approx(1e6 * traced, rel=1e-12)


def test_gcpm_simplified_model():
    """Simplified-GCPM plasmasphere (the model the reference planned,
    RayMain.jl:99-101): CA1992-calibrated equatorial profile, field-aligned
    mirror-ratio enhancement, smooth plasmapause knee into the trough."""
    from raytrace_tpu.models import plasmasphere as ps

    env = make_env(ps_model="gcpm")
    assert env.ps_model == "gcpm"

    # equatorial calibration: bpow irrelevant at lat=0 (mirror ratio = 1);
    # deep inside the plasmasphere it matches CA1992 branch (i) without
    # the seasonal term
    L = 2.5
    ne = float(ps.ne_gcpm_cm3(L, 0.0, env.lppo, env.ps_trough,
                              env.gcpm_ne0, env.gcpm_lscale, 1.0,
                              env.gcpm_knee))
    ca_no_season = 10.0 ** (-0.3145 * L + 3.9043)
    assert ne == pytest.approx(ca_no_season, rel=2e-2)

    # beyond the knee it approaches the CA1992 trough
    L = env.lppo + 1.5
    ne_tr = float(ps.ne_gcpm_cm3(L, 0.0, env.lppo, env.ps_trough,
                                 env.gcpm_ne0, env.gcpm_lscale, 1.0,
                                 env.gcpm_knee))
    trough = env.ps_trough * L ** -4.5 + (1.0 - np.exp((2.0 - L) / 10.0))
    assert ne_tr == pytest.approx(trough, rel=0.05)

    # field-aligned enhancement: at fixed L, density grows away from the
    # equator by the mirror ratio to the (bpow * knee-weight) power --
    # the log-space knee blend scales every plasmasphere-side term by the
    # sigmoid weight w(L), which is ~1 deep inside the plasmasphere
    lat = 0.6
    L = 2.5
    ne_eq = float(ps.ne_gcpm_cm3(L, 0.0, env.lppo, env.ps_trough,
                                 env.gcpm_ne0, env.gcpm_lscale, 1.0,
                                 env.gcpm_knee))
    ne_off = float(ps.ne_gcpm_cm3(L, lat, env.lppo, env.ps_trough,
                                  env.gcpm_ne0, env.gcpm_lscale, 1.0,
                                  env.gcpm_knee))
    mirror = np.sqrt(1.0 + 3.0 * np.sin(lat) ** 2) / np.cos(lat) ** 6
    w = 1.0 / (1.0 + np.exp(-(env.lppo - L) / env.gcpm_knee))
    assert ne_off / ne_eq == pytest.approx(mirror**w, rel=1e-6)

    # the total medium composes it (and the ca1992 default is untouched)
    ne_tot = float(medium.ne_total_m3(2.2, 0.3, env))
    assert np.isfinite(ne_tot) and ne_tot > 0.0
    env_ca = make_env()
    assert env_ca.ps_model == "ca1992"


def test_gcpm_is_smooth_at_the_knee():
    """No branch seams: the GCPM profile's dlog(ne)/dL is continuous
    through Lppi and Lppo (unlike hard CA1992), by construction."""
    from raytrace_tpu.models import plasmasphere as ps

    env = make_env(ps_model="gcpm")
    L = np.linspace(2.0, env.lppo + 1.0, 4001)
    ne = np.asarray(ps.ne_gcpm_cm3(L, 0.0, env.lppo, env.ps_trough,
                                   env.gcpm_ne0, env.gcpm_lscale, 1.0,
                                   env.gcpm_knee))
    dlog = np.diff(np.log(ne))
    # second difference stays small everywhere (C-infinity profile)
    assert np.max(np.abs(np.diff(dlog))) < 5e-4


def test_tilted_dipole_reduces_to_centered():
    """tilt = 0 reproduces b_vec_colat exactly, everywhere."""
    rng = np.random.default_rng(3)
    for _ in range(30):
        r = float(rng.uniform(1.0, 6.0))
        th = float(rng.uniform(0.1, np.pi - 0.1))
        ph = float(rng.uniform(-np.pi, np.pi))
        b0 = 3.12e-5
        a = [float(x) for x in dipole.b_vec_colat(r, th, ph, b0)]
        b = [float(x) for x in dipole.b_vec_tilted(r, th, ph, b0, 0.0)]
        np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-30)


def test_tilted_dipole_rotation_consistency():
    """|B| of the tilted dipole at a point equals the centered |B| at the
    same magnetic latitude (frame rotation preserves magnitude), and the
    magnetic-latitude helper agrees with the geometry."""
    tilt, phi0 = 0.3, 0.7
    rng = np.random.default_rng(5)
    for _ in range(30):
        r = float(rng.uniform(1.0, 6.0))
        th = float(rng.uniform(0.1, np.pi - 0.1))
        ph = float(rng.uniform(-np.pi, np.pi))
        b0 = 3.12e-5
        br, bt, bp = dipole.b_vec_tilted(r, th, ph, b0, tilt, phi0)
        bmag = float(np.sqrt(br**2 + bt**2 + bp**2))
        slat = float(dipole.mlat_sin_tilted(th, ph, tilt, phi0))
        lat_m = np.arcsin(np.clip(slat, -1, 1))
        assert bmag == pytest.approx(
            float(dipole.b_mag_lat(r, lat_m, b0)), rel=1e-10)


def test_tilted_medium_guards_and_dispatch():
    env = make_env(b_model="tilted", b_tilt=0.2)
    assert env.b_model == "tilted"
    # 2D entry refuses the tilted field
    with pytest.raises(ValueError):
        medium.b_mag(2.0, 0.3, env)
    # 3D dispatch works and matches the direct call
    a = [float(x) for x in medium.b_vec(2.0, 1.0, 0.5, env)]
    b = [float(x) for x in dipole.b_vec_tilted(2.0, 1.0, 0.5, env.b0,
                                               env.b_tilt, env.b_tilt_phi)]
    np.testing.assert_allclose(a, b, rtol=1e-14)
    with pytest.raises(ValueError):
        make_env(b_model="t96")  # unimplemented field models are refused
