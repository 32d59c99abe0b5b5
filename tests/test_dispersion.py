"""Dispersion-solver tests: closed forms, oracle cross-check, float32
conditioning (SURVEY.md section 4, build plan step 2)."""

import jax.numpy as jnp
import numpy as np
import pytest

import reference_oracle as oracle
from raytrace_tpu.constants import RE
from raytrace_tpu.models import medium
from raytrace_tpu.ops import dispersion

R0 = (RE + 1.0e6) / RE  # canonical launch radius, 1000 km altitude
LAT0 = np.pi / 4.0


def test_stix_rlp_matches_oracle():
    """Ratio-form R,L,P == raw angular-frequency form (different algebra)."""
    ne, b, f = 1.3e9, 2.1e-5, 4000.0
    got = [float(x) for x in dispersion.stix_rlp(ne, b, f)]
    expect = oracle.stix_rlp(ne, b, f)
    for g, e in zip(got, expect):
        assert g == pytest.approx(e, rel=1e-10)


def test_mu_psi_half_pi_closed_form():
    """At psi = pi/2: mu2+ = (B+F)/2A = (RL + PS + |RL-PS|)/(2S).

    The reference works this identity out by hand in scratch.jl:145-220."""
    ne, b, f = 2.0e9, 1.5e-5, 3000.0
    r, l, p = oracle.stix_rlp(ne, b, f)
    s = (r + l) / 2.0
    expect_mu2 = (r * l + p * s + abs(r * l - p * s)) / (2.0 * s)
    got = float(dispersion.mu2_signed(*dispersion.stix_rlp(ne, b, f), jnp.pi / 2))
    assert got == pytest.approx(expect_mu2, rel=1e-10)


def test_mu_psi_zero_roots_are_rlp_pair():
    """At psi = 0 the two roots are {R, L} (Stix parallel propagation)."""
    ne, b, f = 2.0e9, 1.5e-5, 3000.0
    r, l, p = oracle.stix_rlp(ne, b, f)
    rlp = dispersion.stix_rlp(ne, b, f)
    plus = float(dispersion.mu2_signed(*rlp, 0.0, root=1.0))
    minus = float(dispersion.mu2_signed(*rlp, 0.0, root=-1.0))
    assert sorted([plus, minus]) == pytest.approx(sorted([r, l]), rel=1e-9)


def test_mu_2d_lat_matches_oracle_grid():
    """mu over a (r, lat, chi, f) grid vs the independent float64 oracle."""
    env = medium.make_env_raymain()
    rs = np.linspace(R0, 4.0, 7)
    lats = np.linspace(-1.2, 1.2, 7)
    chis = np.linspace(-2.0, 2.0, 5)
    fs = [1000.0, 5000.0, 20000.0]
    for r in rs:
        for lat in lats:
            for chi in chis[::2]:
                for f in fs:
                    got = float(dispersion.mu_2d_lat(r, lat, chi, f, env))
                    expect, _ = oracle.mu_lat_raymain_env(r, lat, chi, f)
                    # rel 1e-6 not 1e-9: where B < 0 the production path
                    # uses the stable product root 2C/(B-F); the oracle's
                    # direct (B+F)/2A cancels there and is the less
                    # accurate of the two.
                    assert got == pytest.approx(expect, rel=1e-6), (r, lat, chi, f)


def test_mu_colat_lat_frames_agree():
    env = medium.make_env_lat()
    for lat in [0.2, 0.7, -0.5]:
        a = float(dispersion.mu_2d_lat(2.0, lat, 0.3, 2000.0, env))
        b = float(dispersion.mu_2d_colat(2.0, np.pi / 2 - lat, 0.3, 2000.0, env))
        assert a == pytest.approx(b, rel=1e-12)


def test_mu_3d_reduces_to_2d():
    """A meridional-plane rho aligned with the 2D psi convention gives the
    same mu: cross-validates the acos(B.rho) geometry (RayTrace_3D.jl:136-141)
    against psi = pi/2 + dip + chi (RayMain.jl:131)."""
    env = medium.make_env(b0=3.12e-5)
    r, lat, chi, f = 2.0, 0.6, 0.4, 1500.0
    theta = np.pi / 2 - lat
    mu2d = float(dispersion.mu_2d_colat(r, theta, chi, f, env))
    # wave-normal unit vector: chi measured from local vertical (outward
    # radial), rotating in the meridional plane toward +theta
    rho_r, rho_t = np.cos(chi), np.sin(chi)
    mu3d = float(dispersion.mu_3d(r, theta, 0.0, rho_r, rho_t, 0.0, f, env))
    assert mu3d == pytest.approx(mu2d, rel=1e-9)


def test_mu_3d_scale_invariance_in_rho():
    """mu depends on rho only through its direction."""
    env = medium.make_env(b0=3.12e-5)
    args = (2.0, np.pi / 3, 0.1, 1.0, 1.0, 0.0, 1000.0, env)
    a = float(dispersion.mu_3d(*args))
    b = float(
        dispersion.mu_3d(2.0, np.pi / 3, 0.1, 7.3, 7.3, 0.0, 1000.0, env)
    )
    assert a == pytest.approx(b, rel=1e-12)


def test_float32_conditioning():
    """The normalized float32 path stays within ~1e-5 relative of float64.

    This is the property that makes the TPU compute path viable; the naive
    unnormalized formula loses many more digits (F^2 ~ 1e20)."""
    env64 = medium.make_env_raymain()
    env32 = medium.cast_env(env64, jnp.float32)
    rng = np.random.default_rng(0)
    for _ in range(200):
        r = float(rng.uniform(R0, 5.0))
        lat = float(rng.uniform(-1.2, 1.2))
        chi = float(rng.uniform(-2.0, 2.0))
        f = float(rng.uniform(500.0, 20000.0))
        m64 = float(dispersion.mu_2d_lat(r, lat, chi, f, env64))
        m32 = float(
            dispersion.mu_2d_lat(
                jnp.float32(r), jnp.float32(lat), jnp.float32(chi),
                jnp.float32(f), env32,
            )
        )
        assert m32 == pytest.approx(m64, rel=2e-4), (r, lat, chi, f)


def test_canonical_ic_value():
    """Pin the exact mu at the RayMain canonical IC (regression anchor).

    mu = sqrt(|mu2+|) with mu2+ < 0 there -- the reference traces the
    abs()-guarded '+' root (RayMain.jl:212-244)."""
    env = medium.make_env_raymain()
    got = float(dispersion.mu_2d_lat(R0, LAT0, 0.0, 5000.0, env))
    expect, _ = oracle.mu_lat_raymain_env(R0, LAT0, 0.0, 5000.0)
    assert got == pytest.approx(expect, rel=1e-10)
    assert got == pytest.approx(50.672, rel=1e-3)


def test_quartic_residual_vanishes():
    """Property: the selected root satisfies A mu^4 - B mu^2 + C = 0.

    The reference solves the Booker quartic A mu^4 - B mu^2 + C = 0
    (RayMain.jl:186-202); our product-root branch (dispersion.py:115-119)
    must return a mu^2 that plugs back into the quartic with a residual
    at rounding level of the normalized coefficients, on BOTH branches
    (whistler root=+1, EMIC root=-1) and in both propagating and
    evanescent (mu^2 < 0) regimes."""
    env = medium.make_env_lat()
    rng = np.random.default_rng(7)
    for _ in range(300):
        r = float(rng.uniform(R0, 6.0))
        lat = float(rng.uniform(-1.2, 1.2))
        chi = float(rng.uniform(-3.0, 3.0))
        f = float(rng.uniform(100.0, 30000.0))
        root = 1.0 if rng.uniform() < 0.7 else -1.0
        ne = float(medium.ne_total_m3(r, lat, env))
        b = float(medium.b_mag(r, lat, env))
        rr, ll, pp = (float(x) for x in dispersion.stix_rlp(ne, b, f))
        psi = float(dispersion.psi_lat(lat, chi))
        mu2 = float(dispersion.mu2_signed(rr, ll, pp, psi, root))
        # normalized coefficients, same scaling as mu2_signed_trig
        s = max(abs(rr), abs(ll), abs(pp))
        rn, ln, pn = rr / s, ll / s, pp / s
        sn, dn = 0.5 * (rn + ln), 0.5 * (rn - ln)
        sin2, cos2 = np.sin(psi) ** 2, np.cos(psi) ** 2
        a = sn * sin2 + pn * cos2
        bq = rn * ln * sin2 + pn * sn * (1.0 + cos2)
        c = pn * rn * ln
        m = mu2 / s
        residual = a * m * m - bq * m + c
        scale = max(abs(a * m * m), abs(bq * m), abs(c), 1e-300)
        assert abs(residual) / scale < 5e-13, (r, lat, chi, f, root)
