"""Quasi-linear diffusion coefficients (diffusion.py).

The quasi-linear chain (R-mode field pair, pitch-angle equation of motion,
kick-direction relation, golden-rule Jacobian) is derived symbolically with
hard assertions in tools/derive_diffusion.py. These tests verify the
NUMERICAL implementation: resonance-root correctness (cross-checked against
analysis.cyclotron_resonance_energy_ev, an independent closed form), the
per-root D_ap/D_pp relations, spectrum normalization, bounce-average
kinematics against the classic dipole bounce-period approximation, and --
the decisive end-to-end check, marked slow -- a test-particle Monte Carlo:
electrons pushed by a relativistic Boris integrator through an explicit
random-phase wave field, <Delta alpha^2>/(2t) compared against D_aa. The
two paths share the field conventions but no quasi-linear algebra."""

import math

import numpy as np
import pytest

from raytrace_tpu import diffusion
from raytrace_tpu.analysis import cyclotron_resonance_energy_ev
from raytrace_tpu.constants import C_LIGHT, FCE_E, M_E, Q_E, RE
from raytrace_tpu.diffusion import WaveSpectrum
from raytrace_tpu.models import medium

# uniform test medium: fce = 28 kHz, fpe/fce ~ 3.2 (inner-magnetosphere-like)
B0 = 1.0e-6
NE = 1.0e8
FCE = FCE_E * B0
SPEC = WaveSpectrum(bw_t=100.0e-12, f_m=0.35 * FCE, df=0.15 * FCE,
                    f_lc=0.15 * FCE, f_uc=0.55 * FCE)


def test_spectrum_normalization():
    """int W(w) dw over the band = bw_t^2 (the total wave power)."""
    w = np.linspace(2 * math.pi * SPEC.f_lc, 2 * math.pi * SPEC.f_uc, 20001)
    total = np.trapezoid(SPEC.power_density(w), w)
    assert abs(total / SPEC.bw_t**2 - 1.0) < 1.0e-6
    assert SPEC.power_density(2 * math.pi * SPEC.f_lc * 0.99) == 0.0
    assert SPEC.power_density(2 * math.pi * SPEC.f_uc * 1.01) == 0.0


def test_resonant_root_satisfies_both_conditions():
    """Each root satisfies the resonance condition AND lies on the cold
    parallel R-mode dispersion (k = s (w/c) mu_R)."""
    e_kev, alpha = 40.0, np.radians(45.0)
    roots = diffusion.resonant_roots(e_kev, alpha, B0, NE, SPEC)
    ok = roots["valid"]
    assert ok.sum() >= 1
    gamma, v, _ = diffusion.kinematics(e_kev)
    wc_rel = 2 * math.pi * FCE / gamma
    wj = roots["w"][ok]
    kj = roots["k"][ok]
    mu, prop = diffusion._mu_r(wj / (2 * math.pi), B0, NE)
    assert prop.all()
    np.testing.assert_allclose(np.abs(kj), (wj / C_LIGHT) * mu, rtol=1e-12)
    res = wj - kj * v * np.cos(alpha) - wc_rel
    assert (np.abs(res) < 1.0e-6 * wc_rel).all()


def test_root_matches_independent_resonance_energy():
    """Invert the chain: at alpha = 0 the root frequency w_j fed into
    analysis.cyclotron_resonance_energy_ev (independent closed form,
    relativistic) must return exactly the particle's kinetic energy."""
    e_kev = 40.0
    roots = diffusion.resonant_roots(e_kev, 0.0, B0, NE, SPEC)
    ok = roots["valid"]
    assert ok.sum() == 1
    f_j = float(roots["w"][ok][0]) / (2 * math.pi)
    e_back = cyclotron_resonance_energy_ev(f_j, B0, NE, relativistic=True)
    assert abs(e_back / (e_kev * 1.0e3) - 1.0) < 1.0e-6


def test_no_resonance_outside_band_means_zero():
    """An energy whose resonant frequency misses the band diffuses not at
    all (W = 0 there): D_aa = 0, n_roots = 0."""
    # 2 MeV at this fpe/fce resonates far below the 0.15 fce band floor
    c = diffusion.local_coefficients(2000.0, np.radians(45.0), B0, NE, SPEC)
    assert c["n_roots"] == 0
    assert c["daa"] == 0.0 and c["dpp"] == 0.0


def test_dap_dpp_per_root_relations():
    """With a single resonant root, D_ap^2 = D_aa D_pp exactly (the kick
    direction is deterministic per root: derive_diffusion.py step 3)."""
    e_kev, alpha = 40.0, np.radians(45.0)
    spec1 = WaveSpectrum(bw_t=SPEC.bw_t, f_m=SPEC.f_m, df=SPEC.df,
                         f_lc=SPEC.f_lc, f_uc=SPEC.f_uc,
                         directions="backward")
    c = diffusion.local_coefficients(e_kev, alpha, B0, NE, spec1)
    assert c["n_roots"] == 1
    assert c["daa"] > 0.0
    np.testing.assert_allclose(c["dap"] ** 2, c["daa"] * c["dpp"],
                               rtol=1.0e-10)
    # sign: counter-streaming whistler resonance sits at w/(k v) < 0
    # (backward wave, forward particle) -> q < 0 -> D_ap = -q p D_aa > 0
    assert c["dap"] > 0.0


def test_symmetric_spectrum_symmetric_alpha():
    """directions='both' makes D(alpha) = D(pi - alpha): the two wave
    directions swap roles under v_par -> -v_par."""
    e_kev = 40.0
    a = np.radians(np.array([30.0, 55.0, 80.0]))
    c1 = diffusion.local_coefficients(e_kev, a, B0, NE, SPEC)
    c2 = diffusion.local_coefficients(e_kev, math.pi - a, B0, NE, SPEC)
    np.testing.assert_allclose(c1["daa"], c2["daa"], rtol=1e-9)
    np.testing.assert_allclose(c1["dpp"], c2["dpp"], rtol=1e-9)
    # the mixed term is odd under the reflection
    np.testing.assert_allclose(c1["dap"], -c2["dap"], rtol=1e-9)


def test_daa_scales_with_wave_power():
    """Quasi-linear: D proportional to <Bw^2>."""
    e_kev, alpha = 40.0, np.radians(45.0)
    d1 = diffusion.daa_local(e_kev, alpha, B0, NE, SPEC)
    spec2 = WaveSpectrum(bw_t=3.0 * SPEC.bw_t, f_m=SPEC.f_m, df=SPEC.df,
                         f_lc=SPEC.f_lc, f_uc=SPEC.f_uc)
    d9 = diffusion.daa_local(e_kev, alpha, B0, NE, spec2)
    np.testing.assert_allclose(d9 / d1, 9.0, rtol=1e-9)


def test_mirror_latitude_invariant():
    """sin^2 a_eq sqrt(1+3 sin^2 lm) = cos^6 lm at the returned lm; and
    the equatorial particle does not mirror (lm -> 0)."""
    aeq = np.radians(np.array([10.0, 30.0, 60.0, 89.99]))
    lm = diffusion.mirror_latitude(aeq)
    lhs = np.sin(aeq) ** 2 * np.sqrt(1.0 + 3.0 * np.sin(lm) ** 2)
    np.testing.assert_allclose(lhs, np.cos(lm) ** 6, atol=1e-9)
    assert lm[-1] < 1.0e-3
    assert (np.diff(lm) < 0).all()       # higher a_eq mirrors lower


def test_bounce_period_matches_dipole_approximation():
    """tau_b from the bounce integral vs the classic dipole approximation
    T(a_eq) ~ 1.3802 - 0.3198 (sin a_eq + sqrt(sin a_eq)) -- an
    independent fit accurate to ~1%."""
    env = medium.make_env_lat()
    l_shell = 4.0
    e_kev = 100.0
    aeq = np.radians(np.array([20.0, 45.0, 70.0]))
    ba = diffusion.bounce_averaged(e_kev, aeq, l_shell, env, SPEC, n_lat=128)
    _, v, _ = diffusion.kinematics(e_kev)
    t_fit = 1.3802 - 0.3198 * (np.sin(aeq) + np.sqrt(np.sin(aeq)))
    tb_fit = 4.0 * l_shell * RE / v * t_fit
    np.testing.assert_allclose(ba["tau_b"], tb_fit, rtol=0.015)


def test_bounce_average_equatorial_limit():
    """a_eq -> 90 deg: <D_aa_eq> -> D_eq / 2 EXACTLY. The particle never
    leaves the equator, but the chain factor (tan a_eq / tan a)^2 ->
    (cos a / cos a_eq)^2 still averages over the equatorial bounce
    oscillation: with cos a = cos a_eq sqrt(1 - u^2) along the bounce,
    <(1-u^2)> under the 1/cos a bounce weight is
    int sqrt(1-u^2) du / int du/sqrt(1-u^2) = (pi/4)/(pi/2) = 1/2."""
    env = medium.make_env_lat()
    l_shell = 4.0
    bm = float(medium.b_mag(l_shell, 0.0, env))
    ne = float(medium.ne_total_m3(l_shell, 0.0, env))
    fce = FCE_E * bm
    # near 90 deg pitch angle v_par ~ 0, so the resonance sits at
    # w ~ wce/gamma = 0.84 fce for 100 keV -- the band must reach it
    spec = WaveSpectrum(bw_t=100e-12, f_m=0.5 * fce, df=0.25 * fce,
                        f_lc=0.05 * fce, f_uc=0.95 * fce)
    aeq = np.radians(89.5)
    ba = diffusion.bounce_averaged(100.0, aeq, l_shell, env, spec)
    d_eq = diffusion.daa_local(100.0, aeq, bm, ne, spec)
    assert d_eq > 0.0
    # 6% slack: D_local varies slightly along the (tiny) bounce path and
    # a_eq = 89.5 deg is not exactly 90
    np.testing.assert_allclose(ba["daa"], 0.5 * d_eq, rtol=0.08)


def test_lat_cut_reduces_bounce_average():
    """Confining the wave power toward the equator can only reduce <D>."""
    env = medium.make_env_lat()
    bm = float(medium.b_mag(4.0, 0.0, env))
    fce = FCE_E * bm
    spec = WaveSpectrum(bw_t=100e-12, f_m=0.3 * fce, df=0.2 * fce,
                        f_lc=0.05 * fce, f_uc=0.8 * fce)
    full = diffusion.bounce_averaged(100.0, np.radians(30.0), 4.0, env, spec)
    cut = diffusion.bounce_averaged(100.0, np.radians(30.0), 4.0, env, spec,
                                    lat_cut_deg=10.0)
    assert 0.0 <= cut["daa"] <= full["daa"] * (1.0 + 1e-12)


def test_loss_cone_lifetime_inverse_power():
    """tau ~ 1/<D_aa> at the loss cone scales as 1/Bw^2; no-resonance
    configurations report inf (the wave model sets no lifetime)."""
    env = medium.make_env_lat()
    bm = float(medium.b_mag(4.0, 0.0, env))
    fce = FCE_E * bm
    spec = WaveSpectrum(bw_t=100e-12, f_m=0.3 * fce, df=0.2 * fce,
                        f_lc=0.02 * fce, f_uc=0.8 * fce)
    t1 = diffusion.loss_cone_lifetime_s(300.0, 4.0, env, spec)
    spec2 = WaveSpectrum(bw_t=200e-12, f_m=0.3 * fce, df=0.2 * fce,
                         f_lc=0.02 * fce, f_uc=0.8 * fce)
    t2 = diffusion.loss_cone_lifetime_s(300.0, 4.0, env, spec2)
    assert np.isfinite(t1) and np.isfinite(t2)
    np.testing.assert_allclose(t1 / t2, 4.0, rtol=1e-6)
    # a band that misses every resonance on the line -> inf
    thin = WaveSpectrum(bw_t=100e-12, f_m=0.9 * fce, df=0.01 * fce,
                        f_lc=0.89 * fce, f_uc=0.91 * fce)
    assert np.isinf(diffusion.loss_cone_lifetime_s(5000.0, 4.0, env, thin))


# ---------------------------------------------------------------------------
# the decisive check: test-particle Monte Carlo vs quasi-linear D_aa
# ---------------------------------------------------------------------------

def _boris_push(e_kev, alpha0, spec, n_part, n_modes, t_end, dt, seed,
                mode="whistler"):
    """Relativistic Boris pusher through an explicit random-phase circular
    wave field in uniform B0 z. Mode frequencies are stratified-random
    PER PARTICLE (each particle draws its own n_modes frequencies, one
    per sub-band) so the ensemble-average spectrum is continuous -- the
    standard cure for discrete-mode resonance-overlap artifacts. Field
    conventions are exactly those derived in tools/derive_diffusion.py:
    R-mode: Bw_i (cos ph, -sin ph, 0), Ew_i = -(w_i/k_i) Bw_i
    (sin ph, cos ph, 0); L-mode ('emic'): Bw_i (cos ph, +sin ph, 0),
    Ew_i = +(w_i/k_i) Bw_i (sin ph, -cos ph, 0);
    ph = k_i z - w_i t + random chi_i. Propagation direction follows the
    mode's resonance (backward for R, forward for L at vpar > 0).
    Returns final pitch angles."""
    rng = np.random.default_rng(seed)
    pol = 1.0 if mode == "whistler" else -1.0       # R vs L rotation sense
    w_lo, w_hi = 2 * math.pi * spec.f_lc, 2 * math.pi * spec.f_uc
    dw = (w_hi - w_lo) / n_modes
    w_ij = w_lo + (np.arange(n_modes)[None, :]
                   + rng.random((n_part, n_modes))) * dw
    mu_ij, ok = diffusion._mu_r(w_ij / (2 * math.pi), B0, NE, mode=mode)
    assert ok.all()
    k_sign = -1.0 if mode == "whistler" else 1.0
    k_ij = k_sign * (w_ij / C_LIGHT) * mu_ij
    b_ij = np.sqrt(spec.power_density(w_ij) * dw)
    e_ij = -pol * (w_ij / k_ij) * b_ij
    chi_ij = rng.random((n_part, n_modes)) * 2 * math.pi

    _, _, p0 = diffusion.kinematics(e_kev)
    phi_g = rng.random(n_part) * 2 * math.pi
    p = np.stack([p0 * math.sin(alpha0) * np.cos(phi_g),
                  p0 * math.sin(alpha0) * np.sin(phi_g),
                  np.full(n_part, p0 * math.cos(alpha0))], axis=1)
    z = rng.random(n_part) * 1.0e6

    q = -Q_E
    half = 0.5 * q * dt
    mc = M_E * C_LIGHT
    t = 0.0
    for _ in range(int(t_end / dt)):
        ph = k_ij * z[:, None] - w_ij * t + chi_ij
        eph = np.exp(1j * ph)
        cph, sph = eph.real, eph.imag
        bx = (b_ij * cph).sum(1)
        by = -pol * (b_ij * sph).sum(1)
        ex = (e_ij * sph).sum(1)
        ey = pol * (e_ij * cph).sum(1)
        p[:, 0] += half * ex
        p[:, 1] += half * ey
        g = np.sqrt(1.0 + (p * p).sum(1) / mc**2)
        bv = np.stack([bx, by, np.full_like(bx, B0)], 1)
        bm = np.sqrt((bv * bv).sum(1))
        # exact-angle Boris: |t| = tan(theta/2), theta the true rotation
        tv = bv / bm[:, None] * np.tan(0.5 * q * dt * bm / (M_E * g))[:, None]
        sv = 2.0 * tv / (1.0 + (tv * tv).sum(1))[:, None]
        pp = p + np.cross(p, tv)
        p = p + np.cross(pp, sv)
        p[:, 0] += half * ex
        p[:, 1] += half * ey
        g = np.sqrt(1.0 + (p * p).sum(1) / mc**2)
        z += p[:, 2] / (M_E * g) * dt
        t += dt
    return np.arctan2(np.hypot(p[:, 0], p[:, 1]), p[:, 2]), t


@pytest.mark.slow
def test_testparticle_monte_carlo_matches_daa():
    """Electrons pushed through an explicit random-phase wave field
    diffuse at the quasi-linear rate: <(alpha - alpha0)^2> / (2t) within
    ~40% of D_aa (statistical floor ~10% at 192 particles; the MSD-vs-t
    curve was verified linear, i.e. genuinely diffusive, when this
    tolerance was calibrated)."""
    e_kev, alpha0 = 40.0, math.radians(45.0)
    spec = WaveSpectrum(bw_t=SPEC.bw_t, f_m=SPEC.f_m, df=SPEC.df,
                        f_lc=SPEC.f_lc, f_uc=SPEC.f_uc,
                        directions="backward")
    d_ql = float(diffusion.daa_local(e_kev, alpha0, B0, NE, spec))
    assert d_ql > 0.0
    wce = 2 * math.pi * FCE
    alpha, t = _boris_push(e_kev, alpha0, spec, n_part=192, n_modes=192,
                           t_end=0.02, dt=0.25 / wce, seed=11)
    d_mc = float(np.mean((alpha - alpha0) ** 2) / (2.0 * t))
    assert 0.6 < d_mc / d_ql < 1.6, (d_mc, d_ql)


def test_spectrum_from_rays_moments():
    """Moment matching: total power is the incoherent sum, f_m/df are the
    power-weighted mean/std, the band covers every contributing ray, and
    zero-amplitude rays are ignored."""
    f = np.array([800.0, 1000.0, 1500.0, 4000.0])
    bw = np.array([50e-12, 100e-12, 50e-12, 0.0])
    spec = diffusion.spectrum_from_rays(f, bw)
    np.testing.assert_allclose(spec.bw_t**2, (bw**2).sum(), rtol=1e-12)
    p = bw**2
    fm = (p * f).sum() / p.sum()
    df = math.sqrt((p * (f - fm) ** 2).sum() / p.sum())
    np.testing.assert_allclose(spec.f_m, fm, rtol=1e-12)
    np.testing.assert_allclose(spec.df, df, rtol=1e-12)
    # the dead 4 kHz ray must not drag the band up
    assert spec.f_uc < 4000.0
    assert spec.f_lc < 800.0 < 1500.0 < spec.f_uc
    # the banded integral still carries the matched total power
    w = np.linspace(2 * math.pi * spec.f_lc, 2 * math.pi * spec.f_uc, 40001)
    total = np.trapezoid(spec.power_density(w), w)
    np.testing.assert_allclose(total, spec.bw_t**2, rtol=1e-6)


def test_spectrum_from_rays_monochromatic_floor():
    """A single-frequency ray set keeps a finite bandwidth (the floor)
    and pins f_m to that frequency; empty power raises."""
    spec = diffusion.spectrum_from_rays([1000.0, 1000.0], [1e-12, 2e-12])
    assert spec.f_m == 1000.0
    assert spec.df == 0.05 * 1000.0
    assert spec.f_lc < 1000.0 < spec.f_uc
    with pytest.raises(ValueError):
        diffusion.spectrum_from_rays([1000.0], [0.0])


def test_jax_local_matches_numpy():
    """The jittable chip path (local_coefficients_jax) is the SAME algorithm
    as the numpy float64 oracle -- same root lattice, same bisection count,
    same Jacobian floor -- so on the CPU-x64 test backend the two must agree
    to rounding, root counts exactly."""
    import jax

    e = np.array([[20.0], [40.0], [80.0], [300.0]])        # keV
    a = np.radians(np.linspace(12.0, 78.0, 6))[None, :]
    ref = diffusion.local_coefficients(e, a, B0, NE, SPEC)
    fn = jax.jit(lambda ek, al: diffusion.local_coefficients_jax(
        ek, al, B0, NE, SPEC))
    got = {k: np.asarray(v) for k, v in fn(e, a).items()}
    assert (got["n_roots"] == ref["n_roots"]).all()
    assert ref["n_roots"].sum() >= 8        # the case actually resonates
    for key in ("daa", "dap", "dpp"):
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-9,
                                   atol=1e-30, err_msg=key)


def test_jax_local_directional_spectrum():
    """Parity holds for a one-sided spectrum too (exercises the static
    direction loop at length 1)."""
    spec = WaveSpectrum(bw_t=SPEC.bw_t, f_m=SPEC.f_m, df=SPEC.df,
                        f_lc=SPEC.f_lc, f_uc=SPEC.f_uc,
                        directions="forward")
    e, a = 55.0, np.radians([30.0, 60.0])
    ref = diffusion.local_coefficients(e, a, B0, NE, spec)
    got = {k: np.asarray(v) for k, v in
           diffusion.local_coefficients_jax(e, a, B0, NE, spec).items()}
    assert (got["n_roots"] == ref["n_roots"]).all()
    np.testing.assert_allclose(got["daa"], ref["daa"], rtol=1e-9)


def test_jax_bounce_average_matches_numpy():
    """bounce_averaged_jax (the chip path: jnp medium + jittable local
    chain + fori_loop mirror bisection) agrees with the numpy float64
    oracle to rounding on the CPU-x64 backend, including the lat-cut
    mask and under jax.jit."""
    import functools

    import jax

    from raytrace_tpu.models import make_env_lat

    env = make_env_lat()
    spec = WaveSpectrum(bw_t=50e-12, f_m=800.0, df=300.0,
                        f_lc=200.0, f_uc=1800.0)
    e = np.array([[30.0], [100.0], [300.0]])
    a = np.radians([[20.0, 45.0, 70.0]])
    kw = dict(n_lat=24, n_grid=192, n_bisect=24)
    ref = diffusion.bounce_averaged(e, a, 3.0, env, spec,
                                    lat_cut_deg=20.0, **kw)
    fn = jax.jit(functools.partial(diffusion.bounce_averaged_jax,
                                   l_shell=3.0, env=env, spec=spec,
                                   lat_cut_deg=20.0, **kw))
    got = fn(e, a)
    assert np.asarray(ref["daa"]).max() > 0.0
    for k in ("daa", "dap", "dpp", "tau_b", "mirror_lat_rad"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-12, atol=1e-30, err_msg=k)


def test_jax_local_momentum_units_mc():
    """momentum_units='mc' returns the momentum channels in m_e c units:
    dap x (m_e c) and dpp x (m_e c)^2 equal the SI oracle. (On float32
    chips 'mc' is mandatory -- p_SI ~ 1e-22 underflows f32 in D_pp.)"""
    from raytrace_tpu.constants import C_LIGHT, M_E

    e, a = 55.0, np.radians([30.0, 60.0])
    ref = diffusion.local_coefficients(e, a, B0, NE, SPEC)
    got = diffusion.local_coefficients_jax(e, a, B0, NE, SPEC,
                                           momentum_units="mc")
    s = M_E * C_LIGHT
    np.testing.assert_allclose(np.asarray(got["daa"]), ref["daa"],
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got["dap"]) * s, ref["dap"],
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got["dpp"]) * s * s, ref["dpp"],
                               rtol=1e-9)
    with pytest.raises(ValueError):
        diffusion.local_coefficients_jax(e, a, B0, NE, SPEC,
                                         momentum_units="cgs")


# ---- EMIC (L-mode) electron scattering: the anomalous n = -1 channel ----

FCP = FCE / 1836.15267
EMIC_SPEC = WaveSpectrum(bw_t=1e-9, f_m=0.6 * FCP, df=0.25 * FCP,
                         f_lc=0.3 * FCP, f_uc=0.95 * FCP)


def test_emic_root_on_l_branch_anomalous_resonance():
    """EMIC roots satisfy w - k vpar = -wc/gamma (n = -1) ON the L-mode
    dispersion, and propagate forward (k > 0) for vpar > 0 -- the
    electron must outrun the wave to see its rotation sense reversed."""
    e_kev, alpha = 5000.0, np.radians(60.0)
    roots = diffusion.resonant_roots(e_kev, alpha, B0, NE, EMIC_SPEC,
                                     mode="emic")
    ok = roots["valid"]
    assert ok.sum() >= 1
    wj, kj = roots["w"][ok], roots["k"][ok]
    assert (kj > 0.0).all()
    mu, prop = diffusion._mu_r(wj / (2 * math.pi), B0, NE, mode="emic")
    assert prop.all()
    np.testing.assert_allclose(kj, (wj / C_LIGHT) * mu, rtol=1e-12)
    gamma, v, _ = diffusion.kinematics(e_kev)
    res = wj - kj * v * math.cos(alpha) + 2 * math.pi * FCE / gamma
    assert (np.abs(res) < 1e-6 * 2 * math.pi * FCE / gamma).all()


def test_emic_scatters_only_relativistic_electrons():
    """The textbook EMIC phenomenology on this framework's own dispersion:
    (a) a minimum resonant energy in the MeV range (w << wc_e forces
    k vpar ~ wc/gamma, reachable only at v ~ c); (b) the threshold DROPS
    with plasma density (larger mu_L -- why EMIC loss lives in plumes);
    (c) scattering is almost purely pitch-angle (w/(k v) << 1 makes
    D_pp/p^2 negligible against D_aa)."""
    alpha = np.radians(60.0)
    low = diffusion.local_coefficients(1000.0, alpha, B0, NE, EMIC_SPEC,
                                       mode="emic")
    assert low["n_roots"] == 0 and low["daa"] == 0.0
    hi = diffusion.local_coefficients(5000.0, alpha, B0, NE, EMIC_SPEC,
                                      mode="emic")
    assert hi["n_roots"] >= 1 and hi["daa"] > 1e-4     # ~1 nT is strong

    def threshold(ne):
        for e in np.geomspace(200.0, 20000.0, 48):
            c = diffusion.local_coefficients(e, alpha, B0, ne, EMIC_SPEC,
                                             mode="emic")
            if c["n_roots"] > 0:
                return e
        return np.inf

    th = [threshold(ne) for ne in (1e8, 1e9, 1e10)]
    assert th[0] > th[1] > th[2]
    assert 1.0e3 < th[0] < 1.0e4                       # 1-10 MeV at 100/cc
    # near-pure pitch-angle diffusion (measured ratio ~5e-6 here)
    _, _, p = diffusion.kinematics(5000.0)
    assert hi["dpp"] / (p * p) < 1e-4 * hi["daa"]


def test_jax_emic_matches_numpy():
    """mode='emic' parity of the jittable chain vs the numpy oracle."""
    e = np.array([3000.0, 5000.0, 8000.0])
    a = np.radians(55.0)
    ref = diffusion.local_coefficients(e, a, B0, NE, EMIC_SPEC, mode="emic")
    got = {k: np.asarray(v) for k, v in diffusion.local_coefficients_jax(
        e, a, B0, NE, EMIC_SPEC, mode="emic").items()}
    assert (got["n_roots"] == ref["n_roots"]).all()
    assert ref["n_roots"].sum() >= 2
    for key in ("daa", "dap", "dpp"):
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-9,
                                   atol=1e-60, err_msg=key)


@pytest.mark.slow
def test_emic_monte_carlo_matches_daa():
    """L-mode test particles: 5 MeV electrons pushed through an explicit
    random-phase EMIC wave field diffuse in pitch angle at the
    quasi-linear rate. Shares field conventions (derived in
    tools/derive_diffusion.py) but no quasi-linear algebra."""
    e_kev, alpha0 = 5000.0, math.radians(60.0)
    spec = WaveSpectrum(bw_t=EMIC_SPEC.bw_t, f_m=EMIC_SPEC.f_m,
                        df=EMIC_SPEC.df, f_lc=EMIC_SPEC.f_lc,
                        f_uc=EMIC_SPEC.f_uc, directions="forward")
    d_ql = float(diffusion.daa_local(e_kev, alpha0, B0, NE, spec,
                                     mode="emic"))
    assert d_ql > 0.0
    wce = 2 * math.pi * FCE
    alpha, t = _boris_push(e_kev, alpha0, spec, n_part=160, n_modes=160,
                           t_end=0.05, dt=0.25 / wce, seed=23, mode="emic")
    d_mc = float(np.mean((alpha - alpha0) ** 2) / (2.0 * t))
    assert 0.6 < d_mc / d_ql < 1.6, (d_mc, d_ql)
