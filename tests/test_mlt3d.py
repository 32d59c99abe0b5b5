"""MLT-resolved (non-axisymmetric) 3D plasmasphere (make_env(ps_mlt=True)).

The reference's 3D trace freezes MLT as a scalar even though it carries a
longitude state (RayTrace_3D.jl:108-117: mlt enters only the trough
constant at :114). Here phi maps to local time and modulates the
plasmapause (the drift-derived dusk teardrop of convection.py, as a smooth
low-order Fourier shape) and the trough level -- so d mu/d phi != 0 from
the DENSITY alone, with the centered dipole field. Validated three ways:
exact phi = 0 reduction to the axisymmetric medium, fused-vs-autodiff
gradient parity, and independent-language trajectory parity against the
C++ oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
from raytrace_tpu.models import medium as M
from raytrace_tpu.ops import dispersion as D
from raytrace_tpu.ops import fused as F
from raytrace_tpu.ops import rhs as RHS


@pytest.fixture(scope="module")
def env_mlt():
    return M.make_env(b0=3.12e-5, ps_mlt=True)


@pytest.fixture(scope="module")
def env_axi():
    return M.make_env(b0=3.12e-5)


def _dusk_dawn_phi(env):
    """Longitudes whose MLT is 18 h / 6 h for this env's base angle."""
    return np.pi / 2 - env.ps_mlt_a0, -np.pi / 2 - env.ps_mlt_a0


def test_phi0_is_the_axisymmetric_medium_exactly(env_mlt, env_axi):
    """The phi = 0 meridian reproduces the base medium bit-for-bit: the
    shape is normalized to S(a0) == 1 and lppo/ne_lppi/trough are
    anchored by construction (mlt_ps_params docstring)."""
    lppi_e, lppo_e, ne_lppi_e, trough_e = M.mlt_ps_params(0.0, env_mlt)
    np.testing.assert_allclose(float(lppi_e), env_axi.lppi, rtol=1e-14)
    np.testing.assert_allclose(float(lppo_e), env_axi.lppo, rtol=1e-12)
    np.testing.assert_allclose(float(ne_lppi_e), env_axi.ne_lppi,
                               rtol=1e-12)
    np.testing.assert_allclose(float(trough_e), env_axi.ps_trough,
                               rtol=1e-14)
    for r, lat in ((1.5, 0.3), (3.0, 0.6), (4.3, 0.0), (6.5, 0.9)):
        np.testing.assert_allclose(
            float(M.ne_total_m3(r, lat, env_mlt, phi=0.0)),
            float(M.ne_total_m3(r, lat, env_axi)), rtol=1e-12,
        )


def test_dusk_bulge_and_periodicity(env_mlt):
    """The traced plasmapause bulges at dusk like the derived LCE
    (roughly 1.5-1.7x dawn at 3 harmonics) and is 2 pi periodic."""
    dusk, dawn = _dusk_dawn_phi(env_mlt)
    li_dusk = float(M.mlt_ps_params(dusk, env_mlt)[0])
    li_dawn = float(M.mlt_ps_params(dawn, env_mlt)[0])
    assert 1.4 < li_dusk / li_dawn < 1.8
    for a, b in [(0.3, 0.3 + 2 * np.pi), (dusk, dusk - 2 * np.pi)]:
        pa = M.mlt_ps_params(a, env_mlt)
        pb = M.mlt_ps_params(b, env_mlt)
        for x, y in zip(pa, pb):
            np.testing.assert_allclose(float(x), float(y), rtol=1e-12)
    # lppo follows lppi with the branch-2/3 crossing width, staying a
    # genuine knee everywhere (lppo > lppi)
    for phi in np.linspace(-np.pi, np.pi, 17):
        p = M.mlt_ps_params(phi, env_mlt)
        assert float(p[1]) > float(p[0])


def test_trough_day_night_modulation(env_mlt):
    """trough(phi = 0) == ps_trough exactly; the full modulation swing is
    2 * tamp (day-night); minimum at local midnight (mlt = 0/24 h,
    i.e. cos(pi mlt/12) = 1)."""
    tr0 = float(M.mlt_ps_params(0.0, env_mlt)[3])
    np.testing.assert_allclose(tr0, env_mlt.ps_trough, rtol=1e-14)
    phis = np.linspace(-np.pi, np.pi, 721)
    tr = np.array([float(M.mlt_ps_params(p, env_mlt)[3]) for p in phis])
    np.testing.assert_allclose(tr.max() - tr.min(),
                               2.0 * env_mlt.ps_mlt_tamp, rtol=1e-4)
    # midnight: ang = pi mlt/12 - pi = -pi -> cos(ang) = -1 (minimum)
    i_min = np.argmin(tr)
    ang_min = env_mlt.ps_mlt_a0 + phis[i_min]
    np.testing.assert_allclose(
        np.cos(ang_min), -1.0, atol=1e-4,
    )


def _parity_grid(env, n=160, seed=0, general=False):
    rng = np.random.default_rng(seed)
    r = rng.uniform(1.2, 7.0, n)
    th = rng.uniform(0.4, 2.6, n)
    phi = rng.uniform(-4.0, 7.0, n)
    f = rng.uniform(500.0, 8000.0, n)
    k = rng.normal(size=(3, n))
    k = 20.0 * k / np.linalg.norm(k, axis=0)

    def ad(r, th, ph, rr, rt, rp, ff):
        mu, g = jax.value_and_grad(D.mu_3d, argnums=(0, 1, 2, 3, 4, 5, 6))(
            r, th, ph, rr, rt, rp, ff, env)
        return jnp.stack([mu, *g])

    fused_fn = F.mu_and_grads_3d_general if general else F.mu_and_grads_3d

    def fu(r, th, ph, rr, rt, rp, ff):
        mu, g = fused_fn(r, th, ph, rr, rt, rp, ff, env)
        return jnp.stack([mu, *g])

    args = tuple(map(jnp.asarray, (r, th, phi, *k, f)))
    return np.asarray(jax.vmap(ad)(*args)), np.asarray(jax.vmap(fu)(*args))


@pytest.mark.parametrize("variant",
                         ["hard", "smooth", "refill", "duct", "gcpm"])
def test_fused_matches_autodiff_mlt(variant):
    """The hand-fused d mu/d phi chain equals autodiff of mu_3d through
    every medium variant the MLT parameters touch (hard branches, the
    sigmoid-blend boundaries that MOVE with phi, refill toward the MLT-
    independent branch 1, the multiplicative duct, and the GCPM knee
    whose sigmoid center rides the teardrop)."""
    kw = dict(
        hard={}, smooth=dict(ps_smooth=0.05),
        refill=dict(ps_refill=0.5, ps_refill_q=4.0),
        duct=dict(duct_amp=0.5, duct_l0=3.0, duct_w=0.2),
        gcpm=dict(ps_model="gcpm"),
    )[variant]
    env = M.make_env(b0=3.12e-5, ps_mlt=True, **kw)
    A, B = _parity_grid(env)
    # both chains must be finite over the whole grid, including extreme
    # L where branch 2 underflows under XLA's flush-to-zero (the ln2
    # log-space guard in plasmasphere.ne_plasma_cm3 / fused._ne_and_grads)
    assert np.isfinite(B).all()
    assert np.isfinite(A).all()
    # standard atol + rtol form: relative 1e-9 where the entry is
    # significant, with a per-column absolute floor (1e-9 of the column
    # scale) that covers saturated-sigmoid tail noise -- autodiff gives
    # O(1e-12) where the fused chain gives exact 0, on columns of scale
    # O(10)
    tol = 1e-9 * (np.abs(A) + np.max(np.abs(A), axis=0))
    bad = np.abs(A - B) > tol
    assert not bad.any(), (variant, np.abs(A - B)[bad].max())
    # and the phi-gradient is alive somewhere on the grid
    assert np.abs(A[:, 3]).max() > 1e-2


def test_dmudphi_zero_iff_axisymmetric(env_mlt, env_axi):
    """d mu/d phi != 0 from density alone (centered dipole) in the knee,
    and identically 0 for the axisymmetric control."""
    th = np.pi / 2 - 1.05
    rho = D.consistent_rho_3d(4.0, th, 1.0, (1.0, 1.0, 0.0), 1000.0,
                              env_mlt)
    args = (4.0, th, 1.0, *map(float, rho), 1000.0)
    g_mlt = float(jax.grad(D.mu_3d, argnums=2)(*args, env_mlt))
    g_axi = float(jax.grad(D.mu_3d, argnums=2)(*args, env_axi))
    assert g_axi == 0.0
    assert abs(g_mlt) > 1e-3
    # fused agrees
    _, grads = F.mu_and_grads_3d(*args, env_mlt)
    np.testing.assert_allclose(float(grads[2]), g_mlt, rtol=1e-10)


def test_native_oracle_rhs_parity_mlt(env_mlt):
    """Independent-language check: the C++ oracle's FD gradients through
    its own MLT chain match the fused JAX RHS (3D, centered dipole)."""
    from raytrace_tpu import native

    rng = np.random.default_rng(1)
    worst = 0.0
    for _ in range(12):
        r = rng.uniform(1.5, 6.5)
        th = rng.uniform(0.6, 2.2)
        ph = rng.uniform(-3.0, 5.0)
        fq = rng.uniform(600.0, 5000.0)
        rho = D.consistent_rho_3d(r, th, ph, (1.0, 1.0, 0.2), fq, env_mlt)
        u = np.array([r, th, ph, *map(float, rho), 0.0])
        du_n = native.rhs_3d(u, fq, env_mlt)
        du_j = np.asarray(RHS.rhs_3d(jnp.asarray(u), fq, env_mlt))
        rel = np.abs(du_n - du_j) / np.maximum(np.abs(du_j), 1e-10)
        worst = max(worst, float(rel.max()))
    assert worst < 5e-5, worst  # FD-accuracy floor of the oracle


def test_plume_ray_native_trajectory_parity_and_physics(env_mlt, env_axi):
    """A knee-crossing ray at dusk sees the EXPANDED plasmasphere (the
    plume): its landing shifts vs the axisymmetric control, the dawn ray
    shifts the other way, and the C++ oracle integrates the same dusk
    trajectory (independent-language parity)."""
    from raytrace_tpu import native

    r0 = (RE + 1.0e6) / RE
    th0 = np.pi / 2 - 1.05
    dusk, dawn = _dusk_dawn_phi(env_mlt)
    cfg = SolverConfig(rtol=1e-9, atol=1e-13, dt0=1e-4)
    spec = StopSpec(r_floor=1.0, t_max=5e9 / RE, lat_sign=-1.0,
                    lat_offset=np.pi / 2)

    def run(env, ph0):
        rho0 = D.consistent_rho_3d(r0, th0, ph0, (1.0, 1.0, 0.0), 1000.0,
                                   env)
        u0 = np.array([r0, th0, ph0, *map(float, rho0), 0.0])
        res = trace(lambda u, ff: RHS.rhs_3d(u, ff, env),
                    jnp.asarray([u0]), jnp.asarray([1000.0]), cfg=cfg,
                    spec=spec, max_steps=400000, group_idx=6)
        return u0, np.asarray(res.u[0]), int(res.status[0])

    u0_dusk, u_dusk, st_dusk = run(env_mlt, dusk)
    _, u_dawn, st_dawn = run(env_mlt, dawn)
    _, u_ctrl, st_ctrl = run(env_axi, dusk)
    assert st_dusk == st_dawn == st_ctrl == events.HIT_EARTH
    d_dusk = u_dusk[1] - u_ctrl[1]
    d_dawn = u_dawn[1] - u_ctrl[1]
    # the medium change is real and opposite-signed at dusk vs dawn
    assert abs(d_dusk) > 1e-3 and abs(d_dawn) > 1e-3
    assert np.sign(d_dusk) != np.sign(d_dawn)

    nat = native.trace_3d(u0_dusk, 1000.0, env_mlt, rtol=1e-9, atol=1e-13,
                          t_max=5e9 / RE, max_steps=400000)
    assert nat["status"] == events.HIT_EARTH
    np.testing.assert_allclose(nat["u"][1], u_dusk[1], atol=5e-8)
    np.testing.assert_allclose(nat["u"][6], u_dusk[6], rtol=1e-5)


def test_make_env_refusals():
    """ps_mlt needs a plasmasphere to modulate; tilted/IGRF fields and
    the GCPM plasmasphere all compose (the MLT axis becomes the
    magnetic longitude, mlon_3d; the GCPM knee rides the same Fourier
    teardrop, mlt_gcpm_params)."""
    with pytest.raises(ValueError, match="ps_mlt"):
        M.make_env(ps_mlt=True, plasmasphere_on=False)
    # composes without raising
    M.make_env(ps_mlt=True, b_model="tilted", b_tilt=0.2)
    M.make_env(ps_mlt=True, b_model="igrf")
    M.make_env(ps_mlt=True, ps_model="gcpm")


@pytest.fixture(scope="module")
def env_mlt_tilted():
    return M.make_env(b0=3.12e-5, ps_mlt=True, b_model="tilted",
                      b_tilt=0.2, b_tilt_phi=0.5)


def test_mlon_tilt_to_zero_limit(env_mlt):
    """tilt -> 0 collapses the magnetic longitude back to geographic phi:
    bitwise via the b_model="dipole" branch of mlon_3d, and to ~1 ulp
    through mlon_tilted itself (the value still passes through atan2 of
    the rotated components, so the reduction is exact only up to
    rounding -- mlon_tilted docstring)."""
    from raytrace_tpu.models import dipole

    for theta, phi in [(0.7, 0.3), (1.2, -2.0), (0.4, 2.9), (2.1, -0.1)]:
        assert float(M.mlon_3d(2.5, theta, phi, env_mlt)) == phi
        np.testing.assert_allclose(
            float(dipole.mlon_tilted(theta, phi, 0.0, 0.5)), phi,
            rtol=0.0, atol=5e-15,
        )
    # geometry pin for a live tilt: the point the rotation carries
    # x-hat to has magnetic longitude 0, and the one y-hat goes to has
    # pi/2 (phi0 = 0 keeps the images in closed form)
    tilt = 0.3
    th_x, ph_x = np.pi / 2 - tilt, 0.0  # R x-hat = (cos t, 0, +sin t)
    np.testing.assert_allclose(
        float(dipole.mlon_tilted(th_x, ph_x, tilt, 0.0)), 0.0, atol=1e-14
    )
    np.testing.assert_allclose(
        float(dipole.mlon_tilted(np.pi / 2, np.pi / 2, tilt, 0.0)),
        np.pi / 2, rtol=1e-14,
    )


def test_tilted_plume_fused_general_matches_autodiff(env_mlt_tilted):
    """mu_grads_3d(FUSED) on a non-dipole medium routes to the general
    hybrid chain (ops/fused.py::mu_and_grads_3d_general): values and all
    7 partials must match the explicit-autodiff call to rounding, and
    d mu/d phi must carry BOTH asymmetry sources (tilted field + MLT
    density)."""
    from raytrace_tpu.ops import gradients as G

    rho = D.consistent_rho_3d(4.0, 1.0, 1.3, (1.0, 1.0, 0.1), 1200.0,
                              env_mlt_tilted)
    args = (4.0, 1.0, 1.3, *map(float, rho), 1200.0)
    mu_f, g_f = G.mu_grads_3d(*args, env_mlt_tilted, grad_mode=G.FUSED)
    mu_a, g_a = G.mu_grads_3d(*args, env_mlt_tilted, grad_mode=G.AUTODIFF)
    np.testing.assert_allclose(float(mu_f), float(mu_a), rtol=1e-12)
    for a, b in zip(g_f, g_a):
        np.testing.assert_allclose(
            float(a), float(b), rtol=1e-9, atol=1e-9 * abs(float(mu_a))
        )
    assert abs(float(g_f[2])) > 1e-3
    # and the reference chain (axial-dipole Kimura) refuses tilted media
    with pytest.raises(ValueError, match="reference"):
        G.mu_grads_3d(*args, env_mlt_tilted, grad_mode=G.REFERENCE)


@pytest.mark.parametrize("b_model", ["tilted", "igrf"])
@pytest.mark.parametrize("mlt", [False, True])
@pytest.mark.parametrize("ps_model", ["ca1992", "gcpm"])
def test_fused_general_matches_autodiff_grid(b_model, mlt, ps_model):
    """The general hybrid chain (forward-mode geometry jacobian + the
    hand-fused density/Stix core) equals autodiff of mu_3d over a random
    grid spanning all three CA1992 branches, for the tilted dipole and
    the IGRF-3 field, with and without the MLT-resolved plasmasphere,
    for BOTH plasmasphere models (the gcpm x mlt x non-dipole cell is
    the one no other parity test reaches: mlt_gcpm_params through the
    general chain's mlon tangent columns). Same tolerance form as
    test_fused_matches_autodiff_mlt."""
    env = M.make_env(b0=3.12e-5, b_model=b_model, b_tilt=0.2,
                     ps_mlt=mlt, ps_model=ps_model)
    A, B = _parity_grid(env, general=True)
    assert np.isfinite(B).all()
    assert np.isfinite(A).all()
    tol = 1e-9 * (np.abs(A) + np.max(np.abs(A), axis=0))
    bad = np.abs(A - B) > tol
    assert not bad.any(), (b_model, mlt, np.abs(A - B)[bad].max())
    # the phi-gradient is alive (tilted field alone already breaks
    # axisymmetry; the MLT density adds to it)
    assert np.abs(A[:, 3]).max() > 1e-4


def test_native_oracle_mu_parity_mlt_tilted(env_mlt_tilted):
    """THE magnetic-longitude convention pin: the oracle's mu_3d feeds
    its density mlon_of(theta, phi) exactly as the JAX path feeds
    mlon_3d (native/src/oracle.cpp mu_3d vs ops/dispersion.py::mu_3d),
    so mu agrees to machine precision over a wide grid of tilted+plume
    states spanning all three CA1992 branches. A geographic-phi oracle
    (the pre-r05 dead-code bug) shifts the knee by the mlon-phi offset
    and fails this at the 1e-3 level in the knee region."""
    from raytrace_tpu import native

    rng = np.random.default_rng(11)
    n = 512
    u = np.empty((n, 7))
    u[:, 0] = rng.uniform(1.2, 7.0, n)
    u[:, 1] = rng.uniform(0.4, 2.6, n)
    u[:, 2] = rng.uniform(-4.0, 7.0, n)
    k = rng.normal(size=(n, 3))
    u[:, 3:6] = 20.0 * k / np.linalg.norm(k, axis=1, keepdims=True)
    u[:, 6] = 0.0
    f = rng.uniform(500.0, 8000.0, n)
    mu_n = native.mu_3d_batch(u, f, env_mlt_tilted)
    mu_j = np.asarray(jax.vmap(
        lambda uu, ff: D.mu_3d(uu[0], uu[1], uu[2], uu[3], uu[4], uu[5],
                               ff, env_mlt_tilted)
    )(jnp.asarray(u), jnp.asarray(f)))
    np.testing.assert_allclose(mu_n, mu_j, rtol=1e-12)


def test_native_oracle_rhs_parity_mlt_tilted(env_mlt_tilted):
    """The magnetic-longitude convention pin: the C++ oracle feeds its
    density the SAME mlon_of(theta, phi) the JAX path uses
    (native/src/oracle.cpp mu_3d vs models/medium.py::mlon_3d), so the
    full RHS agrees through the tilted + plume composition. A
    geographic-phi oracle would diverge at the plume gradient."""
    from raytrace_tpu import native

    rng = np.random.default_rng(7)
    worst = 0.0
    for _ in range(12):
        r = rng.uniform(1.5, 6.5)
        th = rng.uniform(0.6, 2.2)
        ph = rng.uniform(-3.0, 5.0)
        fq = rng.uniform(600.0, 5000.0)
        rho = D.consistent_rho_3d(r, th, ph, (1.0, 1.0, 0.2), fq,
                                  env_mlt_tilted)
        u = np.array([r, th, ph, *map(float, rho), 0.0])
        du_n = native.rhs_3d(u, fq, env_mlt_tilted)
        du_j = np.asarray(RHS.rhs_3d(jnp.asarray(u), fq, env_mlt_tilted))
        rel = np.abs(du_n - du_j) / np.maximum(np.abs(du_j), 1e-10)
        worst = max(worst, float(rel.max()))
    assert worst < 5e-5, worst  # FD-accuracy floor of the oracle


def test_tilted_plume_trajectory_native_parity(env_mlt_tilted, env_mlt):
    """A dusk knee-crossing ray in the TILTED field: the composed medium
    genuinely moves the landing vs the centered-dipole plume, and the
    C++ oracle integrates the same trajectory end-to-end (independent-
    language parity for the ps_mlt x tilted composition).

    Tolerance note (measured, r05): this composed geometry makes the ray
    run OBLIQUELY along the hard plasmapause-knee kink (L crosses
    lppo/lppi slowly near t ~ 45-55 while both surfaces drift with
    mlon). On a kink the oracle's central differences see the MEAN of
    the one-sided slopes while autodiff takes the branch side, so the
    two RHS genuinely differ there -- an FD-step- and rtol-INDEPENDENT
    ~3e-5 landing offset (verified: scipy RK45 on an FD replica of the
    JAX mu reproduces the oracle landing to 1e-8 at h = 1e-7 AND 1e-8,
    while scipy on the autodiff RHS reproduces the JAX landing to
    1e-12; mu itself agrees to 5e-15 along the whole path). Both limits
    are valid solutions of the non-smooth ODE; the convention pin lives
    in test_native_oracle_mu_parity_mlt_tilted, so the trajectory row
    asserts at the measured kink-sliding floor."""
    from raytrace_tpu import native

    r0 = (RE + 1.0e6) / RE
    th0 = np.pi / 2 - 1.05
    dusk, _ = _dusk_dawn_phi(env_mlt_tilted)
    cfg = SolverConfig(rtol=1e-9, atol=1e-13, dt0=1e-4)
    spec = StopSpec(r_floor=1.0, t_max=5e9 / RE, lat_sign=-1.0,
                    lat_offset=np.pi / 2)

    def run(env):
        rho0 = D.consistent_rho_3d(r0, th0, dusk, (1.0, 1.0, 0.0), 1000.0,
                                   env)
        u0 = np.array([r0, th0, dusk, *map(float, rho0), 0.0])
        res = trace(lambda u, ff: RHS.rhs_3d(u, ff, env),
                    jnp.asarray([u0]), jnp.asarray([1000.0]), cfg=cfg,
                    spec=spec, max_steps=400000, group_idx=6)
        return u0, np.asarray(res.u[0]), int(res.status[0])

    u0_t, u_t, st_t = run(env_mlt_tilted)
    _, u_c, st_c = run(env_mlt)
    assert st_t == st_c == events.HIT_EARTH
    assert abs(u_t[1] - u_c[1]) > 1e-3  # the tilt moves the landing

    nat = native.trace_3d(u0_t, 1000.0, env_mlt_tilted, rtol=1e-9,
                          atol=1e-13, t_max=5e9 / RE, max_steps=400000)
    assert nat["status"] == events.HIT_EARTH
    np.testing.assert_allclose(nat["u"][1], u_t[1], atol=1e-4)
    np.testing.assert_allclose(nat["u"][2], u_t[2], atol=5e-4)
    np.testing.assert_allclose(nat["u"][6], u_t[6], rtol=2e-3)


def test_phis_launch_grid_plume_preset():
    """The phis launch axis (3D-only) fans the grid over longitude with
    the on-shell solve honoring each ray's own phi, and a tiny
    ensemble10k_plume retires cleanly through run() (the production
    entry points over the MLT-resolved medium)."""
    import collections

    from raytrace_tpu.config import RunConfig, preset
    from raytrace_tpu.run import _build_u0, run

    cfg = preset("ensemble10k_plume",
                 lats=(0.6, 0.9), phis=(-2.0, 0.0, 2.5),
                 chis=(-0.2, 0.2), freqs=(1000.0, 3000.0),
                 dtype="float64")
    u0, f = _build_u0(cfg, np.float64)
    assert len(u0) == 24
    assert sorted(set(u0[:, 2])) == [-2.0, 0.0, 2.5]
    env = cfg.medium.build()
    for i in range(len(u0)):
        rho = u0[i, 3:6]
        mu = float(D.mu_3d(*u0[i, :3], *rho, f[i], env))
        assert abs(np.linalg.norm(rho) - mu) < 1e-8 * mu, (i, mu)
    out = run(cfg)
    st = np.asarray(out["result"].status)[np.asarray(out["valid"])]
    assert collections.Counter(st.tolist()) == {int(events.HIT_EARTH): 24}
    # phis survives the JSON round-trip
    back = RunConfig.from_json(cfg.to_json())
    assert tuple(back.phis) == tuple(cfg.phis)


def test_phis_rejected_in_2d_frames():
    from raytrace_tpu.config import preset
    from raytrace_tpu.run import _build_u0

    cfg = preset("lat_fan", phis=(0.0, 1.0))
    with pytest.raises(ValueError, match="phis"):
        _build_u0(cfg, np.float64)


def test_cast_env_and_config_roundtrip(env_mlt):
    """The MLT fields survive the float32 device cast (coeff tuple ->
    traced array) and the RunConfig JSON round-trip."""
    from raytrace_tpu.config import MediumConfig, RunConfig

    env32 = M.cast_env(env_mlt, jnp.float32)
    ne64 = float(M.ne_total_m3(4.5, 0.2, env_mlt, phi=2.0))
    ne32 = float(M.ne_total_m3(
        jnp.float32(4.5), jnp.float32(0.2), env32, phi=jnp.float32(2.0)))
    np.testing.assert_allclose(ne32, ne64, rtol=1e-5)

    cfg = RunConfig(name="m", frame="3d",
                    medium=MediumConfig(ps_mlt=True, ps_mlt_tamp=900.0))
    back = RunConfig.from_json(cfg.to_json())
    assert back.medium.ps_mlt is True
    env2 = back.medium.build()
    assert float(env2.ps_mlt_tamp) == 900.0
    assert len(env2.ps_mlt_c) == 7


# ---- ps_mlt x GCPM (the second plasmasphere model, r05) --------------


@pytest.fixture(scope="module")
def env_gcpm_mlt():
    return M.make_env(b0=3.12e-5, ps_mlt=True, ps_model="gcpm")


@pytest.fixture(scope="module")
def env_gcpm_axi():
    return M.make_env(b0=3.12e-5, ps_model="gcpm")


def test_gcpm_mlt_phi0_reduction_and_dusk_knee(env_gcpm_mlt, env_gcpm_axi):
    """phi = 0 reproduces the axisymmetric GCPM medium (S(a0) == 1 and
    the trough modulation vanishes by construction), and the knee
    center bulges at dusk by the same derived-LCE factor as the CA1992
    plasmapause (it rides the identical Fourier shape)."""
    lppo0, tr0 = M.mlt_gcpm_params(0.0, env_gcpm_mlt)
    np.testing.assert_allclose(float(lppo0), env_gcpm_axi.lppo, rtol=1e-14)
    np.testing.assert_allclose(float(tr0), env_gcpm_axi.ps_trough,
                               rtol=1e-14)
    for r, lat in ((1.5, 0.3), (3.0, 0.6), (4.3, 0.0), (6.5, 0.9)):
        np.testing.assert_allclose(
            float(M.ne_total_m3(r, lat, env_gcpm_mlt, phi=0.0)),
            float(M.ne_total_m3(r, lat, env_gcpm_axi)), rtol=1e-12,
        )
    dusk, dawn = _dusk_dawn_phi(env_gcpm_mlt)
    k_dusk = float(M.mlt_gcpm_params(dusk, env_gcpm_mlt)[0])
    k_dawn = float(M.mlt_gcpm_params(dawn, env_gcpm_mlt)[0])
    assert 1.4 < k_dusk / k_dawn < 1.8
    # the knee really moves the density: at a shell between the dawn and
    # dusk knees, dusk sees plasmasphere-level density, dawn trough-level
    Lmid = 0.5 * (k_dusk + k_dawn)
    ne_dusk = float(M.ne_total_m3(Lmid, 0.0, env_gcpm_mlt, phi=dusk))
    ne_dawn = float(M.ne_total_m3(Lmid, 0.0, env_gcpm_mlt, phi=dawn))
    assert ne_dusk / ne_dawn > 3.0


def test_gcpm_mlt_native_oracle_rhs_parity(env_gcpm_mlt):
    """Independent-language check through the GCPM + MLT chain (the C++
    oracle's mlt_gcpm vs models/medium.py::mlt_gcpm_params)."""
    from raytrace_tpu import native

    rng = np.random.default_rng(5)
    worst = 0.0
    for _ in range(12):
        r = rng.uniform(1.5, 6.5)
        th = rng.uniform(0.6, 2.2)
        ph = rng.uniform(-3.0, 5.0)
        fq = rng.uniform(600.0, 5000.0)
        rho = D.consistent_rho_3d(r, th, ph, (1.0, 1.0, 0.2), fq,
                                  env_gcpm_mlt)
        u = np.array([r, th, ph, *map(float, rho), 0.0])
        du_n = native.rhs_3d(u, fq, env_gcpm_mlt)
        du_j = np.asarray(RHS.rhs_3d(jnp.asarray(u), fq, env_gcpm_mlt))
        rel = np.abs(du_n - du_j) / np.maximum(np.abs(du_j), 1e-10)
        worst = max(worst, float(rel.max()))
    assert worst < 5e-5, worst


def test_gcpm_mlt_trajectory_native_parity(env_gcpm_mlt, env_gcpm_axi):
    """A dusk knee-crossing ray through the MLT-resolved GCPM medium:
    the plume moves the landing vs the axisymmetric control, and the
    C++ oracle lands the SAME trajectory TIGHTLY -- the GCPM knee is
    C-infinity, so there is no kink surface to ride and the
    FD-vs-autodiff split that sets the CA1992 parity floor
    (test_tilted_plume_trajectory_native_parity) does not appear."""
    from raytrace_tpu import native

    r0 = (RE + 1.0e6) / RE
    th0 = np.pi / 2 - 1.05
    dusk, _ = _dusk_dawn_phi(env_gcpm_mlt)
    cfg = SolverConfig(rtol=1e-9, atol=1e-13, dt0=1e-4)
    spec = StopSpec(r_floor=1.0, t_max=5e9 / RE, lat_sign=-1.0,
                    lat_offset=np.pi / 2)

    def run_one(env):
        rho0 = D.consistent_rho_3d(r0, th0, dusk, (1.0, 1.0, 0.0), 1000.0,
                                   env)
        u0 = np.array([r0, th0, dusk, *map(float, rho0), 0.0])
        res = trace(lambda u, ff: RHS.rhs_3d(u, ff, env),
                    jnp.asarray([u0]), jnp.asarray([1000.0]), cfg=cfg,
                    spec=spec, max_steps=400000, group_idx=6)
        return u0, np.asarray(res.u[0]), int(res.status[0])

    u0_m, u_m, st_m = run_one(env_gcpm_mlt)
    _, u_c, st_c = run_one(env_gcpm_axi)
    assert st_m == st_c == events.HIT_EARTH
    assert abs(u_m[1] - u_c[1]) > 1e-3  # the plume moves the landing

    nat = native.trace_3d(u0_m, 1000.0, env_gcpm_mlt, rtol=1e-9,
                          atol=1e-13, t_max=5e9 / RE, max_steps=400000)
    assert nat["status"] == events.HIT_EARTH
    np.testing.assert_allclose(nat["u"][1], u_m[1], atol=5e-7)
    np.testing.assert_allclose(nat["u"][6], u_m[6], rtol=1e-5)
