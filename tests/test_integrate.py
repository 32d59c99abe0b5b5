"""Integrator tests: convergence on known ODEs, event localization, status
machinery, and the end-to-end 2D whistler trace (SURVEY.md section 4d)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
from raytrace_tpu.integrate.steppers import dopri5_step, rk4_step
from raytrace_tpu.models import medium
from raytrace_tpu.ops import rhs

R0 = (RE + 1.0e6) / RE


def _oscillator(u, f):
    # u = (x, v, pad, T); x'' = -x, plus a trivial T' = 1 channel
    return jnp.stack([u[1], -u[0], jnp.zeros_like(u[0]), jnp.ones_like(u[0])])


def test_rk4_order():
    """Halving dt reduces global error ~16x on the harmonic oscillator."""
    errs = []
    for n in (100, 200):
        dt = float(2.0 * np.pi / n)
        u = jnp.array([1.0, 0.0, 0.0, 0.0])
        k1 = _oscillator(u, 0.0)
        for _ in range(n):
            out = rk4_step(lambda x: _oscillator(x, 0.0), u, k1, dt)
            u, k1 = out.u_new, out.k_end
        errs.append(abs(float(u[0]) - 1.0))
    # at least 4th-order convergence (the symmetric full-period oscillator
    # superconverges to ~2^5 here)
    assert errs[0] / errs[1] > 12.0


def test_dopri5_error_estimate_scales():
    u = jnp.array([1.0, 0.0, 0.0, 0.0])
    k1 = _oscillator(u, 0.0)
    out_big = dopri5_step(lambda x: _oscillator(x, 0.0), u, k1, 0.2, 1e-7, 1e-12)
    out_small = dopri5_step(lambda x: _oscillator(x, 0.0), u, k1, 0.1, 1e-7, 1e-12)
    assert float(out_big.err) > float(out_small.err)
    # 5th-order local error: dt/2 => ~2^5 smaller estimate
    assert float(out_big.err) / float(out_small.err) == pytest.approx(32.0, rel=0.5)


def test_adaptive_oscillator_accuracy():
    """Full adaptive driver on x'' = -x over 4 periods hits rtol-level error."""
    u0 = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    f = jnp.array([0.0])
    res = trace(
        _oscillator, u0, f,
        cfg=SolverConfig(rtol=1e-7, atol=1e-10, dt0=1e-2, dt_max=1.0),
        spec=StopSpec(r_floor=-2.0, t_max=8.0 * np.pi),
        max_steps=4000,
    )
    assert int(res.status[0]) == events.MAX_PHASE_TIME
    assert float(res.t[0]) == pytest.approx(8.0 * np.pi, rel=1e-9)
    assert float(res.u[0, 0]) == pytest.approx(1.0, abs=1e-5)
    assert float(res.u[0, 1]) == pytest.approx(0.0, abs=1e-5)


def test_event_localization_linear_decay():
    """dr/dt = -1 from r = 2: crossing of r_floor=1 is localized at t = 1."""
    def decay(u, f):
        return jnp.stack(
            [-jnp.ones_like(u[0]), jnp.zeros_like(u[0]),
             jnp.zeros_like(u[0]), jnp.zeros_like(u[0])]
        )

    u0 = jnp.array([[2.0, 0.5, 0.0, 0.0]])
    f = jnp.array([0.0])
    res = trace(
        decay, u0, f,
        cfg=SolverConfig(dt0=0.3, dt_max=0.3),
        spec=StopSpec(r_floor=1.0, t_max=10.0),
        adaptive=False,
        max_steps=100,
    )
    assert int(res.status[0]) == events.HIT_EARTH
    assert float(res.t[0]) == pytest.approx(1.0, abs=1e-9)
    assert float(res.u[0, 0]) == pytest.approx(1.0, abs=1e-9)


def test_equator_stop():
    """lat decreasing through 0 triggers HIT_EQUATOR with refinement."""
    def southward(u, f):
        return jnp.stack(
            [jnp.zeros_like(u[0]), -jnp.ones_like(u[0]),
             jnp.zeros_like(u[0]), jnp.zeros_like(u[0])]
        )

    u0 = jnp.array([[2.0, 0.35, 0.0, 0.0]])
    f = jnp.array([0.0])
    res = trace(
        southward, u0, f,
        cfg=SolverConfig(dt0=0.1, dt_max=0.1),
        spec=StopSpec(r_floor=1.0, t_max=10.0, stop_at_equator=1.0),
        adaptive=False,
        max_steps=100,
    )
    assert int(res.status[0]) == events.HIT_EQUATOR
    assert float(res.u[0, 1]) == pytest.approx(0.0, abs=1e-9)
    assert float(res.t[0]) == pytest.approx(0.35, abs=1e-9)


def test_whistler_2d_end_to_end():
    """Canonical RayTrace_lat config: r0 = RE + 1000 km, lat 45 deg, chi = 0,
    f = 1000 Hz (RayTrace_lat.jl:333). The whistler must propagate, stay
    above the surface initially, accumulate group delay, and terminate
    (surface hit or budget) without NaNs."""
    env = medium.make_env_lat()
    u0 = jnp.array([[R0, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env),
        u0, f,
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE),
        max_steps=20000,
    )
    status = int(res.status[0])
    assert status in (events.HIT_EARTH, events.MAX_PHASE_TIME)
    assert bool(jnp.all(jnp.isfinite(res.u)))
    assert float(res.u[0, 3]) > 0.0  # group delay advanced
    assert int(res.n_accept[0]) > 10


def test_batch_isolation():
    """A ray driven to invalid state must not corrupt its neighbors."""
    def mixed(u, f):
        # ray with u[1] > 10 diverges to NaN via 1/(u[0]-u[0])
        bad = u[1] > 10.0
        dr = jnp.where(bad, jnp.nan, -0.1)
        return jnp.stack(
            [jnp.full_like(u[0], dr), jnp.zeros_like(u[0]),
             jnp.zeros_like(u[0]), jnp.zeros_like(u[0])]
        )

    u0 = jnp.array([[2.0, 0.5, 0.0, 0.0], [2.0, 20.0, 0.0, 0.0]])
    f = jnp.zeros((2,))
    res = trace(
        mixed, u0, f,
        cfg=SolverConfig(dt0=0.5, dt_max=0.5),
        spec=StopSpec(r_floor=1.0, t_max=100.0),
        adaptive=False,
        max_steps=64,
    )
    assert int(res.status[1]) == events.INVALID
    assert int(res.status[0]) == events.HIT_EARTH
    assert bool(jnp.all(jnp.isfinite(res.u[0])))


def test_trajectory_mode_snapshots():
    env = medium.make_env_lat()
    u0 = jnp.array([[R0, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env),
        u0, f,
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE),
        max_steps=512,
        save_every=32,
    )
    assert res.traj is not None
    assert res.traj["u"].shape == (16, 1, 4)
    # snapshot times are non-decreasing
    ts = np.asarray(res.traj["t"][:, 0])
    assert np.all(np.diff(ts) >= 0)


def test_bs3_order_three_and_whistler_parity():
    """Bogacki-Shampine 3(2): third-order convergence on a smooth ODE and
    landing parity with DP5 on the canonical whistler ray."""
    import jax

    from raytrace_tpu.integrate.steppers import bs3_step

    # fixed-step convergence on u' = -u + sin(t) (smooth, nonstiff):
    # global error ~ h^3 -> halving h cuts it ~8x
    def f_aug(u):
        # autonomous augmentation: u = (y, t)
        return jnp.array([-u[0] + jnp.sin(u[1]), 1.0])

    def integrate(h, n):
        u = jnp.array([1.0, 0.0])
        for _ in range(n):
            out = bs3_step(f_aug, u, f_aug(u), h, 1.0, 1.0)
            u = out.u_new
        return u[0]

    # exact solution of y' = -y + sin t, y(0)=1:
    # y = (sin t - cos t)/2 + 1.5 e^-t
    t_end = 1.0
    exact = (np.sin(t_end) - np.cos(t_end)) / 2 + 1.5 * np.exp(-t_end)
    e1 = abs(float(integrate(1.0 / 16, 16)) - exact)
    e2 = abs(float(integrate(1.0 / 32, 32)) - exact)
    ratio = e1 / e2
    assert 5.0 < ratio < 12.0, ratio  # ~8 for order 3

    # whistler landing parity vs DP5 at the same tolerance
    env = medium.make_env_lat()
    u0 = jnp.array([[R0, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])
    kw = dict(
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e9 / RE), max_steps=8192,
    )
    rhs_fn = lambda u, ff: rhs.rhs_2d_lat(u, ff, env)  # noqa: E731
    res_bs = trace(rhs_fn, u0, f, stepper="bs3", **kw)
    res_dp = trace(rhs_fn, u0, f, stepper="dopri5", **kw)
    assert int(res_bs.status[0]) == int(res_dp.status[0]) == events.HIT_EARTH
    # full-landing comparison: the canonical ray's landing LATITUDE
    # amplifies integrator tolerance ~7e3x (sensitivity.py's measured
    # Jacobian), so independent methods at rtol 1e-6 legitimately land
    # ~0.02 rad apart; the landing L-shell (the physical observable the
    # accuracy target is stated in) agrees to ~2e-3
    ub, ud = np.asarray(res_bs.u)[0], np.asarray(res_dp.u)[0]
    l_bs = ub[0] / np.cos(ub[1]) ** 2
    l_dp = ud[0] / np.cos(ud[1]) ** 2
    np.testing.assert_allclose(l_bs, l_dp, rtol=1e-2)
    assert abs(ub[1] - ud[1]) < 0.05
    # group delay is a path integral (not event-amplified): tight
    np.testing.assert_allclose(ub[3], ud[3], rtol=5e-3)
    # the canonical ray rides dt_max (mean accepted dt ~ 0.95 dt_max for
    # DP5 at this tolerance), so the order-3 pair needs only slightly
    # more steps at HALF the stage cost per attempt -- the measured basis
    # for the bs3 headline experiment (benchmarks/perf_r03.py)
    n_bs, n_dp = int(res_bs.n_accept[0]), int(res_dp.n_accept[0])
    assert n_bs < 1.5 * n_dp, (n_bs, n_dp)


def test_heun2_order_two_and_whistler_parity():
    """Heun 2(1): second-order convergence on a smooth ODE and landing
    parity with BS3 on the canonical whistler ray (the cheapest rung of
    the stage-cost ladder, benchmarks/perf_r03e.py)."""
    from raytrace_tpu.integrate.steppers import heun21_step

    def f_aug(u):
        return jnp.array([-u[0] + jnp.sin(u[1]), 1.0])

    def integrate(h, n):
        u = jnp.array([1.0, 0.0])
        for _ in range(n):
            out = heun21_step(f_aug, u, f_aug(u), h, 1.0, 1.0)
            u = out.u_new
        return u[0]

    t_end = 1.0
    exact = (np.sin(t_end) - np.cos(t_end)) / 2 + 1.5 * np.exp(-t_end)
    e1 = abs(float(integrate(1.0 / 16, 16)) - exact)
    e2 = abs(float(integrate(1.0 / 32, 32)) - exact)
    ratio = e1 / e2
    assert 3.0 < ratio < 6.0, ratio  # ~4 for order 2

    # the FSAL k_end must be the RHS at the accepted state (next k1)
    u = jnp.array([1.0, 0.0])
    out = heun21_step(f_aug, u, f_aug(u), 0.1, 1.0, 1.0)
    np.testing.assert_allclose(
        np.asarray(out.k_end), np.asarray(f_aug(out.u_new)), rtol=1e-6
    )

    # whistler landing parity vs BS3 at the same tolerance
    env = medium.make_env_lat()
    u0 = jnp.array([[R0, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])
    kw = dict(
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e9 / RE), max_steps=16384,
    )
    rhs_fn = lambda u, ff: rhs.rhs_2d_lat(u, ff, env)  # noqa: E731
    res_h = trace(rhs_fn, u0, f, stepper="heun2", **kw)
    res_bs = trace(rhs_fn, u0, f, stepper="bs3", **kw)
    assert int(res_h.status[0]) == int(res_bs.status[0]) == events.HIT_EARTH
    uh, ub = np.asarray(res_h.u)[0], np.asarray(res_bs.u)[0]
    l_h = uh[0] / np.cos(uh[1]) ** 2
    l_b = ub[0] / np.cos(ub[1]) ** 2
    np.testing.assert_allclose(l_h, l_b, rtol=1e-2)
    np.testing.assert_allclose(uh[3], ub[3], rtol=5e-3)


def test_arc_length_ceiling_binds_exactly():
    """SolverConfig.ds_max: on a constant-velocity ODE (error == 0, every
    step accepted, dt grows to whatever ceiling binds), the accepted step
    size must land exactly on ds_max / (ds/dtau) = ds_max / |dr/dtau|."""
    a = 0.25

    def const_rhs(u, f):
        return jnp.array([a, 0.0, 0.0, 1.0])

    ds_max = 0.01
    u0 = jnp.array([[2.0, 0.3, 0.0, 0.0]])
    f = jnp.array([0.0])
    res = trace(
        const_rhs, u0, f,
        cfg=SolverConfig(rtol=1e-6, atol=1e-9, dt0=1e-4,
                         dt_max=1e9, ds_max=ds_max),
        spec=StopSpec(r_floor=0.0, t_max=1.0), max_steps=4000,
    )
    assert int(res.status[0]) == events.MAX_PHASE_TIME
    # cap = ds_max / a; dt0 = 1e-4 then 5x growth to the cap in ~2 steps
    n = int(res.n_accept[0])
    expect_n = 1.0 / (ds_max / a)
    assert expect_n <= n <= expect_n + 6, (n, expect_n)
    assert int(res.n_reject[0]) == 0


def test_arc_length_ceiling_whistler_parity():
    """Running the canonical whistler ray on the arc-length ceiling alone
    (dt_max effectively off) reproduces the phase-ceiling landing and --
    since mu > 1 along the whole path, so the phase ceiling over-resolves
    space -- needs FEWER steps at an equivalent spatial resolution."""
    env = medium.make_env_lat()
    u0 = jnp.array([[R0, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])
    kw = dict(spec=StopSpec(r_floor=1.0, t_max=5e9 / RE), max_steps=40000)
    rhs_fn = lambda u, ff: rhs.rhs_2d_lat(u, ff, env)  # noqa: E731
    res_ph = trace(
        rhs_fn, u0, f,
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4), **kw,
    )
    res_arc = trace(
        rhs_fn, u0, f,
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4,
                         dt_max=1e9, ds_max=1e6 / RE), **kw,
    )
    assert int(res_ph.status[0]) == int(res_arc.status[0]) == events.HIT_EARTH
    up, ua = np.asarray(res_ph.u)[0], np.asarray(res_arc.u)[0]
    np.testing.assert_allclose(ua[1], up[1], atol=2e-3)   # landing lat (rad)
    np.testing.assert_allclose(ua[3], up[3], rtol=1e-3)   # group delay
    assert int(res_arc.n_accept[0]) < int(res_ph.n_accept[0])


def test_local_arc_ceiling_profile():
    """_local_arc_ceiling: tight (frac * w) on the plasmapause shell
    itself, opening to frac * r/4.5 far from it, and the knee-shell
    distance follows the ray's own latitude through the lat_sign/
    lat_offset frame map (r = L cos^2 mlat)."""
    from raytrace_tpu.integrate.solve import _local_arc_ceiling

    cfg = SolverConfig(ds_local_knee=4.4, ds_local_frac=0.5, ds_local_w=0.1)
    spec_lat = StopSpec()
    # on the shell at mlat = 0.3: r = 4.4 cos^2(0.3)
    r_shell = 4.4 * np.cos(0.3) ** 2
    u = jnp.array([r_shell, 0.3, 0.0, 0.0])
    np.testing.assert_allclose(
        float(_local_arc_ceiling(u, spec_lat, cfg)), 0.5 * 0.1, rtol=1e-12)
    # far inside the shell the smooth r/4.5 scale binds
    u_in = jnp.array([2.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(
        float(_local_arc_ceiling(u_in, spec_lat, cfg)), 0.5 * 2.0 / 4.5,
        rtol=1e-12)
    # colatitude frame maps through lat = pi/2 - theta
    spec_co = StopSpec(lat_sign=-1.0, lat_offset=np.pi / 2)
    u_co = jnp.array([r_shell, np.pi / 2 - 0.3, 0.0, 0.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(
        float(_local_arc_ceiling(u_co, spec_co, cfg)), 0.5 * 0.1, rtol=1e-12)
    # extra sharp shells (a duct at L = 3, width 0.05) tighten the same way
    cfg_d = cfg._replace(ds_local_shells=((3.0, 0.05),))
    u_duct = jnp.array([3.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(
        float(_local_arc_ceiling(u_duct, spec_lat, cfg_d)), 0.5 * 0.05,
        rtol=1e-12)
    # away from every shell the duct shell does not bind
    np.testing.assert_allclose(
        float(_local_arc_ceiling(u_in, spec_lat, cfg_d)), 0.5 * 2.0 / 4.5,
        rtol=1e-12)


def test_local_arc_ceiling_duct_from_config():
    """RunConfig.solver() anchors the local ceiling to the medium's own
    shells: the pre-solved plasmapause lppo, plus the duct shell when the
    medium carries one."""
    from raytrace_tpu.config import MediumConfig, RunConfig

    cfg = RunConfig(name="t", ds_local=True,
                    medium=MediumConfig(duct_amp=0.5, duct_l0=3.0,
                                        duct_w=0.1))
    s = cfg.solver()
    assert 2.0 < s.ds_local_knee < 7.0
    assert s.ds_local_shells == ((3.0, 0.1),)
    # no duct -> no extra shell; ds_local off -> ceiling disabled
    s2 = RunConfig(name="t", ds_local=True, medium=MediumConfig()).solver()
    assert s2.ds_local_shells == ()
    s3 = RunConfig(name="t", medium=MediumConfig()).solver()
    assert s3.ds_local_knee == 0.0


def test_local_arc_ceiling_whistler():
    """The LOCAL arc ceiling (knee-anchored gradient-length profile,
    SolverConfig.ds_local_knee) reproduces the canonical landing against
    a tight-tolerance truth run -- measured here it lands CLOSER to truth
    than the knee-sized global ds_max = 0.1 control (5.7e-4 vs 3.2e-3
    rad) -- at no more steps than that control, despite taking up-to-6x
    larger steps over the smooth plasmasphere. (At rtol 1e-7 the error
    estimator, not the ceiling, binds the step count for a single ray;
    the ensemble-scale step win at the production rtol 1e-5 is the chip
    benchmark's to measure.)"""
    env = medium.make_env_lat()
    u0 = jnp.array([[R0, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])
    kw = dict(spec=StopSpec(r_floor=1.0, t_max=5e9 / RE), max_steps=40000)
    rhs_fn = lambda u, ff: rhs.rhs_2d_lat(u, ff, env)  # noqa: E731
    base = dict(rtol=1e-7, atol=1e-12, dt0=1e-4, dt_max=1e9)
    res_truth = trace(
        rhs_fn, u0, f,
        cfg=SolverConfig(rtol=1e-9, atol=1e-13, dt0=1e-4), **kw)
    res_glob = trace(
        rhs_fn, u0, f, cfg=SolverConfig(ds_max=0.1, **base), **kw)
    res_loc = trace(
        rhs_fn, u0, f,
        cfg=SolverConfig(ds_local_knee=float(env.lppo), ds_local_w=0.1,
                         **base), **kw)
    assert (int(res_truth.status[0]) == int(res_glob.status[0])
            == int(res_loc.status[0]) == events.HIT_EARTH)
    ut, ul = np.asarray(res_truth.u)[0], np.asarray(res_loc.u)[0]
    np.testing.assert_allclose(ul[1], ut[1], atol=2e-3)   # landing lat (rad)
    np.testing.assert_allclose(ul[3], ut[3], rtol=1e-3)   # group delay
    assert int(res_loc.n_accept[0]) <= int(res_glob.n_accept[0]) + 8
    # and a global ds_max clamp composes with the local profile (outer
    # bound semantics): step count returns to the ds_max=0.1 control's
    res_both = trace(
        rhs_fn, u0, f,
        cfg=SolverConfig(ds_local_knee=float(env.lppo), ds_local_w=0.1,
                         ds_max=0.1, **base), **kw)
    assert int(res_both.status[0]) == events.HIT_EARTH
    assert int(res_both.n_accept[0]) >= int(res_glob.n_accept[0]) - 6


def test_heun2_rejects_nonfinite_endpoint():
    """heun2's embedded estimate excludes the end-derivative, so a step
    whose ENDPOINT lands past a singularity (k_end non-finite, predictor
    still fine) must be forced to reject -- otherwise the poisoned FSAL
    carry would freeze the ray (bs3/dopri5 reject naturally because
    their err includes f(u_new) with nonzero weight)."""
    from raytrace_tpu.integrate.steppers import heun21_step

    thresh = 1.1

    def f(u):
        vec = jnp.array([u[0], 0.0, 0.0, 0.0])
        return jnp.where(u[0] > thresh, jnp.nan, vec)

    u = jnp.array([0.9, 0.0, 0.0, 0.0])
    k1 = f(u)
    assert bool(jnp.all(jnp.isfinite(k1)))
    # dt = 0.21: predictor 1.089 < thresh (k2 finite), trapezoid endpoint
    # 1.1088 > thresh (k_end NaN)
    out = heun21_step(f, u, k1, 0.21, 1.0, 1.0)
    assert not bool(jnp.all(jnp.isfinite(out.k_end)))
    assert bool(jnp.isinf(out.err))          # forced rejection
    # a shorter step with a finite endpoint keeps a finite estimate
    out2 = heun21_step(f, u, k1, 0.1, 1.0, 1.0)
    assert bool(jnp.all(jnp.isfinite(out2.k_end)))
    assert bool(jnp.isfinite(out2.err))


def test_arc_length_ceiling_3d_frame():
    """The arc-rate includes the azimuthal metric term on the 7-state
    frame (r sin(theta) dphi/dtau); the canonical 3D ray on the arc
    ceiling alone must reproduce the phase-ceiling terminal status and
    group delay with fewer accepted steps (mu > 1 along the path)."""
    from raytrace_tpu.models import make_env
    from raytrace_tpu.ops.dispersion import consistent_rho_3d

    env = make_env(b0=3.12e-5)
    r0, th0, ph0 = (RE + 1e6) / RE, np.pi / 4, 0.0
    rho = consistent_rho_3d(r0, th0, ph0, (1.0, 1.0, 0.0), 1000.0, env)
    u0 = jnp.array([[r0, th0, ph0, *map(float, rho), 0.0]])
    kw = dict(
        spec=StopSpec(r_floor=1.0, t_max=3e8 / RE, lat_sign=-1.0,
                      lat_offset=np.pi / 2),
        group_idx=6, max_steps=20000,
    )
    rhs_fn = lambda u, ff: rhs.rhs_3d(u, ff, env)  # noqa: E731
    res_ph = trace(rhs_fn, u0, jnp.array([1000.0]),
                   cfg=SolverConfig(rtol=1e-7, atol=1e-11, dt0=1e-4), **kw)
    res_arc = trace(rhs_fn, u0, jnp.array([1000.0]),
                    cfg=SolverConfig(rtol=1e-7, atol=1e-11, dt0=1e-4,
                                     dt_max=1e9, ds_max=1e6 / RE), **kw)
    assert int(res_arc.status[0]) == int(res_ph.status[0])
    np.testing.assert_allclose(
        float(res_arc.u[0, 6]), float(res_ph.u[0, 6]), rtol=1e-3
    )
    assert int(res_arc.n_accept[0]) < int(res_ph.n_accept[0])
