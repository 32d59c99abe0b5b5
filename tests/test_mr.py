"""Magnetospheric reflection: unducted whistlers mirror at the LHR.

The classic non-ducted whistler behavior (Kimura 1966; the Bortnik
thesis lineage the reference's 3D script cites at RayTrace_3D.jl:5):
where the wave frequency drops to the local lower-hybrid resonance
frequency the refractive-index surface closes and the ray REFLECTS
instead of precipitating. The reference never demonstrates it; here it
emerges from the framework's own traced dispersion (the proton term of
stix_rlp), and `analysis.f_lhr` computes the mirror surface from the
same Stix coefficients the tracer integrates.
"""

import jax.numpy as jnp
import numpy as np

from raytrace_tpu import analysis
from raytrace_tpu.constants import FCE_E, FCE_P, RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
from raytrace_tpu.models import make_env_lat
from raytrace_tpu.models import medium as M
from raytrace_tpu.ops import rhs
from raytrace_tpu.ops.dispersion import stix_rlp


def test_f_lhr_is_the_s_zero_root():
    """f_lhr solves S = 0 of the framework's own Stix coefficients, at
    plasmasphere and trough points, proton-only and multi-ion."""
    env = make_env_lat()
    for (r, lat) in ((1.5, 0.2), (2.5, 0.5), (4.0, 0.0), (5.5, 0.3)):
        fl = float(analysis.f_lhr(r, lat, env))
        ne = float(M.ne_total_m3(r, lat, env))
        bm = float(M.b_mag(r, lat, env))
        rr, ll, _ = stix_rlp(ne, bm, fl)
        s = 0.5 * (rr + ll)
        # S sweeps orders of magnitude through the root; normalize by a
        # 1%-offset finite difference of S itself
        rr2, ll2, _ = stix_rlp(ne, bm, 1.01 * fl)
        ds = abs(0.5 * (rr2 + ll2) - s)
        assert abs(s) < 1e-6 * max(ds, 1.0), (r, lat, s, ds)
        assert fl > 1.5 * FCE_P * bm


def test_f_lhr_dense_limit_and_multiion_shift():
    """Inner-plasmasphere (fpe >> fce) proton-only f_LHR approaches the
    textbook sqrt(fce fcp); heavy-ion admixture lowers it."""
    env = make_env_lat()
    r, lat = 1.8, 0.1
    bm = float(M.b_mag(r, lat, env))
    fl = float(analysis.f_lhr(r, lat, env))
    f_dense = np.sqrt(FCE_E * bm * FCE_P * bm)
    assert abs(fl / f_dense - 1.0) < 0.05, (fl, f_dense)

    from raytrace_tpu.models import make_env

    env_o = make_env(b0=env.b0, eta_o=0.3)
    fl_o = float(analysis.f_lhr(r, lat, env_o))
    assert fl_o < fl
    assert fl_o > 1.5 * FCE_P * bm


def test_unducted_whistler_magnetospherically_reflects():
    """A 1 kHz unducted whistler launched at 53.6 deg latitude bounces
    between hemispheres, and at least one high-altitude turning point
    sits ON the f = f_LHR surface (within 15%) -- none of which the
    launch configuration encodes; the mirror emerges from the traced
    dispersion."""
    env = make_env_lat()
    f = 1000.0
    u0 = np.array([[(RE + 1.0e6) / RE, np.pi / 4 + 0.15, 0.0, 0.0]])
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env),
        jnp.asarray(u0), jnp.asarray([f]),
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4, dt_max=1e6 / RE),
        spec=StopSpec(r_floor=1.0, t_max=6e10 / RE, group_time_max=20.0),
        max_steps=120000, save_every=20,
    )
    tu = np.asarray(res.traj["u"])[:, 0]
    n_rev, idx = analysis.count_lat_reversals(tu, r_min=1.5)
    assert n_rev >= 3, n_rev
    # the ray crosses hemispheres (a bounce, not a local wiggle)
    lats = tu[:, 1]
    assert lats.max() > 0.7 and lats.min() < -0.7
    # at least one turning point is an LHR mirror
    fl = np.array([float(analysis.f_lhr(tu[i, 0], tu[i, 1], env))
                   for i in idx])
    rel = np.abs(fl - f) / f
    assert rel.min() < 0.15, (fl, rel)


def test_mr_landau_damping_isotropic_pure_loss():
    """The MR energy budget (examples/mr_damping.py at CI scale): along
    a multi-bounce MR path, the fully oblique kinetic rate with an
    ISOTROPIC hot population is damping-only (A = 0 has no free energy:
    gamma <= 0 up to quadrature noise), the cumulative gain is
    monotonically non-increasing, and the loss is dominated by the
    oblique post-mirror segments (the quasi-parallel first hop loses
    almost nothing)."""
    from raytrace_tpu import growth

    env = make_env_lat()
    f = 700.0
    u0 = np.array([[2.5, 0.25, -0.6, 0.0]])
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env),
        jnp.asarray(u0), jnp.asarray([f]),
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4, dt_max=1e6 / RE),
        spec=StopSpec(r_floor=1.0, t_max=6e10 / RE, group_time_max=3.0),
        max_steps=120000, save_every=100,
    )
    tu = np.asarray(res.traj["u"])[:, 0]
    m = int((tu[:, 0] > 1.0005).sum())
    hot = growth.HotElectrons(eta=1e-3, t_par_ev=1e3, anisotropy=0.0)
    pg = growth.path_gain(tu[:m], f, env, hot, frame="2d_lat",
                          kinetics="oblique")
    gam, gdb = pg["gamma"], pg["gain_db"]
    assert np.isfinite(gam).all()
    assert gam.max() <= 1e-6 * abs(gam.min()), gam.max()
    assert (np.diff(gdb) <= 1e-9).all()
    assert gdb[-1] < -1.0, gdb[-1]          # real absorption happened
    # first-hop (pre-first-mirror) loss is a small fraction of the total
    n_rev, idx = analysis.count_lat_reversals(tu[:m], r_min=1.5)
    assert n_rev >= 2
    first = gdb[idx[0]]
    assert abs(first) < 0.25 * abs(gdb[-1]), (first, gdb[-1])


def test_mr_fan_preset_retires_cleanly():
    """The mr_fan production preset (CI scale): every ray retires with a
    legitimate terminal status (landed or budget-exhausted -- never
    ACTIVE / MAX_STEPS / INVALID), and the fan is genuinely multi-bounce
    (median group delay seconds, not the single-hop ~0.5 s)."""
    from raytrace_tpu.config import preset
    from raytrace_tpu.run import run

    cfg = preset("mr_fan", lats=(0.1, 0.4), chis=(-0.8, -0.5),
                 freqs=(700.0, 1000.0), dtype="float64")
    out = run(cfg)
    v = np.asarray(out["valid"])
    st = np.asarray(out["result"].status)[v]
    ok = {events.HIT_EARTH, events.MAX_PHASE_TIME, events.MAX_GROUP_TIME,
          events.DT_UNDERFLOW}
    assert set(st.tolist()) <= ok, st
    assert (st == events.HIT_EARTH).sum() >= len(st) // 2
    T = np.asarray(out["result"].u)[v, 3]
    assert np.median(T[st == events.HIT_EARTH]) > 2.0
    # the quirk census surfaces the evanescent-regime (negative-T) rays
    # in the run stats instead of letting them pollute delay statistics
    n_retro = int(out["stats"]["n_retrograde_t"])
    assert n_retro == int((T < 0.0).sum())
    assert n_retro >= 1  # the low-frequency MR band reliably has some


def test_evanescent_stop_retires_retrograde_rays():
    """stop_evanescent=True retires the quirk-regime (backward group
    delay) rays as EVANESCENT at their first retrograde step, leaving
    every propagating ray's outcome identical; default off keeps
    reference parity."""
    from raytrace_tpu.config import preset
    from raytrace_tpu.run import run

    kw = dict(lats=(0.1, 0.4), chis=(-0.8, -0.5),
              freqs=(700.0, 1000.0), dtype="float64")
    out0 = run(preset("mr_fan", **kw))
    v = np.asarray(out0["valid"])
    st0 = np.asarray(out0["result"].status)[v]
    T0 = np.asarray(out0["result"].u)[v, 3]
    assert (T0 < 0.0).any()  # the quirk ray exists in this fan

    out1 = run(preset("mr_fan", stop_evanescent=True, **kw))
    st1 = np.asarray(out1["result"].status)[np.asarray(out1["valid"])]
    T1 = np.asarray(out1["result"].u)[np.asarray(out1["valid"]), 3]
    retro = T0 < 0.0
    assert (st1[retro] == events.EVANESCENT).all(), st1[retro]
    # retired where T crossed zero on the way down, not after unwinding
    # to the uninterrupted run's final negative value
    assert (np.abs(T1[retro]) < 0.1).all(), T1[retro]
    # propagating rays are untouched (same statuses, same landings)
    np.testing.assert_array_equal(st1[~retro], st0[~retro])
    np.testing.assert_array_equal(T1[~retro], T0[~retro])


def test_continue_until_done_clears_max_steps():
    """run(config.continue_until_done=True): a budget too small for the
    MR fan strands rays as MAX_STEPS; the chained continuation finishes
    them -- the final census has none."""
    from raytrace_tpu.config import preset
    from raytrace_tpu.run import run

    cfg = preset("mr_fan", lats=(0.1, 0.4), chis=(-0.8, -0.5),
                 freqs=(700.0, 1000.0), dtype="float64", max_steps=2048,
                 use_rounds=True, round_steps=(1024,))
    out = run(cfg)
    v = np.asarray(out["valid"])
    st = np.asarray(out["result"].status)[v]
    assert (st == events.MAX_STEPS).any(), st  # the small budget strands

    cfg2 = preset("mr_fan", lats=(0.1, 0.4), chis=(-0.8, -0.5),
                  freqs=(700.0, 1000.0), dtype="float64", max_steps=2048,
                  use_rounds=True, round_steps=(1024,),
                  continue_until_done=True)
    out2 = run(cfg2)
    st2 = np.asarray(out2["result"].status)[np.asarray(out2["valid"])]
    assert not (st2 == events.MAX_STEPS).any(), st2
    assert not (st2 == events.ACTIVE).any()
    assert int(out2["stats"]["n_max_steps"]) == 0


def test_continue_until_done_bucketed_matches_full_width():
    """run()'s bucketed continuation (floor-sized straggler gather,
    run.py) retires the stragglers to EXACTLY the states a full-width
    resume produces: per-ray stepping is vmapped, so gathering the
    MAX_STEPS set into a padded bucket cannot change any ray's
    arithmetic -- only the dispatch width."""
    import jax

    from raytrace_tpu.config import preset
    from raytrace_tpu.run import _rhs_for, run

    kw = dict(lats=(0.1, 0.4), chis=(-0.8, -0.5), freqs=(700.0, 1000.0),
              dtype="float64", max_steps=2048, use_rounds=True,
              round_steps=(1024,))
    # stage 1: the stranded run, keeping the carry (max_continuations=0
    # arms want_carry without running any continuation)
    cfg1 = preset("mr_fan", continue_until_done=True, max_continuations=0,
                  **kw)
    out1 = run(cfg1)
    res1 = out1["result"]
    v = np.asarray(out1["valid"])
    assert res1.carry is not None
    assert (np.asarray(res1.status)[v] == events.MAX_STEPS).any()

    # full-width resume (the retired r04 behavior, inlined)
    cfg_obj = preset("mr_fan", **kw)
    env = cfg_obj.medium.build()
    rhs_fn, group_idx = _rhs_for(cfg_obj, env)
    from raytrace_tpu.run import _build_u0
    from raytrace_tpu.parallel import make_ray_mesh, pad_batch

    u0, f = _build_u0(cfg_obj, np.float64)
    u0, f, valid = pad_batch(u0, f, make_ray_mesh())
    carry = jax.tree.map(jnp.asarray, res1.carry)
    full = trace(rhs_fn, jnp.asarray(u0), jnp.asarray(f),
                 cfg=cfg_obj.solver(), spec=cfg_obj.stop(),
                 group_idx=group_idx, max_steps=2048, carry0=carry)

    # bucketed continuation through run()
    out2 = run(preset("mr_fan", continue_until_done=True,
                      max_continuations=1, **kw))
    res2 = out2["result"]
    strag = (np.asarray(res1.status) == events.MAX_STEPS) & v
    np.testing.assert_array_equal(
        np.asarray(res2.status)[v], np.asarray(full.status)[v])
    # stragglers: the integration itself is exact -- statuses and the
    # full accept counts match step for step. The final u agrees to the
    # event-refinement floor rather than bitwise: XLA fuses the Hermite
    # bisection differently at the two dispatch widths (measured 3.3e-8
    # on this fan), while any divergence in the stepping would have
    # broken the accept-count equality long before.
    np.testing.assert_array_equal(
        np.asarray(res2.n_accept)[strag], np.asarray(full.n_accept)[strag])
    np.testing.assert_allclose(
        np.asarray(res2.u)[strag], np.asarray(full.u)[strag],
        rtol=1e-6, atol=1e-6)
    # already-retired rays: untouched (the full-width control instead
    # re-applies trace's event refinement to the carry, which wobbles
    # their u at the 1e-8 refinement-noise level -- exactly the kind of
    # churn the bucketed gather avoids)
    keep = v & ~strag
    np.testing.assert_array_equal(
        np.asarray(res2.u)[keep], np.asarray(res1.u)[keep])
    np.testing.assert_array_equal(
        np.asarray(res2.n_accept)[keep], np.asarray(res1.n_accept)[keep])


def test_mr_fan_tail_resumes_from_rounds_carry():
    """The mr_fan MAX_STEPS tail is resumable BY CONSTRUCTION: rays that
    exhaust the rounds tracer's budget continue from its returned carry
    (trace(carry0=...) re-arms MAX_STEPS, integrate/solve.py), and the
    two-stage run finishes bitwise-identical to one uninterrupted trace
    with the combined budget."""
    import jax

    from raytrace_tpu.parallel import (LaunchSpec, build_launch,
                                       make_ray_mesh, pad_batch)
    from raytrace_tpu.parallel.ensemble import make_rounds_tracer

    env = make_env_lat()
    mesh = make_ray_mesh()
    u0, f = build_launch(
        LaunchSpec(r0=2.5, lats=(0.1, 0.4), chis=(-0.8, -0.5),
                   freqs=(700.0,)), np.float64)
    u0, f, valid = pad_batch(u0, f, mesh)
    cfg = SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4, dt_max=1e6 / RE)
    spec = StopSpec(r_floor=1.0, t_max=6e10 / RE, group_time_max=10.0)
    rhs_fn = lambda u, ff: rhs.rhs_2d_lat(u, ff, env)

    direct = trace(rhs_fn, jnp.asarray(u0), jnp.asarray(f), cfg=cfg,
                   spec=spec, max_steps=6144, stepper="dopri5")

    part = make_rounds_tracer(
        env, mesh=mesh, cfg=cfg, spec=spec, max_steps=2048,
        round_steps=1024, bucket_floor=4, stepper="dopri5",
    )(u0, f, valid)
    v = np.asarray(valid)
    st_part = np.asarray(part.status)[v]
    assert (st_part == events.MAX_STEPS).any(), st_part  # a real tail

    carry = jax.tree.map(jnp.asarray, part.carry)
    resumed = trace(rhs_fn, jnp.asarray(u0), jnp.asarray(f), cfg=cfg,
                    spec=spec, max_steps=4096, stepper="dopri5",
                    carry0=carry)
    np.testing.assert_array_equal(
        np.asarray(resumed.status)[v], np.asarray(direct.status)[v])
    np.testing.assert_array_equal(
        np.asarray(resumed.u)[v], np.asarray(direct.u)[v])
    np.testing.assert_array_equal(
        np.asarray(resumed.n_accept)[v], np.asarray(direct.n_accept)[v])


def test_mr_trajectory_native_parity():
    """Independent-language check that the multi-bounce MR path is
    physics, not an integrator artifact: the C++ oracle lands the SAME
    1 kHz ray (status, latitude, group delay) after the full bounce
    sequence. Chaos-sensitive: the ray grazes the resonance cone at
    every mirror, so sub-ppm landing agreement at rtol 1e-9 means the
    two implementations follow the same reflections step for step."""
    from raytrace_tpu import native

    env = make_env_lat()
    f = 1000.0
    u0 = np.array([(RE + 1.0e6) / RE, np.pi / 4 + 0.15, 0.0, 0.0])
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env),
        jnp.asarray([u0]), jnp.asarray([f]),
        cfg=SolverConfig(rtol=1e-9, atol=1e-13, dt0=1e-4, dt_max=1e6 / RE),
        spec=StopSpec(r_floor=1.0, t_max=6e10 / RE, group_time_max=20.0),
        max_steps=400000,
    )
    uj = np.asarray(res.u[0])
    nat = native.trace_2d_lat(u0, f, env, rtol=1e-9, atol=1e-13,
                              t_max=6e10 / RE, max_steps=400000)
    assert int(res.status[0]) == events.HIT_EARTH == nat["status"]
    assert abs(uj[1] - nat["u"][1]) < 5e-6, (uj[1], nat["u"][1])
    np.testing.assert_allclose(uj[3], nat["u"][3], rtol=1e-5)
