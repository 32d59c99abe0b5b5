"""Rounds-tracer features: stall detection, schedules, bucket floor."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, events
from raytrace_tpu.models import cast_env, make_env_lat
from raytrace_tpu.parallel import LaunchSpec, build_launch, make_ray_mesh, pad_batch
from raytrace_tpu.parallel.ensemble import make_rounds_tracer

R0 = (RE + 1.0e6) / RE


def _setup(lats, chis=(0.0,), freqs=(1000.0,), dtype=np.float64):
    mesh = make_ray_mesh()
    env = cast_env(make_env_lat(), dtype)
    u0, f = build_launch(LaunchSpec(lats=lats, chis=chis, freqs=freqs),
                         dtype)
    u0, f, valid = pad_batch(u0, f, mesh)
    return mesh, env, u0, f, valid


def test_rounds_matches_single_shot_statuses():
    """Bucketed rounds vs plain tracer: same final states for completed
    rays (the carry hand-off is exact)."""
    from raytrace_tpu.parallel.ensemble import make_ensemble_tracer

    mesh, env, u0, f, valid = _setup(tuple(np.linspace(0.6, 0.9, 8)))
    kw = dict(
        mesh=mesh, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE), max_steps=2048,
    )
    rounds = make_rounds_tracer(env, round_steps=512, bucket_floor=8,
                                stall_progress=0.0, **kw)(u0, f, valid)
    single = make_ensemble_tracer(env, **kw)(jnp.asarray(u0), jnp.asarray(f))
    v = np.asarray(valid)  # pad-row output is undefined by contract
    np.testing.assert_array_equal(
        np.asarray(rounds.status)[v], np.asarray(single.status)[v]
    )
    np.testing.assert_allclose(
        np.asarray(rounds.u)[v], np.asarray(single.u)[v], rtol=1e-12
    )


def test_rounds_schedule_tuple():
    mesh, env, u0, f, valid = _setup((0.7, 0.8))
    res = make_rounds_tracer(
        env, mesh=mesh, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE), max_steps=1024,
        round_steps=(128, 256, 512), bucket_floor=8,
    )(u0, f, valid)
    total = np.asarray(res.n_accept) + np.asarray(res.n_reject)
    assert total[np.asarray(valid)].max() <= 1024


def test_caution_controller_limits_rejection_bursts():
    """Plasmapause-knee reflection rays: the rejection-burst memory in the
    PI controller (RayCarry.caution: dt regrowth capped at 1.3x while in a
    burst) must keep ensemble rejection under 20% with NO manual stepper
    choice -- the CVODE eta-limiting semantics (measured 34% without it,
    18% with, same landing statuses)."""
    mesh, env, u0, f, valid = _setup(
        tuple(np.linspace(0.9, 1.15, 8)), chis=(-0.2, 0.2),
        freqs=(500.0, 1000.0),
    )
    res = make_rounds_tracer(
        env, mesh=mesh, cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e9 / RE), max_steps=8192,
        round_steps=2048, bucket_floor=8,
    )(u0, f, valid)
    v = np.asarray(valid)
    acc = np.asarray(res.n_accept)[v].sum()
    rej = np.asarray(res.n_reject)[v].sum()
    assert rej / (acc + rej) < 0.20
    assert (np.asarray(res.status)[v] == events.HIT_EARTH).sum() > 0


def test_auto_stepper_pool_handoff():
    """stepper='auto': rays crossing the switch threshold are re-bucketed
    into the stiff pool mid-flight; the carry hand-off across methods must
    produce the same physics (statuses equal, landing states within the
    cross-method tolerance). Threshold forced low so smooth rays switch;
    ros2x pinned explicitly (ros3pr -- the default pool -- has its own
    test below)."""
    mesh, env, u0, f, valid = _setup(tuple(np.linspace(0.6, 0.9, 4)))
    kw = dict(
        mesh=mesh, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE), max_steps=4096,
        round_steps=256, bucket_floor=8,
    )
    auto_tr = make_rounds_tracer(
        env, stepper="auto", stiff_stepper="ros2x",
        stiff_switch=0.001, stiff_unswitch=0.0, **kw
    )
    res_auto = auto_tr(u0, f, valid)
    assert auto_tr.last_stiff is not None and auto_tr.last_stiff.any()
    res_dp5 = make_rounds_tracer(env, stepper="dopri5", **kw)(u0, f, valid)
    v = np.asarray(valid)
    np.testing.assert_array_equal(
        np.asarray(res_auto.status)[v], np.asarray(res_dp5.status)[v]
    )
    # landing agreement: independent methods at the same tolerance (landing
    # amplifies integrator error ~100x, hence the loose bound)
    np.testing.assert_allclose(
        np.asarray(res_auto.u)[v, :2], np.asarray(res_dp5.u)[v, :2],
        rtol=5e-3, atol=5e-3,
    )


def test_auto_pool_ros3pr_stiff_stepper():
    """The DEFAULT stiff pool (ros3pr, the derived stage-order-aware
    Rosenbrock of tools/derive_ros3.py -- promoted after the forced knee
    A/B, benchmarks/perf_r03m.json) through the production rounds path,
    with the same carry hand-off contract as ros2x -- statuses equal to
    the pure-DP5 run, landing states within the cross-method
    tolerance."""
    mesh, env, u0, f, valid = _setup(tuple(np.linspace(0.6, 0.9, 4)))
    kw = dict(
        mesh=mesh, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE), max_steps=4096,
        round_steps=256, bucket_floor=8,
    )
    auto_tr = make_rounds_tracer(
        env, stepper="auto", stiff_stepper="ros3pr",
        stiff_switch=0.001, stiff_unswitch=0.0, **kw
    )
    res_auto = auto_tr(u0, f, valid)
    assert auto_tr.last_stiff is not None and auto_tr.last_stiff.any()
    res_dp5 = make_rounds_tracer(env, stepper="dopri5", **kw)(u0, f, valid)
    v = np.asarray(valid)
    np.testing.assert_array_equal(
        np.asarray(res_auto.status)[v], np.asarray(res_dp5.status)[v]
    )
    np.testing.assert_allclose(
        np.asarray(res_auto.u)[v, :2], np.asarray(res_dp5.u)[v, :2],
        rtol=5e-3, atol=5e-3,
    )


def test_rounds_tracer_3d_auto_stiff_pool():
    """The production rounds path on the 7-state 3D frame: packed carry
    transport at state_dim=7, the stiff pool (ros2x with the unpivoted
    7x7 W-solve), and stepper='auto' hand-off -- previously exercised
    only by the bench. Statuses must match the pure-DP5 rounds run and
    the hand-off must preserve the physics."""
    from raytrace_tpu.models import make_env
    from raytrace_tpu.parallel.ensemble import packed_state_dim

    mesh = make_ray_mesh()
    env = make_env()
    lats = np.linspace(0.6, 0.9, 4)
    u0 = np.zeros((4, 7))
    u0[:, 0] = R0
    u0[:, 1] = np.pi / 2 - lats
    u0[:, 3] = 1.0
    u0[:, 4] = 1.0
    f = np.full(4, 1000.0)
    u0, f, valid = pad_batch(u0, f, mesh)
    kw = dict(
        mesh=mesh, frame="3d",
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE, lat_sign=-1.0,
                      lat_offset=np.pi / 2),
        max_steps=2048, round_steps=256, bucket_floor=8,
    )
    auto_tr = make_rounds_tracer(
        env, stepper="auto", stiff_switch=0.001, stiff_unswitch=0.0, **kw
    )
    res_auto = auto_tr(u0, f, valid)
    # the forced-low threshold really sent rays through the ros2x pool
    assert auto_tr.last_stiff is not None and auto_tr.last_stiff.any()
    res_dp5 = make_rounds_tracer(env, stepper="dopri5", **kw)(u0, f, valid)
    v = np.asarray(valid)
    np.testing.assert_array_equal(
        np.asarray(res_auto.status)[v], np.asarray(res_dp5.status)[v]
    )
    np.testing.assert_allclose(
        np.asarray(res_auto.u)[v, :2], np.asarray(res_dp5.u)[v, :2],
        rtol=5e-3, atol=5e-3,
    )
    # packed transport really carried the 7-state frame
    from raytrace_tpu.parallel.ensemble import pack_carry

    assert res_auto.carry is not None
    fl = pack_carry(res_auto.carry, jnp.asarray(f))
    assert packed_state_dim(fl) == 7


def test_nan_error_estimate_retires_ray_on_device():
    """A ray whose RHS hits a dispersion singularity produces a NaN error
    estimate; the controller must treat it as a hard rejection (dt to the
    floor within ~5 attempts, DT_UNDERFLOW on device) -- NOT let log(nan)
    poison dt into an endless NaN rejection spin (round-2 bug: wedged
    f32 rays burned 4000+ attempts that way)."""
    import jax.numpy as jnp

    from raytrace_tpu.integrate import trace
    from raytrace_tpu.models import cast_env
    from raytrace_tpu.ops import rhs as rhs_mod

    env = cast_env(make_env_lat(), np.float32)
    lats = np.linspace(0.45, 1.1, 10)[6:8]   # the measured Zeno regime
    u0 = np.zeros((2, 4), np.float32)
    u0[:, 0] = R0
    u0[:, 1] = lats
    u0[:, 2] = np.linspace(-0.5, 0.5, 8)[2]
    res = trace(
        lambda u, ff: rhs_mod.rhs_2d_lat(u, ff, env),
        jnp.asarray(u0), jnp.asarray(np.full(2, 500.0, np.float32)),
        cfg=SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e9 / RE),
        max_steps=4096, chunk=64,
    )
    st = np.asarray(res.status)
    total = np.asarray(res.n_accept) + np.asarray(res.n_reject)
    # nothing left spinning: every ray resolved (backend transcendental
    # differences can let one ray escape the wedge and land)
    assert (st != events.ACTIVE).all()
    assert (st == events.DT_UNDERFLOW).any()
    # wedged rays retired on-device long before the budget (was: full
    # 4096 burned in a NaN-dt rejection spin)
    wedged = st == events.DT_UNDERFLOW
    assert total[wedged].max() < 2500
    # the final carry must stay finite (no NaN dt escapes)
    assert np.isfinite(np.asarray(res.carry.dt)).all()


def test_stall_detection_flags_wedged_rays():
    """A 500 Hz high-latitude ray (the measured Zeno regime -- float32,
    where the wedge occurs) gets flagged DT_UNDERFLOW instead of burning
    the whole budget."""
    lats = tuple(np.linspace(0.45, 1.1, 10)[6:8])   # 0.883, 0.956
    chis = tuple(np.linspace(-0.5, 0.5, 8)[2:4])    # -0.214, -0.071
    mesh, env, u0, f, valid = _setup(
        lats, chis=chis, freqs=(500.0,), dtype=np.float32
    )
    res = make_rounds_tracer(
        env, mesh=mesh, cfg=SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e9 / RE), max_steps=8192,
        round_steps=1024, bucket_floor=8,
    )(u0, f, valid)
    st = np.asarray(res.status)[np.asarray(valid)]
    assert (st == events.DT_UNDERFLOW).sum() >= 1
    # and the flagged rays stopped early (did not burn the budget)
    total = (np.asarray(res.n_accept) + np.asarray(res.n_reject))[
        np.asarray(valid)
    ]
    wedged = st == events.DT_UNDERFLOW
    assert total[wedged].max() < 8192


def test_rounds_want_carry_false_matches():
    """want_carry=False returns identical results (u, t, status, counts)
    with carry=None -- the light final fetch is exact."""
    mesh, env, u0, f, valid = _setup(tuple(np.linspace(0.6, 0.9, 8)))
    kw = dict(
        mesh=mesh, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE), max_steps=2048,
        round_steps=512, bucket_floor=8,
    )
    full = make_rounds_tracer(env, **kw)(u0, f, valid)
    light = make_rounds_tracer(env, want_carry=False, **kw)(u0, f, valid)
    assert light.carry is None
    np.testing.assert_array_equal(
        np.asarray(light.status), np.asarray(full.status)
    )
    np.testing.assert_array_equal(
        np.asarray(light.n_accept), np.asarray(full.n_accept)
    )
    np.testing.assert_array_equal(
        np.asarray(light.n_reject), np.asarray(full.n_reject)
    )
    np.testing.assert_allclose(np.asarray(light.u), np.asarray(full.u),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(light.t), np.asarray(full.t),
                               rtol=1e-12)


def test_rounds_pipeline_split_exact():
    """Splitting a round's index set into pipelined parts must not change
    any per-ray result (vmap lanes are independent)."""
    mesh, env, u0, f, valid = _setup(
        tuple(np.linspace(0.5, 1.0, 40)), chis=(-0.1, 0.0, 0.1, 0.2),
    )  # 160 rays -> several parts at the fake-backend floor of 64
    kw = dict(
        mesh=mesh, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE), max_steps=2048,
        round_steps=512,
    )
    one = make_rounds_tracer(env, pipeline=1, **kw)(u0, f, valid)
    split = make_rounds_tracer(env, pipeline=3, **kw)(u0, f, valid)
    v = np.asarray(valid)
    np.testing.assert_array_equal(
        np.asarray(split.status)[v], np.asarray(one.status)[v]
    )
    np.testing.assert_array_equal(
        np.asarray(split.n_accept)[v], np.asarray(one.n_accept)[v]
    )
    np.testing.assert_allclose(
        np.asarray(split.u)[v], np.asarray(one.u)[v], rtol=0, atol=0
    )


def test_packed_carry_roundtrip_exact():
    """pack_carry/unpack_carry: every field survives the flat float
    transport bit-exactly, including the int32 counters riding as floats
    (bounded by max_steps << 2^24, inside the f32 mantissa)."""
    from raytrace_tpu.integrate.solve import RayCarry
    from raytrace_tpu.parallel.ensemble import (
        pack_carry, packed_state_dim, unpack_carry,
    )

    rng = np.random.default_rng(3)
    for dtype in (np.float32, np.float64):
        B, n = 7, 4
        carry = RayCarry(
            u=rng.normal(size=(B, n)).astype(dtype),
            t=rng.uniform(0, 100, B).astype(dtype),
            dt=rng.uniform(1e-6, 1e-1, B).astype(dtype),
            k1=rng.normal(size=(B, n)).astype(dtype),
            errold=rng.uniform(1e-4, 10, B).astype(dtype),
            status=rng.integers(0, 8, B).astype(np.int32),
            n_accept=rng.integers(0, 1 << 23, B).astype(np.int32),
            n_reject=rng.integers(0, 1 << 23, B).astype(np.int32),
            u_prev=rng.normal(size=(B, n)).astype(dtype),
            dt_prev=rng.uniform(1e-6, 1e-1, B).astype(dtype),
            u_lo=(1e-9 * rng.normal(size=(B, n))).astype(dtype),
            rejected=rng.integers(0, 2, B).astype(np.int32),
            n_tiny=rng.integers(0, 64, B).astype(np.int32),
            caution=rng.integers(0, 61, B).astype(np.int32),
        )
        f = rng.uniform(500, 8000, B).astype(dtype)
        fl = np.asarray(pack_carry(carry, jnp.asarray(f)))
        assert packed_state_dim(fl) == n
        back, f_back = unpack_carry(fl, n)
        np.testing.assert_array_equal(np.asarray(f_back), f)
        for name in carry._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(back, name)), getattr(carry, name),
                err_msg=name,
            )


def test_knee_3d_preset_completes_under_auto():
    """VERDICT r2 item 4 done-criterion: the 3D knee-style stress preset
    completes under stepper='auto' (7-state stiff pool on the unpivoted
    W-solve -- no pivoted-LU path exists anymore) with every valid ray
    reaching a terminal status."""
    import pytest

    pytest.importorskip("raytrace_tpu.run")
    from raytrace_tpu.config import preset
    from raytrace_tpu.run import run

    cfg = preset("knee_3d", max_steps=3000,
                 lats=tuple(np.linspace(0.9, 1.15, 4)),
                 freqs=(1000.0,), dtype="float64")
    out = run(cfg)
    status = np.asarray(out["result"].status)[np.asarray(out["valid"])]
    assert status.shape[0] == 4
    assert (status != events.ACTIVE).all()
    # the preset exercises real terminal physics, not a wall of budget
    # exhaustion: at least half the rays resolve to a physical stop
    phys = np.isin(status, (events.HIT_EARTH, events.MAX_PHASE_TIME,
                            events.DT_UNDERFLOW))
    assert phys.sum() >= 2, status


def test_auto_order_pool_bs3_to_dp5():
    """Three-pool auto order selection: with a forced-low dt threshold
    every ray re-pools from the BS3 base into the dopri5 pool after
    round 0 (order_switch_dt=10 makes every mean dt 'accuracy-limited');
    the cross-order hand-off must preserve the physics."""
    mesh, env, u0, f, valid = _setup(tuple(np.linspace(0.6, 0.9, 4)))
    kw = dict(
        mesh=mesh, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE), max_steps=4096,
        round_steps=256, bucket_floor=8,
    )
    tr = make_rounds_tracer(
        env, stepper="auto", base_stepper="bs3",
        order_switch_dt=10.0, order_unswitch_dt=1.0e9, **kw
    )
    res = tr(u0, f, valid)
    assert tr.last_slow is not None and tr.last_slow.any()
    res_dp5 = make_rounds_tracer(env, stepper="dopri5", **kw)(u0, f, valid)
    v = np.asarray(valid)
    np.testing.assert_array_equal(
        np.asarray(res.status)[v], np.asarray(res_dp5.status)[v]
    )
    np.testing.assert_allclose(
        np.asarray(res.u)[v, :2], np.asarray(res_dp5.u)[v, :2],
        rtol=5e-3, atol=5e-3,
    )
    # and with the pool disabled (order_switch_dt=0) the bs3-base run is
    # pure two-pool: no ray lands on the dopri5 pool
    tr2 = make_rounds_tracer(
        env, stepper="auto", base_stepper="bs3", order_switch_dt=0.0, **kw
    )
    tr2(u0, f, valid)
    assert tr2.last_slow is not None and not tr2.last_slow.any()


def test_merged_tail_order5():
    """tail_stepper: once the active set merges into the single
    remaining-budget round, auto mode's non-stiff pool runs order 5 --
    the accuracy-limited stragglers' regime -- with zero extra programs.
    Mechanism check via run.last_rounds; physics check vs a pinned-bs3
    run at the same tolerance."""
    mesh, env, u0, f, valid = _setup(tuple(np.linspace(0.6, 0.9, 8)))
    kw = dict(
        mesh=mesh, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE), max_steps=4096,
        round_steps=128, bucket_floor=32,
    )
    tr = make_rounds_tracer(env, stepper="auto", base_stepper="bs3",
                            tail_stepper="dopri5", **kw)
    res = tr(u0, f, valid)
    # with 8 rays and floor 32, every round after round 0 is the merged
    # tail: its non-stiff pool must have run dopri5
    tail_rounds = [r for r in tr.last_rounds[1:] if r["stepper"] != "ros2x"]
    assert tail_rounds and all(r["stepper"] == "dopri5" for r in tail_rounds)

    # tail_stepper="" keeps the base method everywhere (bitwise equal to
    # the pinned-bs3 run, since no ray trips the stiff pool here)
    tr_off = make_rounds_tracer(
        env, stepper="auto", base_stepper="bs3", tail_stepper="", **kw
    )
    res_off = tr_off(u0, f, valid)
    assert all(r["stepper"] == "bs3" for r in tr_off.last_rounds)
    res_bs3 = make_rounds_tracer(env, stepper="bs3", **kw)(u0, f, valid)
    v = np.asarray(valid)
    np.testing.assert_array_equal(
        np.asarray(res_off.status)[v], np.asarray(res_bs3.status)[v]
    )
    np.testing.assert_allclose(
        np.asarray(res_off.u)[v], np.asarray(res_bs3.u)[v], rtol=1e-12
    )

    # physics parity of the order-5 tail: same terminal statuses, landing
    # states within tolerance noise of the all-bs3 run
    np.testing.assert_array_equal(
        np.asarray(res.status)[v], np.asarray(res_bs3.status)[v]
    )
    np.testing.assert_allclose(
        np.asarray(res.u)[v][:, 0], np.asarray(res_bs3.u)[v][:, 0],
        atol=1e-5,   # method difference shows at the rtol-1e-6 level
    )


def test_rounds_tracer_arc_ceiling():
    """The production ceiling setting (SolverConfig.ds_max + relaxed
    dt_max, preset ensemble10k_production) through the full rounds
    tracer: completes with the same terminal statuses as the
    reference-ceiling run and strictly fewer attempted steps."""
    mesh, env, u0, f, valid = _setup(tuple(np.linspace(0.6, 0.9, 8)))
    kw = dict(
        mesh=mesh, spec=StopSpec(r_floor=1.0, t_max=5e9 / RE),
        max_steps=16384, round_steps=2048, bucket_floor=8,
    )
    res_ref = make_rounds_tracer(
        env, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4), **kw
    )(u0, f, valid)
    res_arc = make_rounds_tracer(
        env, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4,
                              dt_max=8.0e6 / RE, ds_max=2.0e6 / RE), **kw
    )(u0, f, valid)
    v = np.asarray(valid)
    np.testing.assert_array_equal(
        np.asarray(res_arc.status)[v], np.asarray(res_ref.status)[v]
    )
    att_ref = (np.asarray(res_ref.n_accept) + np.asarray(res_ref.n_reject))[v]
    att_arc = (np.asarray(res_arc.n_accept) + np.asarray(res_arc.n_reject))[v]
    assert att_arc.sum() < att_ref.sum()
    # landing-latitude sanity bound only: landing amplifies integrator-
    # tolerance differences ~7e3x (sensitivity.py), so per-ray landing
    # is NOT comparable tightly across ceiling settings -- the ensemble
    # medians are (perf_r03f/h.json); here each ray must land in the
    # same neighborhood (within ~2 degrees)
    np.testing.assert_allclose(
        np.asarray(res_arc.u)[v][:, 1], np.asarray(res_ref.u)[v][:, 1],
        atol=0.035,
    )


def test_order_pools_refuse_arc_ceiling():
    """The three-pool order hysteresis is calibrated against dt_max as
    the effective ceiling; combining it with the arc-length ceiling must
    refuse loudly instead of mis-routing rays."""
    import pytest

    mesh, env, u0, f, valid = _setup((0.7,))
    with pytest.raises(ValueError, match="arc-length"):
        make_rounds_tracer(
            env, mesh=mesh,
            cfg=SolverConfig(rtol=1e-6, atol=1e-10, ds_max=0.3),
            stepper="auto", base_stepper="bs3", order_switch_dt=0.12,
        )


def test_arc_ceiling_resolves_plasmapause_knee():
    """Physics-safety of the production ceiling on the stress case: the
    plasmapause knee (~0.1 L wide) is the sharpest medium feature a
    raised step ceiling could skip. Knee-traversing rays under the
    production ceilings (ds_max 2e6 m, phase bound 8e6 m) must reproduce
    the reference-ceiling statuses ray for ray, and the landing-L
    population must match to the tolerance envelope."""
    mesh, env, u0, f, valid = _setup(
        tuple(np.linspace(0.9, 1.15, 8)), chis=(-0.2, 0.2),
        freqs=(500.0, 1000.0),
    )
    kw = dict(
        mesh=mesh, spec=StopSpec(r_floor=1.0, t_max=5e9 / RE),
        max_steps=20000, round_steps=2048, bucket_floor=8,
    )
    res_ref = make_rounds_tracer(
        env, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4), **kw
    )(u0, f, valid)
    res_arc = make_rounds_tracer(
        env, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4,
                              dt_max=8.0e6 / RE, ds_max=2.0e6 / RE), **kw
    )(u0, f, valid)
    v = np.asarray(valid)
    sr = np.asarray(res_ref.status)[v]
    sa = np.asarray(res_arc.status)[v]
    np.testing.assert_array_equal(sa, sr)
    hit = sr == events.HIT_EARTH
    assert hit.sum() > 0
    ur = np.asarray(res_ref.u)[v]
    ua = np.asarray(res_arc.u)[v]
    lr = ur[hit, 0] / np.cos(ur[hit, 1]) ** 2
    la = ua[hit, 0] / np.cos(ua[hit, 1]) ** 2
    # landing-L medians agree; per-ray spread is the documented event
    # sensitivity, not feature-skipping
    assert abs(np.median(la) - np.median(lr)) < 5e-3
    np.testing.assert_allclose(la, lr, rtol=0.05)


def test_3d_fan_float32_hit_rate():
    """f32 3D fan must land, not wedge: field-aligned regression guard.

    Before the cos(psi)-form gradient chain (ops/fused.py), sqrt(1-cos^2)
    cancellation at field-aligned propagation falsely wedge-retired ~60%
    of exactly this fan in float32 (benchmarks/perf_r03j.py measured 65%
    on chip); the f64 truth lands ~95% of it. Pin the f32 hit rate well
    above the broken level."""
    from raytrace_tpu.integrate import trace
    from raytrace_tpu.models import make_env
    from raytrace_tpu.ops import rhs
    from raytrace_tpu.ops.dispersion import consistent_rho_3d

    env64 = make_env(b0=3.12e-5)
    env = cast_env(env64, jnp.float32)
    lats = np.linspace(0.45, 1.1, 8)
    freqs = np.geomspace(500.0, 8000.0, 4)
    r0 = (RE + 1.0e6) / RE
    rows, fs = [], []
    for lat in lats:
        th = np.pi / 2 - lat
        for fq in freqs:
            rho = consistent_rho_3d(r0, th, 0.0, (1.0, 1.0, 0.0), fq,
                                    env64)
            rows.append([r0, th, 0.0, *map(float, rho), 0.0])
            fs.append(fq)
    u0 = jnp.asarray(np.asarray(rows), jnp.float32)
    f = jnp.asarray(np.asarray(fs), jnp.float32)
    spec = StopSpec(r_floor=1.0, t_max=5.0e9 / RE, lat_sign=-1.0,
                    lat_offset=np.pi / 2)
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4,
                       dt_max=8.0e6 / RE, ds_max=2.0e6 / RE)
    res = trace(lambda u, ff: rhs.rhs_3d(u, ff, env), u0, f, cfg=cfg,
                spec=spec, max_steps=20000, group_idx=6)
    st = np.asarray(res.status)
    n_hit = int((st == events.HIT_EARTH).sum())
    assert n_hit >= int(0.75 * st.size), (
        n_hit, st.size,
        {events.STATUS_NAMES[int(k)]: int(v)
         for k, v in zip(*np.unique(st, return_counts=True))},
    )


def test_3d_grad_mode_and_legacy_flag_through_entry_points():
    """VERDICT r3 item 8: grad_mode reaches the 3D frame through BOTH
    ensemble entry points (reference-mode parity at batch scale), and
    legacy_freq_state (a 2D-script quirk) is refused for 3D."""
    from raytrace_tpu.models import make_env
    from raytrace_tpu.ops.dispersion import consistent_rho_3d
    from raytrace_tpu.parallel.ensemble import make_ensemble_tracer

    env = make_env(b0=3.12e-5)
    r0 = (RE + 1.0e6) / RE
    th = np.pi / 2 - 0.7
    rho = consistent_rho_3d(r0, th, 0.0, (1.0, 1.0, 0.0), 1000.0, env)
    u0 = np.asarray([[r0, th, 0.0, *map(float, rho), 0.0]], np.float64)
    f = np.asarray([1000.0], np.float64)
    kw = dict(
        frame="3d", cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=2e8 / RE, lat_sign=-1.0,
                      lat_offset=np.pi / 2),
        max_steps=512,
    )
    res = {}
    for gm in ("fused", "reference"):
        single = make_ensemble_tracer(env, grad_mode=gm, **kw)(
            jnp.asarray(u0), jnp.asarray(f))
        rounds = make_rounds_tracer(
            env, grad_mode=gm, round_steps=512, stall_progress=0.0, **kw
        )(u0, f, np.array([True]))
        # both entry points integrate the same gradient set
        np.testing.assert_allclose(
            np.asarray(single.u)[0], np.asarray(rounds.u)[0], rtol=1e-12)
        res[gm] = np.asarray(single.u)[0]
    # and the knob is live: reference mode (dmu/dr == 0, Kimura rho
    # chain) integrates a genuinely different trajectory
    assert not np.allclose(res["fused"], res["reference"], rtol=1e-6)

    with pytest.raises(ValueError, match="legacy_freq_state"):
        make_ensemble_tracer(env, legacy_freq_state=True, **kw)
    with pytest.raises(ValueError, match="legacy_freq_state"):
        make_rounds_tracer(env, legacy_freq_state=True, **kw)


def test_legacy_freq_state_batch_parity_2d():
    """legacy_freq_state through the batch entry point reproduces the 2D
    reference quirk (freq drifts by the accumulated group delay) exactly
    as the direct-RHS path does."""
    from raytrace_tpu.integrate import trace
    from raytrace_tpu.ops import rhs as rhs_mod
    from raytrace_tpu.parallel.ensemble import make_ensemble_tracer

    env = cast_env(make_env_lat(), np.float64)
    u0 = np.asarray([[R0, 0.7, 0.0, 0.0]], np.float64)
    f = np.asarray([1000.0], np.float64)
    kw = dict(cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
              spec=StopSpec(r_floor=1.0, t_max=2e8 / RE), max_steps=512)
    batch = make_ensemble_tracer(env, legacy_freq_state=True, **kw)(
        jnp.asarray(u0), jnp.asarray(f))
    direct = trace(
        lambda u, ff: rhs_mod.rhs_2d_lat(u, ff, env,
                                         legacy_freq_state=True),
        jnp.asarray(u0), jnp.asarray(f), group_idx=3, **kw)
    np.testing.assert_array_equal(np.asarray(batch.u), np.asarray(direct.u))
    # the quirk is live: differs from the clean freq-as-parameter run
    clean = make_ensemble_tracer(env, **kw)(jnp.asarray(u0), jnp.asarray(f))
    assert not np.array_equal(np.asarray(batch.u), np.asarray(clean.u))


def test_rounds_trajectory_channel_matches_single_shot():
    """save_every through the rounds tracer: the host-assembled per-ray
    snapshot buffers (scattered per round at each ray's cursor, forward-
    filled past termination) equal the single-shot lax.scan channel
    exactly with a pinned stepper -- the reference SavingCallback
    (RayTrace_lat.jl:318-330) at production ensemble scale."""
    from raytrace_tpu.integrate.saving import save_fn_for
    from raytrace_tpu.parallel.ensemble import make_ensemble_tracer

    mesh, env, u0, f, valid = _setup(tuple(np.linspace(0.6, 0.9, 8)))
    sf = save_fn_for("2d_lat", env)
    kw = dict(
        mesh=mesh, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE), max_steps=2048,
        stepper="dopri5", save_every=64, save_fn=sf,
    )
    rounds = make_rounds_tracer(env, round_steps=512, bucket_floor=8,
                                stall_progress=0.0, **kw)(u0, f, valid)
    single = make_ensemble_tracer(env, **kw)(jnp.asarray(u0), jnp.asarray(f))
    v = np.asarray(valid)
    assert rounds.traj is not None and set(rounds.traj) == set(single.traj)
    assert rounds.traj["u"].shape[0] == 2048 // 64
    for k in single.traj:
        np.testing.assert_array_equal(
            np.asarray(rounds.traj[k])[:, v], np.asarray(single.traj[k])[:, v],
            err_msg=f"trajectory channel {k!r} diverged",
        )
    # forward-fill exercised: at least one ray terminated well before the
    # budget, and its post-termination snapshots hold the frozen state
    st = np.asarray(rounds.traj["status"])[:, v]
    assert (st[-1] != events.ACTIVE).any()


def test_rounds_trajectory_cadence_validation():
    mesh, env, u0, f, valid = _setup((0.7,))
    with pytest.raises(ValueError, match="multiples of save_every"):
        make_rounds_tracer(
            env, mesh=mesh, spec=StopSpec(r_floor=1.0, t_max=1e8 / RE),
            max_steps=1024, round_steps=(100, 512), save_every=64,
        )


def test_3d_fan_f32_landing_accuracy_vs_f64():
    """3D headline accuracy pin (CI-scale of the BASELINE.md table row):
    per-ray landing L of the f32 production path vs the f64 truth on a
    small on-shell chi-fan. Median relative landing-L error must sit well
    under 1e-4; a minority of resonance-cone corner rays legitimately
    diverge (the sqrt(|mu^2|) quirk regime amplifies landing error there,
    docs/NOTE_3D_GROUP_DELAY.md), so the pin is on the median + the
    matched-status fraction."""
    from raytrace_tpu.integrate import trace
    from raytrace_tpu.models import make_env
    from raytrace_tpu.ops import rhs
    from raytrace_tpu.ops.dispersion import consistent_rho_3d

    env64 = make_env(b0=3.12e-5)
    env32 = cast_env(env64, jnp.float32)
    r0 = (RE + 1.0e6) / RE
    rows, fs = [], []
    for lat in np.linspace(0.5, 1.05, 6):
        th = np.pi / 2 - lat
        for chi in (-0.25, 0.0, 0.25):
            c, s = np.cos(chi), np.sin(chi)
            khat = (c - s, s + c, 0.0)
            rho = consistent_rho_3d(r0, th, 0.0, khat, 1500.0, env64)
            rows.append([r0, th, 0.0, *map(float, rho), 0.0])
            fs.append(1500.0)
    spec = StopSpec(r_floor=1.0, t_max=5.0e9 / RE, lat_sign=-1.0,
                    lat_offset=np.pi / 2)
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4,
                       dt_max=8.0e6 / RE, ds_max=2.0e6 / RE)

    def go(env, dt):
        res = trace(lambda u, ff: rhs.rhs_3d(u, ff, env),
                    jnp.asarray(np.asarray(rows), dt),
                    jnp.asarray(np.asarray(fs), dt), cfg=cfg, spec=spec,
                    max_steps=20000, group_idx=6)
        return np.asarray(res.u), np.asarray(res.status)

    u64, st64 = go(env64, jnp.float64)
    u32, st32 = go(env32, jnp.float32)
    match = st64 == st32
    assert match.mean() >= 0.8, (st64.tolist(), st32.tolist())
    hit = match & (st64 == events.HIT_EARTH)
    assert hit.sum() >= 10
    L64 = u64[hit, 0] / np.sin(u64[hit, 1]) ** 2
    L32 = u32[hit, 0] / np.sin(u32[hit, 1]) ** 2
    rel = np.abs(L32 - L64) / L64
    assert np.median(rel) < 1e-4, rel


def test_stiff_pool_trajectory_cadence():
    """Trajectory-channel contract for rays that enter the STIFF pool
    mid-run (VERDICT r4 weak #5). The stiff pool's rounds are capped at
    the save_every-aligned stiff_cap (1024), so once a ray switches it
    advances fewer attempts per schedule round; the snapshot contract
    stays exact on the ray's OWN attempt clock: row k is its state at
    attempt (k+1)*save_every, the recorded row count equals
    attempts // save_every EXACTLY, rows past it forward-fill, and the
    last recorded row is the final carry state BITWISE (so the block
    composes with MAX_STEPS resumability -- the frozen tail is the
    resume point, not stale data)."""
    mesh, env, u0, f, valid = _setup(tuple(np.linspace(0.6, 0.9, 4)))
    save_every = 256
    kw = dict(
        mesh=mesh, cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e9 / RE), max_steps=4096,
        round_steps=2048, bucket_floor=8, save_every=save_every,
    )
    auto_tr = make_rounds_tracer(
        env, stepper="auto", stiff_stepper="ros2x",
        stiff_switch=0.001, stiff_unswitch=0.0, **kw
    )
    res = auto_tr(u0, f, valid)
    v = np.asarray(valid)
    stiff = auto_tr.last_stiff
    assert stiff is not None and stiff[v].all()  # forced switch took
    tt = np.asarray(res.traj["t"])
    tu = np.asarray(res.traj["u"])
    att = (np.asarray(res.n_accept) + np.asarray(res.n_reject))
    for i in np.nonzero(v)[0]:
        # the stiff cap bit: round 1 full (2048) + round 2 capped (1024)
        assert att[i] == 3072, att[i]
        assert int(res.status[i]) == events.MAX_STEPS
        inc = np.nonzero(np.diff(tt[:, i]) > 0)[0]
        kf = inc[-1] + 1
        assert kf + 1 == att[i] // save_every  # exact own-clock cadence
        # forward-fill beyond the cursor, bitwise
        assert (tu[kf:, i] == tu[kf, i]).all()
        # the frozen tail IS the resume point
        np.testing.assert_array_equal(tu[kf, i], np.asarray(res.u)[i])

    # control: the pinned-stepper run advances the full schedule rounds
    # (no stiff cap), so it records more rows on the same own-clock
    # cadence -- the divergence is the cap, not the channel
    dp5 = make_rounds_tracer(env, stepper="dopri5", **kw)(u0, f, valid)
    att5 = (np.asarray(dp5.n_accept) + np.asarray(dp5.n_reject))
    tt5 = np.asarray(dp5.traj["t"])
    for i in np.nonzero(v)[0]:
        assert att5[i] > 3500  # both full-length rounds
        inc5 = np.nonzero(np.diff(tt5[:, i]) > 0)[0]
        assert inc5[-1] + 2 >= att5[i] // save_every


def test_plume_fan_f32_landing_accuracy_vs_f64():
    """The same f32-vs-f64 landing-L accuracy pin through the
    MLT-RESOLVED medium (ensemble10k_plume's physics: d mu/d phi != 0
    from the density, rays spread over local-time sectors through the
    dusk plume). Pins that the extra phi-gradient chain does not
    degrade f32 production accuracy (VERDICT r4 #7): median relative
    landing-L error well under 1e-4 at >= 80% status agreement."""
    from raytrace_tpu.integrate import trace
    from raytrace_tpu.models import make_env
    from raytrace_tpu.ops import rhs
    from raytrace_tpu.ops.dispersion import consistent_rho_3d

    env64 = make_env(b0=3.12e-5, ps_mlt=True)
    env32 = cast_env(env64, jnp.float32)
    r0 = (RE + 1.0e6) / RE
    rows, fs = [], []
    for lat in np.linspace(0.5, 1.05, 5):
        th = np.pi / 2 - lat
        for phi in (-2.4, -0.8, 0.8, 2.4):
            for chi in (-0.25, 0.25):
                c, s = np.cos(chi), np.sin(chi)
                khat = (c - s, s + c, 0.0)
                rho = consistent_rho_3d(r0, th, phi, khat, 1500.0, env64)
                rows.append([r0, th, phi, *map(float, rho), 0.0])
                fs.append(1500.0)
    spec = StopSpec(r_floor=1.0, t_max=5.0e9 / RE, lat_sign=-1.0,
                    lat_offset=np.pi / 2)
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4,
                       dt_max=8.0e6 / RE, ds_max=2.0e6 / RE)

    def go(env, dt):
        res = trace(lambda u, ff: rhs.rhs_3d(u, ff, env),
                    jnp.asarray(np.asarray(rows), dt),
                    jnp.asarray(np.asarray(fs), dt), cfg=cfg, spec=spec,
                    max_steps=20000, group_idx=6)
        return np.asarray(res.u), np.asarray(res.status)

    u64, st64 = go(env64, jnp.float64)
    u32, st32 = go(env32, jnp.float32)
    match = st64 == st32
    assert match.mean() >= 0.8, (st64.tolist(), st32.tolist())
    hit = match & (st64 == events.HIT_EARTH)
    assert hit.sum() >= 20
    L64 = u64[hit, 0] / np.sin(u64[hit, 1]) ** 2
    L32 = u32[hit, 0] / np.sin(u32[hit, 1]) ** 2
    rel = np.abs(L32 - L64) / L64
    assert np.median(rel) < 1e-4, rel
    # the plume is really in play: landings at different local times of
    # the same (lat, chi) cell differ
    th_land = u64[hit, 1]
    assert np.std(th_land) > 1e-3
