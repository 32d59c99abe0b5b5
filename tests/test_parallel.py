"""Sharded-ensemble tests on the 8-virtual-device CPU mesh
(SURVEY.md section 4c -- the standard JAX fake-backend idiom)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
from raytrace_tpu.models import make_env_lat
from raytrace_tpu.ops import rhs
from raytrace_tpu.parallel import (
    LaunchSpec,
    build_launch,
    checkpoint,
    ensemble_stats,
    make_ensemble_tracer,
    make_ray_mesh,
    pad_batch,
)

R0 = (RE + 1.0e6) / RE


def test_mesh_has_8_devices():
    mesh = make_ray_mesh()
    assert mesh.devices.size == 8


def test_build_launch_grid():
    spec = LaunchSpec(lats=(0.5, 0.7), chis=(-0.2, 0.0, 0.2), freqs=(1e3, 5e3))
    u0, f = build_launch(spec, np.float64)
    assert u0.shape == (12, 4)
    assert f.shape == (12,)
    # every combination present exactly once
    combos = {(round(u0[i, 1], 6), round(u0[i, 2], 6), f[i]) for i in range(12)}
    assert len(combos) == 12


def test_pad_batch_masks():
    mesh = make_ray_mesh()
    u0, f = build_launch(LaunchSpec(lats=(0.5, 0.6, 0.7)), np.float64)
    u0p, fp, valid = pad_batch(u0, f, mesh)
    assert u0p.shape[0] % 8 == 0
    assert valid.sum() == 3


def test_sharded_ensemble_matches_single_device():
    """The same fan traced sharded-over-8-devices and unsharded must agree
    bitwise-ish (same program, different partitioning)."""
    env = make_env_lat()
    spec = LaunchSpec(
        lats=tuple(np.linspace(0.6, 0.9, 4)),
        chis=(-0.1, 0.1),
        freqs=(1000.0, 2000.0),
    )
    u0, f = build_launch(spec, np.float64)
    mesh = make_ray_mesh()
    u0p, fp, valid = pad_batch(u0, f, mesh)

    kw = dict(
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE),
        max_steps=1500,
    )
    sharded = make_ensemble_tracer(env, mesh=mesh, **kw)(u0p, fp)
    local = make_ensemble_tracer(env, mesh=None, **kw)(u0p, fp)
    np.testing.assert_allclose(
        np.asarray(sharded.u), np.asarray(local.u), rtol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.status), np.asarray(local.status)
    )
    # stats reduce over the sharded result without host gathers
    stats = jax.jit(lambda r: ensemble_stats(r, valid))(sharded)
    total = sum(
        int(stats[f"n_{name.lower()}"]) for name in events.STATUS_NAMES
    )
    assert total == int(valid.sum())


def test_ensemble_stats_colat_frame_landing_l():
    """mean_landing_l must use lat = lat_sign*u[:,1] + lat_offset: for the
    colatitude frames state[1] is theta, so L = r/sin^2(theta), not
    r/cos^2(theta) (round-1 bug: stats were garbage for 2d_colat and 3d)."""
    from raytrace_tpu.integrate.solve import TraceResult

    theta = 0.9
    r_land = 1.0
    u = np.zeros((4, 4))
    u[:, 0] = r_land
    u[:, 1] = theta
    res = TraceResult(
        u=jnp.asarray(u),
        t=jnp.zeros(4),
        status=jnp.full((4,), events.HIT_EARTH, jnp.int32),
        n_accept=jnp.ones((4,), jnp.int32),
        n_reject=jnp.zeros((4,), jnp.int32),
    )
    valid = np.ones(4, bool)
    stats = ensemble_stats(res, valid, lat_sign=-1.0, lat_offset=np.pi / 2)
    expect = r_land / np.sin(theta) ** 2
    np.testing.assert_allclose(float(stats["mean_landing_l"]), expect, rtol=1e-12)
    # the latitude-frame default on the same state gives the (wrong) other
    # value -- guard that the two conventions really differ on this input
    wrong = ensemble_stats(res, valid)
    assert abs(float(wrong["mean_landing_l"]) - expect) > 0.1


def test_run_3d_lats_are_latitudes():
    """RunConfig.lats is magnetic latitude in every frame; the 3D builder
    must convert to colatitude (round-1 bug: values written raw into
    state[1])."""
    from raytrace_tpu.config import preset
    from raytrace_tpu.run import _build_u0

    cfg = preset("3d", lats=(0.3,))
    u0, _ = _build_u0(cfg, np.float64)
    np.testing.assert_allclose(u0[0, 1], np.pi / 2 - 0.3, rtol=1e-12)


def test_run_3d_chi_fan():
    """3D frame chis rotate the rho0 direction within the meridional
    plane (run._build_u0): chi = 0 keeps rho0 exactly (backward compat
    for the lats x freqs presets), nonzero chi preserves the direction
    norm and tilts from r-hat toward theta-hat, and the on-shell solve
    applies per-ray (|rho| = mu of the ROTATED direction)."""
    from raytrace_tpu.config import preset
    from raytrace_tpu.run import _build_u0

    cfg = preset("ensemble10k_3d", lats=(0.7,), chis=(0.0, 0.4),
                 freqs=(1000.0,), rho_on_shell=False)
    u0, f = _build_u0(cfg, np.float64)
    assert u0.shape == (2, 7)
    np.testing.assert_allclose(u0[0, 3:6], (1.0, 1.0, 0.0), rtol=1e-12)
    np.testing.assert_allclose(
        np.linalg.norm(u0[1, 3:6]), np.sqrt(2.0), rtol=1e-12
    )
    c, s = np.cos(0.4), np.sin(0.4)
    np.testing.assert_allclose(u0[1, 3:6], (c - s, s + c, 0.0), rtol=1e-12)

    # on-shell: each ray's |rho| equals mu at its own rotated direction
    from raytrace_tpu.ops.dispersion import mu_3d

    cfg_on = preset("ensemble10k_3d", lats=(0.7,), chis=(0.0, 0.4),
                    freqs=(1000.0,))
    u0_on, f_on = _build_u0(cfg_on, np.float64)
    env = cfg_on.medium.build()
    for k in range(2):
        khat = u0[k, 3:6] / np.linalg.norm(u0[k, 3:6])
        rho = u0_on[k, 3:6]
        mu = float(mu_3d(u0_on[k, 0], u0_on[k, 1], 0.0,
                         *map(float, rho), float(f_on[k]), env))
        np.testing.assert_allclose(np.linalg.norm(rho), mu, rtol=1e-10)
        np.testing.assert_allclose(rho / np.linalg.norm(rho), khat,
                                   rtol=1e-10)


def test_checkpoint_resume_exact(tmp_path):
    """Stop after N steps, checkpoint, resume: identical final state to an
    uninterrupted run (deterministic integrator)."""
    env = make_env_lat()
    u0, f = build_launch(LaunchSpec(lats=(0.7, 0.8)), np.float64)
    u0 = jnp.asarray(u0)
    f = jnp.asarray(f)
    rhs_fn = lambda u, ff: rhs.rhs_2d_lat(u, ff, env)
    kw = dict(
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE),
        chunk=16,
    )
    full = trace(rhs_fn, u0, f, max_steps=512, **kw)

    part = trace(rhs_fn, u0, f, max_steps=256, **kw)
    path = tmp_path / "ck.npz"
    checkpoint.save_carry(path, part.carry, step=256)
    carry, step, _ = checkpoint.load_carry(path)
    assert step == 256
    carry = jax.tree.map(jnp.asarray, carry)
    resumed = trace(rhs_fn, u0, f, max_steps=256, carry0=carry, **kw)
    np.testing.assert_allclose(
        np.asarray(resumed.u), np.asarray(full.u), rtol=1e-12, atol=1e-14
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.n_accept), np.asarray(full.n_accept)
    )


def test_process_slice_partition():
    """Every ray is owned by exactly one process; tail processes may be
    empty; the arithmetic is identical on every process (SPMD)."""
    from raytrace_tpu.parallel import distributed as dist

    for n, p in ((100, 4), (7, 4), (8, 8), (3, 8), (0, 4), (9, 2)):
        seen = []
        for i in range(p):
            a, b = dist.process_slice(n, i, p)
            assert 0 <= a <= b <= n
            seen.extend(range(a, b))
        assert seen == list(range(n))


def test_local_launch_padding_and_mask():
    from raytrace_tpu.parallel import LaunchSpec, build_launch
    from raytrace_tpu.parallel import distributed as dist

    spec = LaunchSpec(
        lats=tuple(np.linspace(0.5, 0.9, 5)), chis=(-0.1, 0.1),
        freqs=(1000.0,),
    )
    u0, f = build_launch(spec)  # 10 rays globally
    # simulate 4 processes; union of valid lanes == the global grid
    tot = 0
    for i in range(4):
        u_l, f_l, v_l = dist.local_launch(
            u0, f, process_index=i, process_count=4)
        assert u_l.shape[0] == f_l.shape[0] == v_l.shape[0]
        assert u_l.shape[0] % 8 == 0  # padded to the device multiple
        tot += int(v_l.sum())
        # padding lanes replicate a valid ray's physics
        assert np.isfinite(u_l).all()
    assert tot == 10
    # a process index past the data still yields a maskable batch
    u_l, f_l, v_l = dist.local_launch(u0, f, process_index=7,
                                      process_count=8)
    assert v_l.sum() == 0 and u_l.shape[0] >= 1


def test_multihost_single_process_matches_rounds_tracer():
    """At process_count == 1 the multihost path must agree exactly with
    the plain rounds tracer + stats (same machinery, pass-through
    aggregation)."""
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.parallel import LaunchSpec, build_launch
    from raytrace_tpu.parallel import distributed as dist
    from raytrace_tpu.parallel.ensemble import (
        ensemble_stats, make_rounds_tracer, pad_batch,
    )

    env = make_env_lat()
    spec = LaunchSpec(
        lats=tuple(np.linspace(0.6, 0.9, 4)), chis=(0.0,),
        freqs=(1000.0, 2000.0),
    )
    u0, f = build_launch(spec)
    kw = dict(
        cfg=SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE),
        max_steps=600, round_steps=256, chunk=64, bucket_floor=8,
    )
    res, v_l, gstats = dist.trace_ensemble_multihost(
        env, u0, f, tracer_kw=kw)

    mesh = make_ray_mesh()
    u0p, fp, valid = pad_batch(u0, f, mesh)
    tracer = make_rounds_tracer(env, mesh=None, **kw)
    ref = tracer(u0p[: u0.shape[0]], fp[: u0.shape[0]],
                 valid[: u0.shape[0]])
    ref_stats = ensemble_stats(ref, valid[: u0.shape[0]], xp=np)
    for k, v in ref_stats.items():
        assert gstats[k] == pytest.approx(float(v), rel=1e-12), k


def test_combine_stat_rows_synthetic_multirow():
    """The pure cross-process recombination on >= 2 synthetic rows:
    counts sum, means recombine hit-weighted, and medians are the
    hit-weighted median of per-process medians -- NOT a sum (summing
    medians was the round-2 defect: ~P times too large in any real
    multi-host run)."""
    from raytrace_tpu.parallel.distributed import combine_stat_rows

    rows = [
        {"n_hit_earth": 6.0, "mean_landing_l": 2.0,
         "median_landing_l": 2.1, "total_accepted_steps": 100.0},
        {"n_hit_earth": 2.0, "mean_landing_l": 4.0,
         "median_landing_l": 4.5, "total_accepted_steps": 50.0},
        {"n_hit_earth": 0.0, "mean_landing_l": 0.0,
         "median_landing_l": 0.0, "total_accepted_steps": 7.0},
    ]
    out = combine_stat_rows(rows)
    assert out["n_hit_earth"] == 8.0
    assert out["total_accepted_steps"] == 157.0
    assert out["mean_landing_l"] == pytest.approx((6 * 2.0 + 2 * 4.0) / 8)
    # hit-weighted median of medians: cumulative weight reaches half the
    # total (4 of 8 hits) at the first row's median. A zero-hit process
    # must never influence it; a sum (2.1 + 4.5 + 0.0 = 6.6) fails here.
    assert out["median_landing_l"] == pytest.approx(2.1)
    # degenerate cases: one row is the identity; all-zero hits -> 0.0
    one = combine_stat_rows(rows[:1])
    assert one["median_landing_l"] == pytest.approx(2.1)
    assert one["mean_landing_l"] == pytest.approx(2.0)
    empty = combine_stat_rows([rows[2], rows[2]])
    assert empty["median_landing_l"] == 0.0


@pytest.mark.slow
def test_multihost_two_real_processes():
    """REAL 2-process DCN integration: two subprocesses initialize
    jax.distributed against a localhost coordinator, trace their slices
    of one global grid, and aggregate stats through process_allgather.
    Asserts the global stats equal the pure combine_stat_rows of the two
    local rows (would have caught the round-2 summed-medians defect) and
    that both processes agree on the global result (SPMD)."""
    import json
    import os
    import socket
    import subprocess
    import sys

    from raytrace_tpu.parallel.distributed import combine_stat_rows

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), "2", str(i)],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    # raw_decode: Gloo's C-level "[Gloo] Rank ... connected" banner can
    # land on the same stdout line as the worker's print (no newline
    # ordering guarantee across the two write paths)
    dec = json.JSONDecoder()
    local, glob = {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOCAL "):
                _, pid, payload = line.split(" ", 2)
                local[int(pid)] = dec.raw_decode(payload)[0]
            elif line.startswith("GLOBAL "):
                _, pid, payload = line.split(" ", 2)
                glob[int(pid)] = dec.raw_decode(payload)[0]
    assert set(local) == {0, 1} and set(glob) == {0, 1}
    # SPMD: both processes computed the same global stats
    assert glob[0] == glob[1]
    # the collective gathered exactly the two local rows; the global
    # result is their pure recombination
    expect = combine_stat_rows([local[0], local[1]])
    for k, v in expect.items():
        assert glob[0][k] == pytest.approx(v, rel=1e-12, abs=1e-12), k
    # medians really combined as medians: bounded by the per-process
    # medians (a sum would exceed the max whenever both are positive)
    meds = [local[i]["median_landing_l"] for i in (0, 1)]
    if min(meds) > 0:
        assert min(meds) <= glob[0]["median_landing_l"] <= max(meds)
    # every valid ray traced somewhere: hit + retired counts cover the grid
    n_rays = 8
    total = sum(
        v for k, v in glob[0].items()
        if k.startswith("n_") and k != "n_active"
    )
    assert total == n_rays


def test_ensemble_stats_median_robust_to_polar_outlier():
    """A single pole-grazing landing (cos lat ~ 0, L ~ 1e5) dominates
    mean_landing_l; the median must not move."""
    from raytrace_tpu.integrate.solve import TraceResult

    n = 9
    u = np.zeros((n, 4))
    u[:, 0] = 1.0
    u[:, 1] = 0.3                      # L = 1/cos^2(0.3) ~ 1.096
    u[-1, 1] = np.pi / 2 - 1e-3        # polar outlier, L ~ 1e6
    u[:, 3] = 3.0
    res = TraceResult(
        u=u, t=np.full(n, 600.0), status=np.ones(n, np.int32),
        n_accept=np.full(n, 100, np.int32),
        n_reject=np.zeros(n, np.int32),
    )
    stats = ensemble_stats(res, np.ones(n, bool), xp=np)
    l_typ = 1.0 / np.cos(0.3) ** 2
    assert float(stats["median_landing_l"]) == pytest.approx(l_typ, rel=1e-9)
    assert float(stats["mean_landing_l"]) > 100.0  # the mean IS dominated
    assert float(stats["median_group_delay_s"]) == pytest.approx(3.0)
