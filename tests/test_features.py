"""Feature coverage: EMIC branch, legacy freq-state parity vs the native
oracle, toy-ODE solver sanity (the reference's scratch.jl:516-529 Lorenz
check, C26), debug gates, config round-trip, CLI runner."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy end-to-end suites; fast gate runs -m 'not slow'

from raytrace_tpu import native
from raytrace_tpu.config import RunConfig, preset
from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
from raytrace_tpu.models import make_env_lat
from raytrace_tpu.ops import dispersion, rhs
from raytrace_tpu.run import run
from raytrace_tpu.utils.debug import checked_mu_2d_lat

R0 = (RE + 1.0e6) / RE


def test_emic_branch_selects_minus_root():
    """root=-1 must produce mu = sqrt(|mu2_minus|) (RayMain.jl:201,243)."""
    env = make_env_lat()
    r, lat, chi, f = 2.0, 0.5, 0.3, 1500.0
    rlp = dispersion.stix_rlp(
        __import__("raytrace_tpu.models.medium", fromlist=["x"]).ne_total_m3(r, lat, env),
        __import__("raytrace_tpu.models.medium", fromlist=["x"]).b_mag(r, lat, env),
        f,
    )
    psi = dispersion.psi_lat(lat, chi)
    mu2m = float(dispersion.mu2_signed(*rlp, psi, root=-1.0))
    mu_emic = float(dispersion.mu_2d_lat(r, lat, chi, f, env, root=-1.0))
    assert mu_emic == pytest.approx(np.sqrt(abs(mu2m)), rel=1e-12)
    # both branches trace without NaN
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env, root=-1.0),
        jnp.array([[R0, np.pi / 4, 0.0, 0.0]]), jnp.array([1000.0]),
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=1e8 / RE), max_steps=2000,
    )
    assert bool(jnp.all(jnp.isfinite(res.u)))


def test_legacy_freq_state_drifts_frequency():
    """The RayMain quirk: state[3] integrated with the group-delay equation
    IS fed back as frequency (SURVEY.md 3.1). With the flag, the effective
    frequency after tracing differs from f0 by the accumulated group delay,
    and the trajectory differs measurably from the corrected convention."""
    env = make_env_lat()
    u0 = jnp.array([[R0, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])
    kw = dict(
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e9 / RE), max_steps=30000,
    )
    a = trace(lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f, **kw)
    b = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env, legacy_freq_state=True),
        u0, f, **kw,
    )
    # both terminate at the surface; trajectories differ but only slightly
    # (the drift is seconds-scale against f0 = 1000 Hz)
    assert int(a.status[0]) == int(b.status[0]) == events.HIT_EARTH
    la, lb = float(a.u[0, 1]), float(b.u[0, 1])
    assert la != lb
    assert abs(la - lb) < 0.05


def test_lorenz_attractor_sanity():
    """Known-good toy ODE (the reference uses the Lorenz system as its
    solver sanity check, scratch.jl:516-529): verify chaotic-but-bounded
    behavior and adaptive-step accuracy against a fine fixed-step run."""
    def lorenz(u, f):
        x, y, z = u[0], u[1], u[2]
        return jnp.stack([
            10.0 * (y - x), x * (28.0 - z) - y, x * y - (8.0 / 3.0) * z,
            jnp.ones_like(x),
        ])

    u0 = jnp.array([[1.0, 1.0, 1.0, 0.0]])
    f = jnp.array([0.0])
    spec = StopSpec(r_floor=-1e6, t_max=5.0)
    adaptive = trace(
        lorenz, u0, f,
        cfg=SolverConfig(rtol=1e-10, atol=1e-12, dt0=1e-3, dt_max=0.1),
        spec=spec, max_steps=20000,
    )
    fixed = trace(
        lorenz, u0, f,
        cfg=SolverConfig(dt0=1e-4, dt_max=1e-4, dt_min=1e-4),
        spec=spec, adaptive=False, max_steps=50001,
    )
    assert int(adaptive.status[0]) == events.MAX_PHASE_TIME
    np.testing.assert_allclose(
        np.asarray(adaptive.u[0, :3]), np.asarray(fixed.u[0, :3]),
        rtol=1e-3,
    )
    assert float(jnp.max(jnp.abs(adaptive.u))) < 100.0


def test_checked_mu_reports_evanescence():
    env = make_env_lat()
    # canonical whistler point: the traced '+' root is evanescent (mu2<0)
    err, mu = checked_mu_2d_lat(R0, np.pi / 4, 0.0, 5000.0, env)
    with pytest.raises(Exception):
        err.throw()
    # the '-' root is propagating there: no error
    err2, mu2 = checked_mu_2d_lat(R0, np.pi / 4, 0.0, 5000.0, env, root=-1.0)
    err2.throw()
    assert float(mu2) > 1.0


def test_config_json_roundtrip(tmp_path):
    cfg = preset("knee", rtol=3e-6, wave_mode="emic")
    path = tmp_path / "cfg.json"
    cfg.to_json(str(path))
    loaded = RunConfig.from_json(str(path))
    assert loaded.rtol == 3e-6
    assert loaded.root == -1.0
    assert loaded.medium.b0 == cfg.medium.b0
    assert tuple(loaded.lats) == tuple(cfg.lats)


def test_runner_end_to_end_cpu(tmp_path):
    cfg = preset("lat_fan", max_steps=512, dtype="float64")
    cfg.lats = tuple(np.linspace(0.6, 0.8, 4))
    cfg.chis = (0.0,)
    out = run(cfg, out_dir=str(tmp_path))
    assert (tmp_path / "lat_fan_final.npz").exists()
    assert (tmp_path / "lat_fan_record.json").exists()
    total = int(out["stats"]["total_accepted_steps"])
    assert total > 100


def test_runner_3d_frame(tmp_path):
    cfg = preset("3d", max_steps=256, dtype="float64")
    out = run(cfg, out_dir=str(tmp_path))
    u = np.asarray(out["result"].u)
    assert u.shape[1] == 7
    assert np.all(np.isfinite(u[np.asarray(out["valid"])]))


def test_runner_3d_on_shell_launch(tmp_path):
    """rho_on_shell launches sit ON the dispersion surface: |rho| = mu
    at the launch point for each ray, direction preserved from rho0
    (preset ensemble3d, shrunk). The off-shell default is the reference's
    own quirk (RayTrace_3D.jl:390-391)."""
    from raytrace_tpu.ops.dispersion import mu_3d
    from raytrace_tpu.run import _build_u0

    cfg = preset("ensemble3d", max_steps=256, dtype="float64")
    cfg.lats = (0.5, 0.8)
    cfg.freqs = (1000.0, 3000.0)
    env = cfg.medium.build()
    u0, f = _build_u0(cfg, np.float64)
    assert u0.shape == (4, 7)
    k = np.asarray(cfg.rho0) / np.linalg.norm(cfg.rho0)
    for row, fq in zip(u0, f):
        rho = row[3:6]
        mu = float(mu_3d(row[0], row[1], row[2], *rho, fq, env))
        np.testing.assert_allclose(np.linalg.norm(rho), mu, rtol=1e-10)
        np.testing.assert_allclose(rho / np.linalg.norm(rho), k,
                                   rtol=1e-12)
    # and the preset traces end-to-end through the runner
    out = run(cfg, out_dir=str(tmp_path))
    u = np.asarray(out["result"].u)
    assert np.all(np.isfinite(u[np.asarray(out["valid"])]))


def test_native_legacy_freq_vs_jax():
    """grad_mode parity run in reference mode at tight tolerance: the
    native C++ reference-mode trajectory matches the JAX reference-mode
    trajectory (both with dmudpsi quirk + dmudr == 0)."""
    env = make_env_lat()
    u0 = np.array([R0, np.pi / 4, 0.0, 0.0])
    t_max = 2e8 / RE  # short leg: reference dynamics run to budget
    res_n = native.trace_2d_lat(
        u0, 1000.0, env, grad_mode=native.GRAD_REFERENCE, rtol=1e-9,
        atol=1e-14, t_max=t_max, max_steps=100000,
    )
    res_j = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env, grad_mode="reference"),
        jnp.asarray(u0)[None], jnp.array([1000.0]),
        cfg=SolverConfig(rtol=1e-9, atol=1e-14, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=t_max), max_steps=100000,
        chunk=256,
    )
    np.testing.assert_allclose(
        res_n["u"], np.asarray(res_j.u[0]), rtol=2e-5,
    )


def test_gcpm_medium_traces_end_to_end():
    """The canonical whistler integrates through the simplified-GCPM
    medium (RayMain.jl:99-101's planned model) and lands on the surface;
    the config layer round-trips the model selection."""
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.config import MediumConfig, RunConfig
    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
    from raytrace_tpu.models import make_env
    from raytrace_tpu.ops import rhs

    env = make_env(b0=3.0696381e-5, ps_model="gcpm")
    u0 = jnp.array([[(RE + 1e6) / RE, np.pi / 4, 0.0, 0.0]])
    res = trace(
        lambda u, f: rhs.rhs_2d_lat(u, f, env), u0, jnp.array([1000.0]),
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e9 / RE), max_steps=40000,
    )
    assert int(res.status[0]) == events.HIT_EARTH
    assert float(res.u[0, 0]) == pytest.approx(1.0)
    # the group delay stays in the whistler ballpark (seconds)
    assert 0.1 < float(res.u[0, 3]) < 100.0

    cfg = RunConfig(medium=MediumConfig(ps_model="gcpm", gcpm_bpow=0.5))
    rt = RunConfig.from_json(cfg.to_json())
    assert rt.medium.ps_model == "gcpm"
    assert rt.medium.gcpm_bpow == 0.5
    env2 = rt.medium.build()
    assert env2.ps_model == "gcpm" and env2.gcpm_bpow == 0.5


def test_run_with_gcpm_medium_and_sensitivity_record(tmp_path):
    """run() handles a string-bearing EnvParams in its tracer cache key
    (regression: ps_model broke the float()-only key) and surfaces the
    landing-sensitivity channel in stats + the run record."""
    import json

    import numpy as np

    from raytrace_tpu.config import MediumConfig, RunConfig
    from raytrace_tpu.run import run

    cfg = RunConfig(
        name="gcpm_sens",
        medium=MediumConfig(b0=3.0696381e-5, ps_model="gcpm"),
        lats=(np.pi / 4,), chis=(0.0,), freqs=(1000.0,),
        rtol=1e-6, atol=1e-9, max_steps=30000, dtype="float64",
        sensitivity_rays=1,
    )
    out = run(cfg, out_dir=str(tmp_path))
    assert int(out["stats"]["n_hit_earth"]) == 1
    amp = np.asarray(out["stats"]["sensitivity_amplification"])
    assert amp.shape == (1,) and np.isfinite(amp).all() and amp[0] > 0
    rec = json.load(open(out["paths"]["record"]))
    assert "sensitivity_amplification" in rec["stats"]


def test_tilted_dipole_3d_trace_end_to_end():
    """A 3D whistler integrates through the tilted-dipole medium: the ray
    leaves the meridian plane (d phi drift driven by the now-nonzero
    dmu/dphi and the azimuthal field component) and the trace stays
    finite; tilt = 0 reproduces the centered-dipole trajectory."""
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
    from raytrace_tpu.models import make_env
    from raytrace_tpu.ops import rhs
    from raytrace_tpu.ops.dispersion import consistent_rho_3d

    kw = dict(
        cfg=SolverConfig(rtol=1e-7, atol=1e-11, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=3e8 / RE, lat_sign=-1.0,
                      lat_offset=np.pi / 2),
        group_idx=6, max_steps=20000,
    )

    def launch(env):
        r0, th0, ph0 = (RE + 1e6) / RE, np.pi / 4, 0.0
        rho = consistent_rho_3d(r0, th0, ph0, (1.0, 1.0, 0.0), 1000.0, env)
        u0 = jnp.array([[r0, th0, ph0, *map(float, rho), 0.0]])
        return trace(lambda u, ff: rhs.rhs_3d(u, ff, env), u0,
                     jnp.array([1000.0]), **kw)

    res_t = launch(make_env(b0=3.12e-5, b_model="tilted", b_tilt=0.2,
                            b_tilt_phi=1.0))
    res_0 = launch(make_env(b0=3.12e-5))
    res_z = launch(make_env(b0=3.12e-5, b_model="tilted", b_tilt=0.0))

    assert np.isfinite(np.asarray(res_t.u)).all()
    assert int(res_t.status[0]) in (events.HIT_EARTH, events.MAX_PHASE_TIME)
    # the tilt pulls the ray out of the launch meridian
    assert abs(float(res_t.u[0, 2])) > 1e-3
    # the centered dipole keeps phi drift zero... (rho_phi0 = 0, Bphi = 0)
    assert abs(float(res_0.u[0, 2])) < 1e-8
    # ...and the zero-tilt tilted model reproduces it
    np.testing.assert_allclose(
        np.asarray(res_z.u[0]), np.asarray(res_0.u[0]), rtol=1e-5, atol=1e-8
    )


def test_emic_preset_runs():
    """The He+-band EMIC preset (multi-ion, '-' root) runs end-to-end on
    the fake backend and makes real progress."""
    import numpy as np

    from raytrace_tpu.config import preset
    from raytrace_tpu.run import run

    cfg = preset("emic_heband", dtype="float64", max_steps=2000,
                 use_rounds=False)
    out = run(cfg)
    res, valid = out["result"], np.asarray(out["valid"])
    u = np.asarray(res.u)[valid]
    assert np.all(np.isfinite(u))
    assert float(np.asarray(res.t)[valid].min()) > 0.05


def test_profiling_harness():
    """utils.profiling: the timed context blocks on device values and
    ray_steps_per_sec computes the headline metric."""
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.integrate.solve import TraceResult
    from raytrace_tpu.utils import profiling

    h = profiling.Timing()
    with profiling.timed(h) as t:
        t.value = jnp.arange(1024.0).sum()
    assert h.wall_s is not None and h.wall_s > 0.0

    res = TraceResult(
        u=np.zeros((4, 4)), t=np.zeros(4),
        status=np.ones(4, np.int32),
        n_accept=np.array([100, 200, 300, 400], np.int32),
        n_reject=np.array([10, 20, 30, 40], np.int32),
    )
    valid = np.array([True, True, True, False])
    got = profiling.ray_steps_per_sec(res, wall_s=2.0, valid=valid,
                                      n_devices=2)
    assert got == (110 + 220 + 330) / 2.0 / 2


def test_cli_dump_config_and_multihost_single_process(tmp_path, capsys):
    """CLI surface: --dump-config round-trips; --multihost runs the DCN
    scale-out path (single-process pass-through here) end-to-end and
    prints the aggregated global stats."""
    import json

    from raytrace_tpu.__main__ import main

    rc = main(["lat_fan", "--dump-config"])
    assert rc == 0
    dumped = capsys.readouterr().out
    cfg = RunConfig.from_json(dumped)
    assert cfg.name == "lat_fan"

    small = preset(
        "lat_fan", lats=tuple(np.linspace(0.6, 0.8, 3)), chis=(0.0,),
        freqs=(1000.0,), max_steps=1500, t_max=5e9 / RE,
    )
    path = tmp_path / "small.json"
    small.to_json(str(path))
    rc = main([str(path), "--multihost"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "GLOBAL " in out
    gstats = json.loads(out.split("GLOBAL ", 1)[1].splitlines()[0])
    assert gstats["n_active"] == 0
    total = sum(v for k, v in gstats.items()
                if k.startswith("n_") and k != "n_active")
    assert total == 3


def test_production_preset_round_trip_and_solver():
    """ensemble10k_production: the arc-ceiling production config builds,
    JSON round-trips (incl. the new ds_max/dt_max fields), and its
    SolverConfig carries both ceilings (benchmarks/perf_r03h.json)."""
    from raytrace_tpu.constants import RE

    cfg = preset("ensemble10k_production")
    s = cfg.solver()
    assert s.ds_max == pytest.approx(2.0e6 / RE)
    assert s.dt_max == pytest.approx(8.0e6 / RE)
    back = RunConfig.from_json(cfg.to_json())
    assert back.ds_max == cfg.ds_max and back.dt_max == cfg.dt_max
    assert back.solver() == s
    # the plain headline keeps the reference ceiling and no arc ceiling
    s0 = preset("ensemble10k").solver()
    assert s0.ds_max == 0.0 and s0.dt_max == pytest.approx(1.0e6 / RE)


def test_compilation_cache_helper(tmp_path, monkeypatch):
    """enable_compilation_cache points JAX at the given (or env-derived)
    directory, creates it, and is idempotent."""
    import jax

    from raytrace_tpu.utils import cache

    monkeypatch.setattr(cache, "_ENABLED", False)
    d = str(tmp_path / "xla_cache")
    got = cache.enable_compilation_cache(d)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent: a second call (different path) is a no-op
    assert cache.enable_compilation_cache(str(tmp_path / "other")) is not None
    assert jax.config.jax_compilation_cache_dir == d


def test_runner_rounds_trajectory_channel(tmp_path):
    """run() with save_every + use_rounds rides the rounds tracer's
    snapshot channel (device memory bounded per round) and equals the
    single-program scan tracer with a pinned stepper -- the production
    trajectory path (reference SavedValues, RayTrace_lat.jl:318-330)."""
    kw = dict(max_steps=512, dtype="float64", save_every=32,
              save_diagnostics=True, stepper="dopri5")
    cfg = preset("lat_fan", **kw)
    cfg.lats = tuple(np.linspace(0.6, 0.8, 4))
    cfg.chis = (0.0,)
    out = run(cfg, out_dir=str(tmp_path))
    traj = out["result"].traj
    assert traj is not None and "extras" in traj
    assert traj["u"].shape[0] == 512 // 32
    assert (tmp_path / "lat_fan_traj.npz").exists()
    cfg2 = preset("lat_fan", **dict(kw, use_rounds=False))
    cfg2.lats = cfg.lats
    cfg2.chis = (0.0,)
    single = run(cfg2)["result"].traj
    v = np.asarray(out["valid"])
    for k in single:
        np.testing.assert_array_equal(
            np.asarray(traj[k])[:, v], np.asarray(single[k])[:, v],
            err_msg=f"run()-level trajectory channel {k!r} diverged",
        )
